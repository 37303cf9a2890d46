"""Data-diagnostics queries: the profiling a pipeline runs BEFORE choosing
a physical strategy at scale — key-skew reports drive the salting /
AQE-skew-join decisions in operators/skew.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "diag_key_skew",
    oracle="""
        WITH counts AS (
            SELECT user_id, count(*) AS cnt
            FROM events GROUP BY user_id
        ),
        stats AS (
            SELECT count(*) AS n_keys, sum(cnt) AS n_rows, max(cnt) AS max_cnt
            FROM counts
        )
        SELECT user_id, cnt,
               round(cnt / CAST(n_rows AS DOUBLE), 4) AS share,
               round(cnt * n_keys / CAST(n_rows AS DOUBLE), 4) AS skew_factor
        FROM (SELECT *, row_number() OVER (ORDER BY cnt DESC, user_id) AS rn
              FROM counts) c
        CROSS JOIN stats
        WHERE rn <= 10
    """,
    tags=("diagnostics", "skew"),
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew report: the 10 heaviest `user_id` keys with their
    row share and skew factor (key count ÷ mean key count).  A skew factor
    ≫ 1 on a join key is the trigger for salting (operators/skew.py) or
    AQE skew-join handling; running this profile first is how the choice
    is made from data, not guesswork.

    Scale: one groupBy shuffle on the key, a 1-row global stats frame
    broadcast via crossJoin, and a driver-side top-10 (TakeOrdered) — no
    full sort."""
    (events,) = load(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    top = (
        counts.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("cnt"), "user_id"))
        )
        .where(F.col("rn") <= 10)
        .drop("rn")
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "user_id",
        "cnt",
        F.round(F.col("cnt") / F.col("n_rows").cast("double"), 4).alias("share"),
        F.round(
            F.col("cnt") * F.col("n_keys") / F.col("n_rows").cast("double"), 4
        ).alias("skew_factor"),
    )


_PROFILE_COLS = ("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate")


@query(
    "diag_table_profile",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{c}' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_value,
               CAST(max({c}) AS VARCHAR) AS max_value
        FROM lineitem
        """
        for c in _PROFILE_COLS
    ),
    tags=("diagnostics",),
)
def diag_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style column profiling — the stats pass a pipeline runs
    after ingest to drive planning (broadcast thresholds, skew checks,
    partition sizing) and data-quality review: per column, row/null/
    distinct counts and min/max (stringified for a uniform long-format
    row).  TWO distributed aggregates: the multi-distinct runs ALONE
    (Catalyst's Expand rewrite replicates every carried column into each
    distinct projection, so fusing min/max/count into the same aggregate
    measured ~4× slower than two passes at sf0.1), and the plain
    min/max/null pass is a single partial+final reduce; their 1-row
    results cross-join and explode into the long format — no per-column
    scans, no driver loops."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    distincts = lineitem.agg(
        *[F.countDistinct(c).cast("bigint").alias(f"nd_{c}") for c in _PROFILE_COLS]
    )
    plains = lineitem.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[(F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"nn_{c}") for c in _PROFILE_COLS],
        *[F.min(c).cast("string").alias(f"mn_{c}") for c in _PROFILE_COLS],
        *[F.max(c).cast("string").alias(f"mx_{c}") for c in _PROFILE_COLS],
    )
    wide = distincts.crossJoin(plains)
    structs = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("n_rows"),
            F.col(f"nn_{c}").alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            F.col(f"mn_{c}").alias("min_value"),
            F.col(f"mx_{c}").alias("max_value"),
        )
        for c in _PROFILE_COLS
    ]
    return wide.select(F.explode(F.array(*structs)).alias("p")).select("p.*")
