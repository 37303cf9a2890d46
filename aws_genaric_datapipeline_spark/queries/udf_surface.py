"""Driver queries exercising the Pandas-UDF surface with oracle checks
(the UDF logic is deterministic arithmetic, so DuckDB can replicate it)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.functions import (
    discounted_price_pandas_udf,
    group_size_udaf,
    trimmed_mean_cents_udaf,
    zscore_per_group,
)
from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "udf_scalar_pandas",
    oracle="""
        SELECT l_returnflag,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS disc_revenue
        FROM lineitem
        WHERE l_orderkey <= 5000
        GROUP BY l_returnflag
    """,
    tags=("udf",),
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-vectorized) in an aggregation pipeline —
    numerically identical to the built-in expression the oracle uses."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.where(F.col("l_orderkey") <= 5000)
        .withColumn(
            "disc_price",
            discounted_price_pandas_udf(F.col("l_extendedprice"), F.col("l_discount")),
        )
        .groupBy("l_returnflag")
        .agg(F.round(F.sum("disc_price"), 2).alias("disc_revenue"))
    )


@query(
    "udaf_grouped_trimmed_mean",
    oracle="""
        WITH v AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
            FROM events WHERE value IS NOT NULL
        ),
        r AS (
            SELECT event_type, cents,
                   row_number() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM v
        )
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                             THEN cents END)
                    // (max(n) - 2 * (max(n) // 10)) AS BIGINT)
                   AS trimmed_mean_cents
        FROM r GROUP BY event_type
    """,
    tags=("udf", "grouped-agg", "udaf"),
)
def udaf_grouped_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (the UDAF species — completes the
    scalar / grouped-map / UDTF / SQL-UDF surface): per-event-type
    10%-trimmed mean of ``value`` in exact integer cents
    (functions/udfs.trimmed_mean_cents_udaf).  The trim is robust-stats
    boilerplate a built-in can't express in one aggregate (it needs the
    group's order statistics); the oracle replays it relationally with
    a window rank + conditional sum, bit-for-bit thanks to the
    integer-cents contract.

    Scale: one shuffle on event_type; the whole group streams to one
    executor as a single Arrow batch (grouped-agg contract) — bounded
    here by event-type cardinality, salt-and-merge for whale keys."""
    (events,) = load(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        events.where(F.col("value").isNotNull())
        .select("event_type", cents.alias("cents"))
        .groupBy("event_type")
        .agg(
            # group_size_udaf, not F.count: Spark disallows mixing pandas
            # and non-pandas aggregates in one agg()
            group_size_udaf(F.col("cents")).alias("n_events"),
            trimmed_mean_cents_udaf(F.col("cents")).alias("trimmed_mean_cents"),
        )
    )


@query(
    "udaf_window_trailing_trimmed",
    oracle="""
        WITH d AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS cents
            FROM events WHERE value IS NOT NULL
            GROUP BY 1, 2
        ),
        w AS (
            SELECT event_type, day,
                   list(cents) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS vals
            FROM d
        ),
        t AS (
            SELECT event_type, day, len(vals) AS n,
                   list_slice(list_sort(vals), len(vals) // 10 + 1,
                              len(vals) - len(vals) // 10) AS kept
            FROM w
        )
        SELECT event_type, day,
               CAST(n AS BIGINT) AS n_days,
               CAST(CASE WHEN list_aggregate(kept, 'sum') < 0
                    THEN -((-list_aggregate(kept, 'sum')) // len(kept))
                    ELSE list_aggregate(kept, 'sum') // len(kept) END
                    AS BIGINT) AS trimmed_mean_cents
        FROM t
    """,
    tags=("udf", "grouped-agg", "udaf", "window"),
)
def udaf_window_trailing_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF used as a WINDOW function — the second
    placement Spark supports for the UDAF species (bounded frames only):
    a 10%-trimmed mean of each type's last 30 OBSERVED daily totals (a
    ROWS frame — a pandas-UDAF window must be row-bounded, so on a type
    with calendar gaps the frame deliberately spans more than 30
    calendar days; a calendar-bounded variant would be a RANGE frame
    with a JVM aggregate).  The robust rolling signal a volume monitor
    plots instead of a spike-hostage moving average.  Arithmetic is the
    same exact integer-cents contract as udaf_grouped_trimmed_mean
    (sort, trim n//10 each end, truncate-toward-zero division), so the
    DuckDB window replay (list() over the identical frame) is
    bit-for-bit.

    Scale: the raw stream collapses to (type, day) grain FIRST — the
    only data-sized pass; the windowed UDAF then runs on the tiny daily
    frame, one Arrow batch per frame evaluation."""
    from pyspark.sql import Window

    (events,) = load(spark, sf_dir, "events")
    daily = (
        events.where(F.col("value").isNotNull())
        .groupBy(
            "event_type", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-29, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_days"),
        trimmed_mean_cents_udaf(F.col("cents")).over(w).alias(
            "trimmed_mean_cents"
        ),
    )


@query(
    "udf_grouped_zscore",
    oracle="""
        SELECT event_id, event_type,
               round((value - avg(value) OVER (PARTITION BY event_type))
                     / stddev_samp(value) OVER (PARTITION BY event_type), 4) AS zscore
        FROM events
        WHERE user_id <= 50
    """,
    tags=("udf", "grouped-map"),
)
def udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas z-score per event type; oracle replicates
    with window aggregates (pandas ddof=1 ≡ stddev_samp)."""
    (events,) = load(spark, sf_dir, "events")
    scored = zscore_per_group(
        events.where(F.col("user_id") <= 50), "event_type", "value", keep_cols=("event_id",)
    )
    return scored.select("event_id", "event_type", F.round("zscore", 4).alias("zscore"))
