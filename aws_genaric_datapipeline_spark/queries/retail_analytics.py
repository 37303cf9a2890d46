"""Retail/business analytics + skew-path verification queries.

Three shapes the catalog had proven in pytest but not yet exposed as
driver-checked queries: the SALTED skew join (its semantic-equivalence
contract now rides an oracle, not just a unit test), year-over-year
seasonal growth (join-based alignment, robust to missing months), and
market-basket affinity (support/lift over co-ordered parts — the PMI of
the retail world, with integer-ratio lift so the score is
engine-deterministic).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "join_salted_skew",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(e.value), 2) AS value_sum
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
    """,
    tags=("join", "skew"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-mitigation join VERIFIED: events join the customer
    dimension through operators/skew.py salted_join (dimension rows
    replicated salt× by explode, each fact row picks a deterministic
    salt from its row hash, join keys on (key, salt)), and the oracle is
    the PLAIN join — so the equivalence contract "salting never changes
    results, only partition placement" is driver-checked on real data,
    not just unit-tested.  The roll-up bounds output by segment."""
    from aws_genaric_datapipeline_spark.operators.skew import salted_join

    events, customer = load(spark, sf_dir, "events", "customer")
    dim = customer.select(
        F.col("c_custkey").alias("cust_id"), "c_mktsegment"
    )
    joined = salted_join(
        events, dim, big_key="user_id", small_key="cust_id", salt=8
    )
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


@query(
    "sales_monthly_yoy",
    oracle="""
        WITH m AS (
            SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
                   round(sum(o_totalprice), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY 1
        )
        SELECT cur.month, cur.revenue, cur.n_orders,
               prev.revenue AS revenue_prior_year,
               round((cur.revenue - prev.revenue) / prev.revenue, 4)
                   AS yoy_growth
        FROM m cur
        LEFT JOIN m prev ON prev.month = cur.month - INTERVAL 12 MONTH
    """,
    tags=("agg", "analytics"),
)
def sales_monthly_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth: the seasonal trend
    readout every revenue dashboard leads with.  Prior-year alignment is
    a self-JOIN on month − 12 months, not lag(12) — a lag would silently
    misalign across a missing month, the classic YoY bug.  Growth
    derives from the ROUNDED monthly revenues so the ratio is
    engine-deterministic."""
    (orders,) = load(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    prev = m.select(
        F.add_months(F.col("month"), 12).cast("timestamp").alias("month"),
        F.col("revenue").alias("revenue_prior_year"),
    )
    return m.join(prev, "month", "left").select(
        "month",
        "revenue",
        "n_orders",
        "revenue_prior_year",
        F.round(
            (F.col("revenue") - F.col("revenue_prior_year"))
            / F.col("revenue_prior_year"),
            4,
        ).alias("yoy_growth"),
    )


@query(
    "basket_part_affinity",
    oracle="""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM op),
        per AS (SELECT l_partkey, count(*) AS n_p FROM op GROUP BY 1),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                   count(*) AS n_ab
            FROM op a JOIN op b
              ON a.l_orderkey = b.l_orderkey
             AND a.l_partkey < b.l_partkey
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ),
        scored AS (
            SELECT part_a, part_b, n_ab,
                   pa.n_p AS n_a, pb.n_p AS n_b,
                   round(n_ab * CAST(n_orders AS DOUBLE)
                         / (pa.n_p * CAST(pb.n_p AS DOUBLE)), 4) AS lift
            FROM pairs
            JOIN per pa ON pa.l_partkey = pairs.part_a
            JOIN per pb ON pb.l_partkey = pairs.part_b
            CROSS JOIN n
        )
        SELECT part_a, part_b, CAST(n_ab AS BIGINT) AS n_ab,
               CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b, lift
        FROM (
            SELECT *, row_number() OVER (
                ORDER BY lift DESC, part_a, part_b
            ) AS rn FROM scored
        ) WHERE rn <= 20
    """,
    tags=("analytics", "stats"),
)
def basket_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity: the 20 part pairs most over-represented in
    the same order (lift = P(ab)/(P(a)P(b)) with min support 2 to drop
    one-off coincidences) — the association-rule readout behind "bought
    together" features.  Lift is a ratio of exact integer counts, so the
    ranking cut is engine-deterministic on the rounded score with key
    tiebreaks.

    Scale: baskets self-join on the ORDER key (pairs per order bounded
    by basket size², never corpus²); per-part supports broadcast back;
    the top-20 is a TakeOrdered over the surviving pairs."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    # op feeds FOUR subtrees (the order count, per-part supports, and both
    # sides of the basket self-join); without a lineage cut each reference
    # re-scanned lineitem and re-paid the distinct shuffle (10 parquet
    # scans, 0 reused exchanges in the un-pinned plan).  The lazy local
    # checkpoint materializes it once inside the final action.
    op = (
        lineitem.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = op.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    per = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_p"))
    a = op.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    pa = per.select(F.col("l_partkey").alias("part_a"), F.col("n_p").alias("n_a"))
    pb = per.select(F.col("l_partkey").alias("part_b"), F.col("n_p").alias("n_b"))
    scored = (
        pairs.join(pa, "part_a")
        .join(pb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("n_ab")
                * F.col("n_orders").cast("double")
                / (F.col("n_a") * F.col("n_b").cast("double")),
                4,
            ).alias("lift"),
        )
    )
    # top-20 as orderBy+limit (TakeOrderedAndProject: per-partition
    # partial top-k, no single-partition global window) — the ranking
    # order is total (lift, part_a, part_b), so the row set is identical
    # to the old rn <= 20 filter
    return scored.orderBy(
        F.desc("lift"), F.asc("part_a"), F.asc("part_b")
    ).limit(20)
