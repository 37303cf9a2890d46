"""Window function coverage (SURVEY.md §2b: ranking, analytic, frames) plus
sort/limit/top-k.

Determinism rule for oracle parity: every window ORDER BY is a total order
(unique tiebreak column included) unless the frame is RANGE, where peers are
aggregated identically by both engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "window_topk_per_group",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey,
                   round(o_totalprice, 2) AS o_totalprice,
                   CAST(row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number — the scalable top-k-per-group
    (one shuffle on the partition key; no global sort)."""
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "window_rank_dense",
    oracle="""
        SELECT c_mktsegment, c_custkey,
               CAST(rank()  OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk,
               CAST(dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS drnk
        FROM customer
        QUALIFY rnk <= 5
    """,
    tags=("window", "rank"),
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank, top-5 per market segment."""
    (customer,) = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        customer.select(
            "c_mktsegment",
            "c_custkey",
            F.rank().over(w).cast("bigint").alias("rnk"),
            F.dense_rank().over(w).cast("bigint").alias("drnk"),
        )
        .where(F.col("rnk") <= 5)
    )


@query(
    "window_running_sum",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        FROM orders
        WHERE o_custkey <= 100
    """,
    tags=("window", "frame"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum per customer (ROWS frame, total order by date+key)."""
    (orders,) = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.where(F.col("o_custkey") <= 100).select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@query(
    "window_moving_avg",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(avg(o_totalprice) OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg
        FROM orders
        WHERE o_custkey <= 100
    """,
    tags=("window", "frame"),
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per customer (bounded ROWS frame)."""
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
    return orders.where(F.col("o_custkey") <= 100).select(
        "o_custkey",
        "o_orderkey",
        F.round(F.avg("o_totalprice").over(w), 4).alias("moving_avg"),
    )


@query(
    "window_lag_lead",
    oracle="""
        SELECT user_id, event_id,
               round(value - lag(value)  OVER w, 4) AS delta_prev,
               round(lead(value) OVER w - value, 4) AS delta_next
        FROM events
        WHERE user_id <= 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "analytic"),
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead deltas along each user's event timeline."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.where(F.col("user_id") <= 20).select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 4).alias("delta_next"),
    )


@query(
    "window_first_last",
    oracle="""
        SELECT user_id, event_id,
               first_value(event_type) OVER w AS first_type,
               last_value(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
        FROM events
        WHERE user_id <= 20
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "analytic"),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with an explicit full frame for last (the classic
    default-frame trap: last_value over the default frame is just the current
    row)."""
    (events,) = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return events.where(F.col("user_id") <= 20).select(
        "user_id",
        "event_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w_full).alias("last_type"),
    )


@query(
    "window_ntile_cume",
    oracle="""
        SELECT c_custkey,
               CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS BIGINT) AS quartile,
               round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey), 4) AS pct_rank,
               round(cume_dist()    OVER (ORDER BY c_acctbal, c_custkey), 4) AS cume
        FROM customer
    """,
    tags=("window", "distribution"),
)
def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/percent_rank/cume_dist over a global ordering.

    Scale note: an unpartitioned window is a single-reducer sort — fine for
    dimension-sized inputs, never for facts; partition or pre-bucket there.
    """
    (customer,) = load(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@query(
    "sort_limit_global",
    oracle="""
        SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
               CAST(o_orderdate AS DATE) AS o_orderdate
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
    """,
    tags=("sort", "topk"),
)
def sort_limit_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-25 (ORDER BY + LIMIT → TakeOrderedAndProject: per-partition
    heap + driver merge, no full sort)."""
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@query(
    "window_cumulative_distinct_users",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, user_id
            FROM events GROUP BY 1, 2
        ),
        firsts AS (SELECT user_id, min(day) AS first_day FROM daily GROUP BY user_id),
        new_per_day AS (SELECT first_day AS day, count(*) AS n_new FROM firsts GROUP BY 1),
        days AS (SELECT DISTINCT day FROM daily)
        SELECT days.day,
               CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY days.day
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct_users
        FROM days LEFT JOIN new_per_day ON days.day = new_per_day.day
    """,
    tags=("window", "distinct", "events"),
)
def window_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day — the windowed COUNT(DISTINCT)
    Spark's window functions don't support, rewritten as first-seen
    aggregation: a user contributes to the cumulative count only on their
    first active day, so a running SUM of per-day first-seen counts equals
    the running distinct count.

    Scale: two small aggregations + a date-keyed running sum — state is
    O(days), never O(users) per frame; the naive collect_set-over-window
    holds every user id in every frame and dies at 100 TB."""
    (events,) = load(spark, sf_dir, "events")
    daily = events.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).dropDuplicates()
    firsts = daily.groupBy("user_id").agg(F.min("day").alias("first_day"))
    new_per_day = firsts.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    days = daily.select("day").dropDuplicates()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        days.join(new_per_day, "day", "left")
        .withColumn(
            "cum_distinct_users",
            F.sum(F.coalesce(F.col("n_new"), F.lit(0))).over(w),
        )
        .select("day", "cum_distinct_users")
    )
