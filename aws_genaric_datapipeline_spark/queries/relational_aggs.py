"""Aggregation operator coverage (SURVEY.md §2b: hash agg, distinct, approx,
cube/rollup/grouping sets, percentiles, pivot, dedup).

The reference's only aggregate is count() (glue src/raw_layer_job.py:158);
everything here is new surface.  All grouped aggregation in Spark is
partial+final automatically (map-side combine), so shuffle volume is
|groups| × partitions — noted per query only where it changes the plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load, register_views


@query(
    "agg_stats",
    oracle="""
        SELECT o_orderpriority,
               count(*)                          AS order_count,
               round(sum(o_totalprice), 2)       AS sum_price,
               round(avg(o_totalprice), 4)       AS avg_price,
               round(min(o_totalprice), 2)       AS min_price,
               round(max(o_totalprice), 2)       AS max_price,
               round(stddev_samp(o_totalprice), 4) AS stddev_price,
               round(var_samp(o_totalprice), 2)  AS var_price
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg",),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scalar-aggregate battery per group (sum/avg/min/max/stddev/var)."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("stddev_price"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var_price"),
    )


@query(
    "agg_distinct",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS distinct_parts,
               count(DISTINCT l_suppkey) AS distinct_supps,
               count(*)                  AS line_count
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column distinct aggregation (expand + two-phase agg in Catalyst)."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("distinct_parts"),
        F.countDistinct("l_suppkey").alias("distinct_supps"),
        F.count(F.lit(1)).alias("line_count"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_partkey) AS exact_parts,
               count(*) AS line_count,
               true AS within_5pct
        FROM lineitem
        GROUP BY l_returnflag
    """,
    tags=("agg", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the scale path for distinct
    counts — one pass, fixed memory, no expand.

    The sketch estimate itself is engine-specific, so the driver-compared
    output carries the GUARANTEE instead of the estimate: the exact
    distinct count plus a boolean asserting the HLL estimate landed within
    5x its configured 1% relative standard deviation.  A red row means the
    sketch broke its error contract — a real correctness failure, not a
    representation diff."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    agg = lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.01).alias("_approx"),
        F.count(F.lit(1)).alias("line_count"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "line_count",
        (
            F.abs(F.col("_approx") - F.col("exact_parts"))
            <= F.lit(0.05) * F.col("exact_parts")
        ).alias("within_5pct"),
    )


@query(
    "agg_percentile",
    oracle="""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4)  AS median_price,
               round(quantile_cont(o_totalprice, 0.95), 4) AS p95_price
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (Spark `percentile` ≡ DuckDB quantile_cont).

    Exact percentile sorts per group — fine for low-cardinality groups; at
    100 TB switch to percentile_approx (t-digest, single pass, mergeable).
    """
    (orders,) = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95_price"),
    )


@query(
    "agg_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               grouping(l_returnflag, l_linestatus) AS gid,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS cnt
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals with grouping_id disambiguating NULL keys."""
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    ).select("l_returnflag", "l_linestatus", "gid", "sum_qty", "cnt")


@query(
    "agg_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus, o_orderpriority) AS gid,
               count(*) AS cnt,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status × priority (all 2^n grouping combinations)."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    ).select("o_orderstatus", "o_orderpriority", "gid", "cnt", "sum_price")


@query(
    "agg_grouping_sets",
    oracle="""
        SELECT c_mktsegment, c_nationkey,
               count(*) AS cnt,
               round(sum(c_acctbal), 2) AS sum_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
    tags=("agg", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (per-segment and per-nation totals, one pass)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               count(*) AS cnt,
               round(sum(c_acctbal), 2) AS sum_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@query(
    "agg_collect_sorted",
    oracle="""
        SELECT c_nationkey,
               array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',') AS segments
        FROM customer
        GROUP BY c_nationkey
    """,
    tags=("agg", "collect"),
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set → sorted → joined string (deterministic set aggregation)."""
    (customer,) = load(spark, sf_dir, "customer")
    return customer.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment"))).alias("segments")
    )


@query(
    "dedup_exact_distinct",
    oracle="""
        SELECT DISTINCT c_nationkey, c_mktsegment
        FROM customer
    """,
    tags=("dedup",),
)
def dedup_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication on a column subset (dropDuplicates ≡ DISTINCT)."""
    (customer,) = load(spark, sf_dir, "customer")
    return customer.select("c_nationkey", "c_mktsegment").dropDuplicates()


@query(
    "pivot_status_by_priority",
    oracle="""
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS F,
               count(*) FILTER (WHERE o_orderstatus = 'O') AS O,
               count(*) FILTER (WHERE o_orderstatus = 'P') AS P
        FROM orders
        GROUP BY o_orderpriority
    """,
    tags=("agg", "pivot"),
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation): order counts status × priority.

    Pivot values are declared explicitly — at scale never let Spark run the
    implicit distinct-values job to discover them.
    """
    (orders,) = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@query(
    "unpivot_price_components",
    oracle="""
        WITH long AS (
            SELECT l_linestatus, 'extended' AS component,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
            FROM lineitem
            UNION ALL
            SELECT l_linestatus, 'discount',
                   CAST(round(l_extendedprice * l_discount * 100) AS BIGINT)
            FROM lineitem
            UNION ALL
            SELECT l_linestatus, 'tax',
                   CAST(round(l_extendedprice * l_tax * 100) AS BIGINT)
            FROM lineitem
        )
        SELECT l_linestatus, component,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM long
        GROUP BY l_linestatus, component
    """,
    tags=("agg", "unpivot"),
)
def unpivot_price_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long, the inverse of pivot): melt three derived price
    components into (component, cents) rows, then re-aggregate long-form.

    ``DataFrame.unpivot`` (SQL ``stack``) expands each row to one row per
    value column inside the projection — no shuffle, no UDF; the only
    exchange is the final small groupBy.  The melt multiplies row count by
    the number of value columns, so at 100 TB unpivot BEFORE aggregation
    only when the downstream needs long form (as here); otherwise prefer
    conditional aggregation on the wide form.
    """
    (lineitem,) = load(spark, sf_dir, "lineitem")
    wide = lineitem.select(
        "l_linestatus",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("extended"),
        F.round(F.col("l_extendedprice") * F.col("l_discount") * 100)
        .cast("bigint")
        .alias("discount"),
        F.round(F.col("l_extendedprice") * F.col("l_tax") * 100)
        .cast("bigint")
        .alias("tax"),
    )
    return (
        wide.unpivot(
            ids="l_linestatus",
            values=["extended", "discount", "tax"],
            variableColumnName="component",
            valueColumnName="cents",
        )
        .groupBy("l_linestatus", "component")
        .agg(F.sum("cents").cast("bigint").alias("total_cents"))
    )


@query(
    "agg_conditional",
    oracle="""
        SELECT o_orderstatus,
               count(*) FILTER (WHERE o_totalprice > 250000) AS big_orders,
               count(*) FILTER (WHERE o_totalprice <= 250000) AS small_orders,
               round(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                              THEN o_totalprice ELSE 0 END), 2) AS urgent_value
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("agg", "conditional"),
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: FILTER clauses and CASE-gated sums."""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count(F.when(F.col("o_totalprice") > 250000, 1)).alias("big_orders"),
        F.count(F.when(F.col("o_totalprice") <= 250000, 1)).alias("small_orders"),
        F.round(
            F.sum(
                F.when(
                    F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.col("o_totalprice")
                ).otherwise(0.0)
            ),
            2,
        ).alias("urgent_value"),
    )


@query(
    "agg_quantile_histogram",
    oracle="""
        WITH mm AS (
            SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx,
                   count(*) AS n
            FROM orders
        ),
        h AS (
            SELECT least(127, CAST(floor((o_totalprice - mn)
                       / ((mx - mn) / 128)) AS BIGINT)) AS bin,
                   count(*) AS c
            FROM orders, mm GROUP BY 1
        ),
        cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cum FROM h),
        picks AS (
            SELECT min(bin) FILTER (cum >= 0.5 * n) AS b50,
                   min(bin) FILTER (cum >= 0.9 * n) AS b90
            FROM cum, mm
        ),
        ex AS (
            SELECT quantile_cont(o_totalprice, 0.5) AS e50,
                   quantile_cont(o_totalprice, 0.9) AS e90
            FROM orders
        )
        SELECT CAST(n AS BIGINT) AS n_rows,
               round((mx - mn) / 128, 4) AS bin_width,
               round(e50, 4) AS p50_exact,
               round(mn + (b50 + 1) * ((mx - mn) / 128), 4) AS p50_hist,
               abs(mn + (b50 + 1) * ((mx - mn) / 128) - e50)
                   <= (mx - mn) / 128 AS p50_within_bin,
               round(e90, 4) AS p90_exact,
               round(mn + (b90 + 1) * ((mx - mn) / 128), 4) AS p90_hist,
               abs(mn + (b90 + 1) * ((mx - mn) / 128) - e90)
                   <= (mx - mn) / 128 AS p90_within_bin
        FROM mm, picks, ex
    """,
    tags=("agg", "percentile", "sketch"),
)
def agg_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable equi-width-histogram quantile sketch
    (operators/sketches.py histogram_quantile_report): the one-pass,
    constant-state scale path for quantiles — per-partition histograms
    merge by cell-wise addition exactly like the count-min grid, and
    quantile p reads off the first bin whose cumulative count reaches
    p·N, within one bin width of the exact answer.  The exact
    percentile rides along and the within-bin contract booleans are
    part of the verified output (the deterministic analog of
    agg_approx_distinct's sketch contract)."""
    from aws_genaric_datapipeline_spark.operators.sketches import (
        histogram_quantile_report,
    )

    (orders,) = load(spark, sf_dir, "orders")
    return histogram_quantile_report(
        orders, "o_totalprice", bins=128, ps=(0.5, 0.9)
    )
