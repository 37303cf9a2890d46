"""Fourth TPC-H wave — the remaining standard shapes expressible on the
driver fixtures (no partsupp table exists, so Q2/Q9/Q11/Q20 are out of
scope): Q4 EXISTS-per-order priority count, Q8 national market share with
two nation roles and a conditional-ratio aggregate, Q13 outer-join count
distribution including zero-order customers, Q17 correlated per-key average
threshold (decorrelated to an aggregate join), Q18 IN over a grouped HAVING.

Reference parity: the reference has no query surface at all (its data plane
is scan->project->write, glue src/raw_layer_job.py:49-57); these extend the
analytics library mandated by SURVEY.md §2b.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "q4_order_priority",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o.o_orderpriority
    """,
    tags=("subquery", "exists", "agg"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): correlated EXISTS with an
    inequality on the correlated row, decorrelated to a left-semi join.

    Scale: the semi join shuffles on orderkey only for the date-filtered
    orders slice; the inequality rides along as a join condition so no
    post-join filter materializes non-qualifying pairs.
    """
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    return (
        o.join(
            lineitem,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q8_market_share",
    oracle="""
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               round(sum(CASE WHEN n2.n_name = 'NATION_3'
                              THEN l.l_extendedprice * (1 - l.l_discount)
                              ELSE 0 END)
                     / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS mkt_share
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
        JOIN region r   ON r.r_regionkey = n1.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
        JOIN part p     ON p.p_partkey = l.l_partkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                AND TIMESTAMP '1997-12-31 00:00:00'
          AND p.p_type = 'ECONOMY'
        GROUP BY 1
    """,
    tags=("join", "agg", "conditional"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): eight-way join with the
    nation dimension in two roles (customer region gate, supplier share
    numerator) and a conditional-sum ratio per year.

    Scale: all five dimensions broadcast; the only shuffles are
    lineitem<->orders on orderkey and the final year agg.  The part filter
    prunes the fact early via the broadcast-hash probe.
    """
    lineitem, orders, customer, nation, region, supplier, part = load(
        spark, sf_dir, "lineitem", "orders", "customer", "nation", "region", "supplier", "part"
    )
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    asia = region.where(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(F.broadcast(part.where(F.col("p_type") == "ECONOMY")), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            orders.where(
                F.col("o_orderdate").between(
                    F.lit("1996-01-01 00:00:00").cast("timestamp"),
                    F.lit("1997-12-31 00:00:00").cast("timestamp"),
                )
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(asia), F.col("r_regionkey") == F.col("n1_region"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "q13_customer_distribution",
    oracle="""
        SELECT c_count, count(*) AS custdist
        FROM (
            SELECT c.c_custkey, count(o.o_orderkey) AS c_count
            FROM customer c
            LEFT JOIN orders o
              ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
            GROUP BY c.c_custkey
        )
        GROUP BY c_count
    """,
    tags=("join", "outer", "agg"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): left outer join
    with an extra join-side predicate (so non-matching customers count 0,
    not filtered out), then a histogram over the counts.

    Scale: count(o_orderkey) ignores the nulls the outer join introduces —
    the standard trick for including empty groups.  Two shuffles: custkey
    (join+first agg share one exchange) and the tiny histogram key.
    """
    customer, orders = load(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(
            orders.where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q17_small_quantity_revenue",
    oracle="""
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = p.p_partkey
          )
    """,
    tags=("subquery", "scalar", "agg"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): correlated scalar
    subquery (per-part average) decorrelated into an aggregate-then-join.

    Scale: the per-part averages are computed only for the brand's parts
    (semi-filter before the agg), so the threshold side stays dimension-
    sized and broadcasts; the fact table is scanned once per side with
    partkey pushdown from the broadcast probe.
    """
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    brand_parts = part.where(F.col("p_brand") == "Brand#3").select("p_partkey")
    thresholds = (
        lineitem.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold"))
        .select(F.col("l_partkey").alias("t_partkey"), "qty_threshold")
    )
    return (
        lineitem.join(F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "q18_large_volume_customers",
    oracle="""
        SELECT c.c_name, c.c_custkey, o.o_orderkey,
               CAST(o.o_orderdate AS DATE) AS o_orderdate,
               round(o.o_totalprice, 2) AS o_totalprice,
               round(sum(l.l_quantity), 2) AS total_qty
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        )
        GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
        ORDER BY o.o_totalprice DESC, o.o_orderkey
        LIMIT 20
    """,
    tags=("subquery", "having", "topk"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): IN over a grouped HAVING,
    planned as agg -> semi join -> re-join -> top-k.

    Scale: the HAVING output shrinks with selectivity (99th percentile of
    order quantity), but still scales with the fact table, so it stays a
    shuffle (left-semi) join on orderkey — AQE converts it to broadcast at
    small SF.  customer broadcasts; final TakeOrdered avoids a full sort.
    """
    customer, orders, lineitem = load(spark, sf_dir, "customer", "orders", "lineitem")
    big_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(big_orders.withColumnRenamed("l_orderkey", "b_orderkey"),
                    F.col("o_orderkey") == F.col("b_orderkey"), "left_semi")
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
        )
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )
