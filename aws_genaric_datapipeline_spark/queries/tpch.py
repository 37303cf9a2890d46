"""TPC-H-style analytic queries over the driver test tables.

These exercise the core relational engine end-to-end: parquet scan with
pushed filters, hash aggregation (partial+final via Catalyst), multi-way
equi joins (broadcast for dims, sort-merge/shuffled-hash for facts — AQE
decides), and top-k.  Reference parity: the reference's whole data plane is
scan→project→write (glue src/raw_layer_job.py:49-57); this module is the
analytics surface the rebuild adds on top (SURVEY.md §2b).

Rounding convention (registry docstring): money sums → 2 decimals,
averages/ratios → 4 decimals, aliased identically in Spark and oracle SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "q1_pricing_summary",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            round(sum(l_quantity), 2)                               AS sum_qty,
            round(sum(l_extendedprice), 2)                          AS sum_base_price,
            round(sum(l_extendedprice * (1 - l_discount)), 2)       AS sum_disc_price,
            round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
            round(avg(l_quantity), 4)                               AS avg_qty,
            round(avg(l_extendedprice), 4)                          AS avg_price,
            round(avg(l_discount), 4)                               AS avg_disc,
            count(*)                                                AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "flagship"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape): filtered scan → hash agg.

    Scale: single shuffle on a 6-value grouping key; partial aggregation
    (map-side combine) reduces shuffle data to |groups|×partitions rows, so
    the plan is scan-bound at any SF.  Filter + column pruning push to the
    parquet reader.
    """
    (lineitem,) = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
        SELECT
            l.l_orderkey,
            round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
            CAST(o.o_orderdate AS DATE) AS o_orderdate,
            o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority (TPC-H Q3 shape): fact⋈fact⋈dim, agg, top-10.

    Scale: customer (filtered on segment) is broadcast; orders⋈lineitem is
    the one real shuffle, on orderkey.  LIMIT after ORDER BY is a TakeOrdered
    — no full sort materialization.
    """
    customer, orders, lineitem = load(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        F.broadcast(customer.where(F.col("c_mktsegment") == "BUILDING"))
        .join(orders.where(F.col("o_orderdate") < cutoff), F.col("c_custkey") == F.col("o_custkey"))
        .join(
            lineitem.where(F.col("l_shipdate") > cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_orderkey"), F.col("o_orderdate").cast("date").alias("o_orderdate"), F.col("o_orderpriority"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
        SELECT
            n.n_name,
            round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
    """,
    tags=("join", "agg", "broadcast"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (TPC-H Q5 shape): 6-way join, dims broadcast.

    Scale: region/nation/supplier/customer are all dimension-sized →
    broadcast; the only big shuffle is orders⋈lineitem on orderkey.  Join
    order is left to Catalyst/AQE (dims collapse to broadcast-hash stages).
    """
    customer, orders, lineitem, supplier, nation, region = load(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        lineitem.join(orders.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        ), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "q6_revenue_forecast",
    oracle="""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 24
    """,
    tags=("agg", "filter"),
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-change forecast (TPC-H Q6 shape): pure pushed-filter scan + global agg.

    Scale: zero shuffles beyond the single-row final agg; all four predicates
    push to parquet row-group stats.
    """
    (lineitem,) = load(spark, sf_dir, "lineitem")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "q12_shipping_modes",
    oracle="""
        SELECT l.l_linestatus,
               CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                   AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                   AS BIGINT) AS low_line_count
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_linestatus
    """,
    tags=("join", "agg", "conditional"),
)
def q12_shipping_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-split line counts (TPC-H Q12 shape): join + CASE-sum pivot."""
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue_ratio",
    oracle="""
        SELECT round(
                 100.0 * sum(CASE WHEN p.p_type LIKE 'ECO%'
                                  THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
                 / sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("join", "agg", "ratio"),
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional revenue ratio (TPC-H Q14 shape): two CASE-gated sums in
    one aggregation pass (never two scans for numerator/denominator)."""
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("ECO%"), rev).otherwise(0.0)
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct"))
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
        SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
               count(*) AS line_count
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 1 AND 20)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30 AND l.l_quantity BETWEEN 10 AND 30)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 20 AND 50 AND l.l_quantity BETWEEN 20 AND 40)
    """,
    tags=("join", "filter", "disjunction"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-clause predicates over a join (TPC-H Q19 shape) —
    exercises OR-of-conjunctions pushdown and constraint propagation."""
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(20, 50) & F.col("l_quantity").between(20, 40))
    )
    return (
        lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .where(clause)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@query(
    "q22_dormant_rich_customers",
    oracle="""
        SELECT substring(c.c_name, 10, 2) AS name_slice,
               count(*) AS cust_count,
               round(sum(c.c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c.c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        GROUP BY 1
    """,
    tags=("subquery", "anti-join", "agg"),
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global scalar subquery + anti join (TPC-H Q22 shape): above-average-
    balance customers with no recent orders.  The scalar average broadcasts
    as a literal after its own 1-row agg; the NOT EXISTS is a left_anti."""
    customer, orders = load(spark, sf_dir, "customer", "orders")
    avg_bal = (
        customer.where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("ab"))
    )
    recent = orders.where(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.substring("c_name", 10, 2).alias("name_slice"))
        .agg(
            F.count(F.lit(1)).alias("cust_count"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@query(
    "q10_returned_items",
    oracle="""
        SELECT
            c.c_custkey,
            c.c_name,
            round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
            round(c.c_acctbal, 2) AS c_acctbal,
            n.n_name
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): join + agg + top-20."""
    customer, orders, lineitem, nation = load(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-10-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
