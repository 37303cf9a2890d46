"""Third TPC-H wave: the planner shapes not yet covered — nation-pair
multi-join with year extraction (Q7), CTE + argmax-of-aggregate (Q15),
NOT IN anti join with distinct counting (Q16), and layered EXISTS/NOT EXISTS
correlation (Q21)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load, register_views


@query(
    "q7_nation_volume",
    oracle="""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
        JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
        WHERE ((sn.n_name = 'NATION_9' AND cn.n_name = 'NATION_10')
            OR (sn.n_name = 'NATION_10' AND cn.n_name = 'NATION_9'))
          AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                               AND TIMESTAMP '1997-12-31 00:00:00'
        GROUP BY 1, 2, 3
    """,
    tags=("join", "agg"),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nation-pair trade volume (TPC-H Q7 shape): six-way join
    with a disjunctive cross-dimension predicate and year bucketing.  The
    nation table joins twice under different roles — alias hygiene test."""
    supplier, lineitem, orders, customer, nation = load(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_10")) | (
        (F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_9")
    )
    return (
        lineitem.where(
            F.col("l_shipdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp"),
                F.lit("1997-12-31 00:00:00").cast("timestamp"),
            )
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .where(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "q15_top_supplier",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(l_extendedprice * (1 - l_discount)) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, round(r.total_revenue, 2) AS total_revenue
        FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    tags=("cte", "subquery", "agg"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15 shape): reused CTE +
    max-of-aggregate.  DataFrame form computes the revenue view once and
    ranks with a window (one pass) instead of re-aggregating for the max —
    the scalable rewrite of the self-referencing subquery."""
    lineitem, supplier = load(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
    )
    w = Window.orderBy(F.desc("total_revenue"))
    top = revenue.withColumn("rnk", F.rank().over(w)).where(F.col("rnk") == 1).drop("rnk")
    return (
        F.broadcast(supplier)
        .join(top, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
        SELECT p.p_brand, p.p_type,
               count(DISTINCT l.l_suppkey) AS supplier_cnt
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#2'
          AND p.p_type NOT LIKE 'PROMO%'
          AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
          AND l.l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p.p_brand, p.p_type
    """,
    tags=("subquery", "anti-join", "distinct"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier diversity per brand/type (TPC-H Q16 shape): NOT IN
    (null-aware anti join) + distinct count over a join."""
    lineitem, part, supplier = load(spark, sf_dir, "lineitem", "part", "supplier")
    bad_supp = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    parts = part.where(
        (F.col("p_brand") != "Brand#2")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    )
    return (
        lineitem.join(bad_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q21_waiting_orders",
    oracle="""
        SELECT s.s_name, count(*) AS waiting_count
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s.s_name
        ORDER BY waiting_count DESC, s_name
        LIMIT 10
    """,
    tags=("subquery", "exists", "join"),
)
def q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped last on multi-supplier finished orders (TPC-H
    Q21 shape): correlated EXISTS + NOT EXISTS against the same fact table.
    Left in SQL so Catalyst's decorrelation plans both as semi/anti joins."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s.s_name, count(*) AS waiting_count
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s.s_name
        ORDER BY waiting_count DESC, s_name
        LIMIT 10
        """
    )


@query(
    "embed_label_centroids",
    oracle="""
        SELECT label,
               CAST(t.i AS INT) AS dim_idx,
               round(avg(CAST(embedding[t.i] AS DOUBLE)), 4) AS centroid_val
        FROM embeddings, UNNEST(range(1, 9)) AS t(i)
        GROUP BY 1, 2
    """,
    tags=("north-star", "similarity", "array"),
)
def embed_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids (the k-means/update step of clustering):
    posexplode to (label, dim, value), average per cell.  Scales as one
    shuffle keyed by (label, dim) with map-side partial averages — the
    standard distributed centroid computation."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return (
        embeddings.select(
            "label", F.posexplode(F.col("embedding")).alias("pos", "val")
        )
        .where(F.col("pos") < 8)
        .groupBy("label", (F.col("pos") + 1).cast("int").alias("dim_idx"))
        .agg(F.round(F.avg(F.col("val").cast("double")), 4).alias("centroid_val"))
    )
