"""Second relational wave: correlated subqueries (Catalyst decorrelation),
HAVING, decimal arithmetic, argmax aggregation, explode/map/struct surface,
bag-semantics set ops, numeric RANGE frames."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load, register_views


@query(
    "subq_exists_late_lineitem",
    oracle="""
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
    """,
    tags=("subquery", "join"),
)
def subq_exists_late_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape): orders with a line shipped >60
    days after order date.  Expressed via SQL so Catalyst's subquery
    decorrelation (RewriteCorrelatedScalarSubquery/RewritePredicateSubquery)
    turns it into the semi join it should be."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY o.o_orderpriority
        """
    )


@query(
    "subq_scalar_below_avg_qty",
    oracle="""
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#12'
          AND l.l_quantity < (
              SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
              WHERE l2.l_partkey = l.l_partkey
          )
    """,
    tags=("subquery", "agg"),
)
def subq_scalar_below_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): lines under half their
    part's average quantity.  DataFrame form: pre-aggregate per part and
    join — the decorrelated plan written out explicitly, which is also the
    shape that scales (one agg pass + one equi join, no per-row subquery)."""
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    avg_qty = lineitem.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        lineitem.join(F.broadcast(part.where(F.col("p_brand") == "Brand#12")),
                      F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("ap_key"))
        .where(F.col("l_quantity") < F.col("half_avg"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@query(
    "agg_having_large_orders",
    oracle="""
        SELECT o.o_orderkey, o.o_custkey, round(sum(l.l_quantity), 2) AS total_qty
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_custkey
        HAVING sum(l.l_quantity) > 150
    """,
    tags=("agg", "having"),
)
def agg_having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING (post-aggregation filter), TPC-H Q18 shape."""
    orders, lineitem = load(spark, sf_dir, "orders", "lineitem")
    return (
        orders.join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_custkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"),
             F.sum("l_quantity").alias("_raw_qty"))
        .where(F.col("_raw_qty") > 150)
        .drop("_raw_qty")
    )


@query(
    "agg_decimal_exact",
    oracle="""
        SELECT o_orderstatus,
               CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_dec,
               CAST(min(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS min_dec,
               CAST(max(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS max_dec
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("agg", "decimal"),
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal aggregation: cast to DECIMAL(14,2) before summing —
    order-independent exact totals (double sums drift in the last bits with
    partition order; decimals don't).  The right money type at scale.

    The aggregation itself is exact decimal arithmetic; the final projection
    casts to double purely for cross-engine comparison (Decimal scale
    rendering differs between engines even when values are equal).  The
    double need not equal the decimal — the guarantee is that both engines
    perform correctly-rounded decimal-to-double conversion of the SAME exact
    value (the sums fit well under 2^53 cents), so the two doubles are
    bit-identical.  Decimal output fidelity itself (scale-2 Decimal objects
    from .collect()) is pinned by tests/test_queries_extra.py."""
    (orders,) = load(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(14,2)")
    return orders.groupBy("o_orderstatus").agg(
        F.sum(dec).cast("decimal(18,2)").cast("double").alias("total_dec"),
        F.min(dec).cast("double").alias("min_dec"),
        F.max(dec).cast("double").alias("max_dec"),
    )


@query(
    "agg_min_max_by",
    oracle="""
        SELECT o_orderstatus,
               arg_max(o_orderkey, o_totalprice) AS biggest_order,
               arg_min(o_orderkey, o_totalprice) AS smallest_order,
               round(max(o_totalprice), 2) AS max_price
        FROM orders
        GROUP BY o_orderstatus
    """,
    tags=("agg", "argmax"),
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax): the single-pass alternative to
    window-row_number-rn=1 for 'row with the extreme value' lookups.
    (Extreme prices are unique per status in the fixtures → deterministic.)"""
    (orders,) = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.expr("max_by(o_orderkey, o_totalprice)").alias("biggest_order"),
        F.expr("min_by(o_orderkey, o_totalprice)").alias("smallest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "func_explode_tokens",
    oracle="""
        SELECT t.tok AS token, count(*) AS occurrences
        FROM documents, UNNEST(string_split_regex(trim(text), '\\s+')) AS t(tok)
        WHERE doc_id <= 100
        GROUP BY t.tok
        HAVING count(*) >= 20
    """,
    tags=("functions", "explode"),
)
def func_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (UDTF-style row generation): term frequencies over documents."""
    (documents,) = load(spark, sf_dir, "documents")
    return (
        documents.where(F.col("doc_id") <= 100)
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .where(F.col("occurrences") >= 20)
    )


@query(
    "func_map_from_json",
    oracle="""
        SELECT event_type, 'k' AS map_key,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS value_sum
        FROM events
        GROUP BY event_type
    """,
    tags=("functions", "map", "json"),
)
def func_map_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse props into map<string,int>, explode entries,
    aggregate per key (generalizes to arbitrary JSON payload keys)."""
    (events,) = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        events.select("event_type", F.explode(m).alias("map_key", "map_val"))
        .groupBy("event_type", "map_key")
        .agg(F.sum("map_val").alias("value_sum"))
    )


@query(
    "func_struct_access",
    oracle="""
        SELECT nationkey, round(total, 2) AS total FROM (
            SELECT struct_pack(nationkey := c_nationkey, total := sum(c_acctbal)) AS s
            FROM customer GROUP BY c_nationkey
        ) t, LATERAL (SELECT t.s.nationkey AS nationkey, t.s.total AS total) u
    """,
    tags=("functions", "struct"),
)
def func_struct_access(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType round-trip: build a struct, read fields back out."""
    (customer,) = load(spark, sf_dir, "customer")
    s = customer.groupBy("c_nationkey").agg(
        F.struct(
            F.col("c_nationkey").alias("nationkey"),
            F.sum("c_acctbal").alias("total"),
        ).alias("s")
    )
    return s.select(
        F.col("s.nationkey").alias("nationkey"),
        F.round(F.col("s.total"), 2).alias("total"),
    )


@query(
    "setop_except_all",
    oracle="""
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT ALL
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    tags=("setop",),
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference: multiplicities subtract)."""
    (customer,) = load(spark, sf_dir, "customer")
    b = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    m = customer.where(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    return b.exceptAll(m)


@query(
    "setop_union_by_name",
    oracle="""
        SELECT c_custkey, c_acctbal FROM customer WHERE c_mktsegment = 'HOUSEHOLD'
        UNION ALL
        SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal < 0
    """,
    tags=("setop",),
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: position-independent union (schema evolution safety —
    positional union silently mismatches reordered columns)."""
    (customer,) = load(spark, sf_dir, "customer")
    a = customer.where(F.col("c_mktsegment") == "HOUSEHOLD").select("c_custkey", "c_acctbal")
    b = customer.where(F.col("c_acctbal") < 0).select("c_acctbal", "c_custkey")  # reordered
    return a.unionByName(b)


@query(
    "window_range_numeric",
    oracle="""
        SELECT o_orderkey,
               round(o_totalprice, 2) AS o_totalprice,
               count(*) OVER (ORDER BY o_totalprice
                   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS peers_within_10k
        FROM orders
        WHERE o_custkey <= 50
    """,
    tags=("window", "range-frame"),
)
def window_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame: for each order, how many orders fall within
    10k below its price (value-based frame, tie-safe by construction)."""
    (orders,) = load(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice").rangeBetween(-10000, 0)
    return orders.where(F.col("o_custkey") <= 50).select(
        "o_orderkey",
        F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
        F.count(F.lit(1)).over(w).alias("peers_within_10k"),
    )


@query(
    "skyline_pareto_parts",
    oracle="""
        SELECT p.p_partkey, p.p_retailprice, p.p_size
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part q
            WHERE q.p_retailprice <= p.p_retailprice
              AND q.p_size >= p.p_size
              AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
        )
    """,
    tags=("relational", "skyline", "scale"),
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline: the parts no other part beats on BOTH price (lower
    is better) and size (higher is better) — the Pareto frontier query
    every catalog/marketplace engine ships, and a canonical case where
    the declarative form (NOT EXISTS self-join, O(N²)) must be
    re-expressed to survive scale.

    operators/skyline.py: per-batch numpy Pareto prune (zero-shuffle
    superset), then a strict-domination anti join confined to the pruned
    candidates.  The oracle IS the O(N²) declarative form — DuckDB can
    afford it at sf0.01, which is exactly why it makes a trustworthy
    ground truth for the distributed algorithm."""
    from aws_genaric_datapipeline_spark.operators.skyline import skyline_2d

    (part,) = load(spark, sf_dir, "part")
    return skyline_2d(
        part.select("p_partkey", "p_retailprice", "p_size"),
        x="p_retailprice",
        y="p_size",
    )
