"""Set operation coverage (SURVEY.md §2b: union/intersect/except)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


def _year_custkeys(orders: DataFrame, year: int) -> DataFrame:
    return orders.where(F.year("o_orderdate") == year).select("o_custkey")


@query(
    "setop_union_all",
    oracle="""
        SELECT c_custkey, count(*) AS appearances FROM (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
            UNION ALL
            SELECT c_custkey FROM customer WHERE c_acctbal > 8000
        ) GROUP BY c_custkey
    """,
    tags=("setop",),
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics): rows in both branches appear twice."""
    (customer,) = load(spark, sf_dir, "customer")
    u = customer.where(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey").unionAll(
        customer.where(F.col("c_acctbal") > 8000).select("c_custkey")
    )
    return u.groupBy("c_custkey").agg(F.count(F.lit(1)).alias("appearances"))


@query(
    "setop_intersect",
    oracle="""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
    tags=("setop",),
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers ordering in both 1996 and 1997."""
    (orders,) = load(spark, sf_dir, "orders")
    return _year_custkeys(orders, 1996).intersect(_year_custkeys(orders, 1997))


@query(
    "setop_except",
    oracle="""
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
    """,
    tags=("setop",),
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): 1996 customers who did not order in 1997.

    Note: ``subtract`` is set-EXCEPT; ``exceptAll().distinct()`` would be
    subtly wrong (keys with higher left multiplicity survive the bag
    difference even when present on the right).
    """
    (orders,) = load(spark, sf_dir, "orders")
    return _year_custkeys(orders, 1996).subtract(_year_custkeys(orders, 1997))


@query(
    "setop_intersect_all",
    oracle="""
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT ALL
        SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
    """,
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: min of multiplicities per key)."""
    (customer,) = load(spark, sf_dir, "customer")
    b = customer.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    m = customer.where(F.col("c_mktsegment") == "MACHINERY").select("c_nationkey")
    return b.intersectAll(m)
