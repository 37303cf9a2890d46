"""Fifth TPC-H wave — Q2/Q9/Q11/Q20, the four shapes that need a partsupp
table, over a DERIVED partsupp.

The driver fixtures omit partsupp, but lineitem carries (l_partkey,
l_suppkey), so the part-supplier relationship actually exercised by the
fact table is recoverable: partsupp := DISTINCT (l_partkey, l_suppkey)
with arithmetic, engine-portable attributes

    ps_supplycost_cents = (ps_partkey*7 + ps_suppkey*11) % 99900 + 100
    ps_availqty         = (ps_partkey*3 + ps_suppkey*17) % 9999 + 1

Supply costs are carried in integer CENTS wherever a threshold or equality
comparison happens (Q2 min-cost equality, Q11 share-of-total HAVING), so
the comparisons are exact integer arithmetic on both engines — no
float-boundary flips; division to display dollars happens once, at output.
By construction every lineitem row joins exactly one partsupp row, so Q9's
profit join is referentially complete, and Q20's correlated shipped-volume
sum is over the same key domain.

Reference parity: the reference has no query surface (its data plane is
scan->project->write, glue src/raw_layer_job.py:49-57); these complete the
22/22 TPC-H shape coverage mandated by SURVEY.md §2b.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load

# Derived partsupp, shared by the four queries (Spark + DuckDB sides).
_DUCK_PARTSUPP = """
        partsupp AS (
            SELECT ps_partkey, ps_suppkey,
                   CAST((ps_partkey * 7 + ps_suppkey * 11) % 99900 + 100
                        AS BIGINT) AS ps_cost_cents,
                   CAST((ps_partkey * 3 + ps_suppkey * 17) % 9999 + 1
                        AS BIGINT) AS ps_availqty
            FROM (SELECT DISTINCT l_partkey AS ps_partkey,
                                  l_suppkey AS ps_suppkey
                  FROM lineitem)
        )
"""


def _partsupp(lineitem: DataFrame) -> DataFrame:
    """Derived partsupp (see module docstring).  One dropDuplicates shuffle
    on the two keys; at scale this is materialized once at ingest and
    bucketed by ps_partkey (operators/bucketing.py) so the Q2/Q11 per-part
    aggregations and the Q9 fact join are co-located."""
    pk, sk = F.col("ps_partkey"), F.col("ps_suppkey")
    return (
        lineitem.select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .dropDuplicates()
        .withColumn("ps_cost_cents", ((pk * 7 + sk * 11) % 99900 + 100).cast("bigint"))
        .withColumn("ps_availqty", ((pk * 3 + sk * 17) % 9999 + 1).cast("bigint"))
    )


@query(
    "q2_min_cost_supplier",
    oracle=f"""
        WITH {_DUCK_PARTSUPP},
        euro AS (
            SELECT ps_partkey, ps_suppkey, ps_cost_cents,
                   s_name, s_acctbal, n_name
            FROM partsupp
            JOIN supplier ON s_suppkey = ps_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            JOIN region   ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE'
        ),
        ranked AS (
            SELECT *, min(ps_cost_cents) OVER (PARTITION BY ps_partkey)
                          AS min_cents
            FROM euro
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               round(ps_cost_cents / 100.0, 2) AS ps_supplycost
        FROM ranked
        JOIN part ON p_partkey = ps_partkey
        WHERE ps_cost_cents = min_cents
          AND p_size <= 15 AND p_type = 'STANDARD'
    """,
    tags=("tpch", "subquery", "join"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): per-part correlated MIN over
    the region-restricted supplier pool, decorrelated to a window min.

    Scale: the window partitions on ps_partkey — same key as the part join
    that follows, so AQE reuses one shuffle; region/nation/supplier are
    broadcast dims.  Cost equality compares integer cents (exact)."""
    part, supplier, nation, region, lineitem = load(
        spark, sf_dir, "part", "supplier", "nation", "region", "lineitem"
    )
    euro = (
        _partsupp(lineitem)
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == "EUROPE")),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
    )
    w = Window.partitionBy("ps_partkey")
    ranked = euro.withColumn("min_cents", F.min("ps_cost_cents").over(w))
    return (
        ranked.where(F.col("ps_cost_cents") == F.col("min_cents"))
        .join(
            part.where((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")),
            F.col("p_partkey") == F.col("ps_partkey"),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.round(F.col("ps_cost_cents") / 100.0, 2).alias("ps_supplycost"),
        )
    )


@query(
    "q9_product_profit",
    oracle=f"""
        WITH {_DUCK_PARTSUPP}
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               round(sum(l_extendedprice * (1 - l_discount)
                         - (ps_cost_cents / 100.0) * l_quantity), 2) AS profit
        FROM lineitem
        JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN part     ON p_partkey = l_partkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate)
    """,
    tags=("tpch", "join", "agg"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape): five-way join of the fact table
    to partsupp (composite key), supplier-nation, orders and a LIKE-filtered
    part dim, aggregated by supplier nation and order year.

    Scale: part/supplier/nation broadcast; the partsupp join shuffles on the
    composite key only after the part semi-filter prunes the fact rows; at
    real scale partsupp and lineitem are co-bucketed on partkey."""
    part, supplier, nation, orders, lineitem = load(
        spark, sf_dir, "part", "supplier", "nation", "orders", "lineitem"
    )
    red_parts = part.where(F.col("p_name").like("%red%")).select("p_partkey")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - (F.col("ps_cost_cents") / 100.0) * F.col("l_quantity")
    )
    red_lineitem = lineitem.join(
        F.broadcast(red_parts), F.col("p_partkey") == F.col("l_partkey")
    )
    # partsupp attributes are pure key arithmetic, so deriving the table
    # from the part-filtered fact slice yields exactly the rows this join
    # needs — the dedup pass runs over ~|filter| rows, not the whole fact.
    return (
        red_lineitem.join(
            _partsupp(red_lineitem.select("l_partkey", "l_suppkey")),
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@query(
    "q11_important_stock",
    oracle=f"""
        WITH {_DUCK_PARTSUPP},
        national AS (
            SELECT ps_partkey, ps_cost_cents * ps_availqty AS value_cents
            FROM partsupp
            JOIN supplier ON s_suppkey = ps_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
            WHERE n_name = 'NATION_7'
        ),
        per_part AS (
            SELECT ps_partkey, sum(value_cents) AS part_cents
            FROM national GROUP BY ps_partkey
        ),
        total AS (SELECT sum(part_cents) AS total_cents FROM per_part)
        SELECT ps_partkey, round(part_cents / 100.0, 2) AS value
        FROM per_part, total
        WHERE part_cents > total_cents // 2000
    """,
    tags=("tpch", "subquery", "agg"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock identification (TPC-H Q11 shape): per-part inventory
    value within one nation, kept when above a fraction (1/2000) of the
    national total — a global-scalar-subquery HAVING.

    All value arithmetic is integer cents, and the threshold is integer
    floor-division, so the cut is exact on both engines.  Scale: the total
    is a 1-row frame broadcast via crossJoin; one shuffle on ps_partkey."""
    supplier, nation, lineitem = load(spark, sf_dir, "supplier", "nation", "lineitem")
    national = (
        _partsupp(lineitem)
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("ps_suppkey"))
        .join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_7")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("ps_partkey", (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("value_cents"))
    )
    per_part = national.groupBy("ps_partkey").agg(F.sum("value_cents").alias("part_cents"))
    total = per_part.agg(F.sum("part_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("part_cents") > F.floor(F.col("total_cents") / 2000))
        .select("ps_partkey", F.round(F.col("part_cents") / 100.0, 2).alias("value"))
    )


@query(
    "q20_excess_stock_suppliers",
    oracle=f"""
        WITH {_DUCK_PARTSUPP},
        shipped AS (
            SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
            GROUP BY l_partkey, l_suppkey
        ),
        excess AS (
            SELECT DISTINCT ps_suppkey
            FROM partsupp
            JOIN shipped ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
            WHERE ps_partkey IN (SELECT p_partkey FROM part
                                 WHERE p_name LIKE 'small%')
              AND ps_availqty > 0.5 * qty
        )
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
          AND s_suppkey IN (SELECT ps_suppkey FROM excess)
    """,
    tags=("tpch", "subquery", "semi"),
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-stock suppliers (TPC-H Q20 shape): nested IN subqueries —
    suppliers in one nation holding availqty above half the volume they
    actually shipped in 1996 for LIKE-filtered parts — decorrelated to
    semi joins over a pre-aggregated shipped-volume frame.

    l_quantity values are whole numbers, so the double sum is exact and the
    0.5x threshold compares identically across engines.  Scale: shipped
    aggregates the date-pruned fact slice on the same composite key as the
    partsupp join; part filter and nation dim broadcast."""
    part, supplier, nation, lineitem = load(
        spark, sf_dir, "part", "supplier", "nation", "lineitem"
    )
    shipped = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    small_parts = part.where(F.col("p_name").like("small%")).select("p_partkey")
    excess = (
        _partsupp(lineitem)
        .join(F.broadcast(small_parts), F.col("p_partkey") == F.col("ps_partkey"), "left_semi")
        .join(
            shipped,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .where(F.col("ps_availqty") > 0.5 * F.col("qty"))
        .select("ps_suppkey")
        .dropDuplicates()
    )
    return (
        supplier.join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_3")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(excess, F.col("ps_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )
