"""Join operator coverage (SURVEY.md §2b rows: equi/outer/semi/anti/theta/range/as-of).

The reference has zero joins (single-table pipeline, glue src/raw_layer_job.py);
these define the join surface of the rebuild.  Scale notes per query; the
general strategy: dimension sides broadcast (explicit hint or AQE), fact-fact
joins shuffle on the join key, non-equi joins always carry an equi component
so Catalyst plans hash/sort-merge + filter rather than a nested-loop cross.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "join_inner_equi",
    oracle="""
        SELECT p.p_brand,
               round(sum(l.l_extendedprice), 2) AS total_price,
               count(*) AS line_count
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size <= 20
        GROUP BY p.p_brand
    """,
    tags=("join",),
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim inner equi join; dim side broadcast (part is KBs per brand)."""
    lineitem, part = load(spark, sf_dir, "lineitem", "part")
    return (
        lineitem.join(F.broadcast(part.where(F.col("p_size") <= 20)), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@query(
    "join_left_outer",
    oracle="""
        SELECT c.c_custkey,
               count(o.o_orderkey) AS order_count,
               round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        GROUP BY c.c_custkey
    """,
    tags=("join",),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero matching orders.

    The date predicate lives in the join condition (not a post-filter) so
    unmatched customers survive — classic outer-join pitfall covered here.
    """
    customer, orders = load(spark, sf_dir, "customer", "orders")
    cond = (F.col("c_custkey") == F.col("o_custkey")) & (
        F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
    )
    return (
        customer.join(orders, cond, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
        WITH s AS (
            SELECT s_nationkey AS nationkey, count(*) AS supplier_count
            FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey
        ), c AS (
            SELECT c_nationkey AS nationkey, count(*) AS customer_count
            FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
        )
        SELECT coalesce(s.nationkey, c.nationkey) AS nationkey,
               coalesce(s.supplier_count, 0) AS supplier_count,
               coalesce(c.customer_count, 0) AS customer_count
        FROM s FULL OUTER JOIN c ON s.nationkey = c.nationkey
    """,
    tags=("join",),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two filtered aggregates (nations with rich suppliers
    vs nations with rich customers); either side may be missing."""
    supplier, customer = load(spark, sf_dir, "supplier", "customer")
    s = (
        supplier.where(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("supplier_count"))
    )
    c = (
        customer.where(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("customer_count"))
    )
    return s.join(c, F.col("s_nk") == F.col("c_nk"), "full").select(
        F.coalesce(F.col("s_nk"), F.col("c_nk")).alias("nationkey"),
        F.coalesce(F.col("supplier_count"), F.lit(0)).alias("supplier_count"),
        F.coalesce(F.col("customer_count"), F.lit(0)).alias("customer_count"),
    )


@query(
    "join_left_semi",
    oracle="""
        SELECT c.c_custkey, c.c_mktsegment
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > 400000
        )
    """,
    tags=("join",),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join = EXISTS: customers having at least one 400k+ order.

    Semi joins shuffle only the keys of the probe side and never duplicate
    rows — the right way to express EXISTS at scale (vs join+distinct).
    """
    customer, orders = load(spark, sf_dir, "customer", "orders")
    big = orders.where(F.col("o_totalprice") > 400000)
    return customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_left_anti",
    oracle="""
        SELECT c.c_custkey, c.c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
        )
    """,
    tags=("join",),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join = NOT EXISTS: customers with no urgent orders.

    (Filtered on the right side so the result is non-empty at every SF —
    every customer has *some* order in the fixtures.)
    """
    customer, orders = load(spark, sf_dir, "customer", "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return customer.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "join_theta_pairs",
    oracle="""
        SELECT a.p_brand,
               count(*) AS pair_count,
               round(avg(b.p_size - a.p_size), 4) AS avg_size_gap
        FROM part a
        JOIN part b ON a.p_brand = b.p_brand AND a.p_size < b.p_size
        GROUP BY a.p_brand
    """,
    tags=("join", "theta"),
)
def join_theta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (equi component + inequality): size-ordered part pairs per brand.

    The equi key (brand) keeps this a hash join with a residual filter —
    never a full cross product, so it scales with Σ_brand n_b², not N².
    """
    (part,) = load(spark, sf_dir, "part")
    a = part.select(F.col("p_brand").alias("a_brand"), F.col("p_size").alias("a_size"))
    b = part.select(F.col("p_brand").alias("b_brand"), F.col("p_size").alias("b_size"))
    return (
        a.join(b, (F.col("a_brand") == F.col("b_brand")) & (F.col("a_size") < F.col("b_size")))
        .groupBy(F.col("a_brand").alias("p_brand"))
        .agg(
            F.count(F.lit(1)).alias("pair_count"),
            F.round(F.avg(F.col("b_size") - F.col("a_size")), 4).alias("avg_size_gap"),
        )
    )


@query(
    "join_range_events",
    oracle="""
        SELECT v.user_id, count(*) AS conversion_pairs
        FROM events v
        JOIN events p
          ON v.user_id = p.user_id
         AND p.ts > v.ts
         AND p.ts <= v.ts + INTERVAL 30 MINUTE
        WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        GROUP BY v.user_id
    """,
    tags=("join", "range"),
)
def join_range_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: purchases within 30 min after a view, per user.

    Equi key (user_id) + time-range residual → hash join, skew-safe under
    AQE.  At 100 TB the same shape works bucketed by user_id.
    """
    (events,) = load(spark, sf_dir, "events")
    v = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    return (
        v.join(
            p,
            (F.col("v_user") == F.col("p_user"))
            & (F.col("p_ts") > F.col("v_ts"))
            & (F.col("p_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("conversion_pairs"))
    )


@query(
    "join_asof_events",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts, c.ts AS last_click_ts
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    tags=("join", "asof"),
)
def join_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each error event, the most recent click by the same
    user at-or-before it (NULL when none).

    Spark has no native as-of join; this is the range-join + row_number()==1
    strategy from SURVEY.md §2b.  For very dense right sides, the scalable
    variant is the union-tag-sort trick (single sort, no pair blowup); here
    the per-user match density is low, so the range join wins on simplicity
    and stays a hash join on user_id.
    """
    (events,) = load(spark, sf_dir, "events")
    err = events.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clk = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = err.join(
        clk, (F.col("user_id") == F.col("c_user")) & (F.col("c_ts") <= F.col("ts")), "left"
    )
    w = Window.partitionBy("event_id").orderBy(F.desc_nulls_last("c_ts"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "user_id", "ts", F.col("c_ts").alias("last_click_ts"))
    )


@query(
    "join_asof_union_sort",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts, c.ts AS last_click_ts
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
    tags=("join", "asof"),
)
def join_asof_union_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join by the UNION-TAG-SORT strategy — the scalable plan for
    dense right sides that join_asof_events' docstring promises: tag
    clicks 0 / errors 1, one sort per user on (ts, tag), and a running
    last_value(click_ts) IGNORE NULLS hands every error its most recent
    click — ONE shuffle, ZERO pair blowup (the range-join form first
    materializes every (error, earlier-click) pair before row_number
    keeps one; at 10k clicks/user that is a 10⁴× intermediate).

    Identical oracle to join_asof_events: both implementations must land
    on the same rows, which is exactly what sharing the oracle asserts.
    Tag order makes same-timestamp semantics exact: click (0) sorts
    before error (1), so an error matches a click AT its own timestamp —
    the >= contract."""
    (events,) = load(spark, sf_dir, "events")
    clk = events.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("event_id"),
    )
    err = events.where(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clk.unionByName(err)
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .where(F.col("tag") == 1)
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


@query(
    "join_asof_forward",
    oracle="""
        SELECT e.event_id, e.user_id, e.ts, c.ts AS next_click_ts
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON e.user_id = c.user_id AND e.ts < c.ts
    """,
    tags=("join", "asof"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each error, the earliest click STRICTLY
    after it by the same user (time-to-recovery analysis; NULL when the
    user never clicks again).  Same union-tag-sort shape as
    join_asof_union_sort but scanned descending, with the tag order
    flipped (error 0 before click 1 at equal ts) so a same-timestamp
    click is NOT matched — the strict-< contract, which the DuckDB ASOF
    `e.ts < c.ts` oracle pins."""
    (events,) = load(spark, sf_dir, "events")
    clk = events.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("tag"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("event_id"),
    )
    err = events.where(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.lit(0).alias("tag"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.asc("tag"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clk.unionByName(err)
        .withColumn("next_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .where(F.col("tag") == 0)
        .select("event_id", "user_id", "ts", "next_click_ts")
    )


@query(
    "join_nullsafe",
    oracle="""
        SELECT count(*) AS pair_count
        FROM (SELECT p_partkey, nullif(p_brand, 'Brand#2') AS nb FROM part) a
        JOIN (SELECT p_partkey, nullif(p_brand, 'Brand#2') AS nb FROM part) b
          ON a.nb IS NOT DISTINCT FROM b.nb
         AND a.p_partkey < b.p_partkey
    """,
    tags=("join", "nullsafe"),
)
def join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (<=>): NULL keys match each other (unlike =).

    nullif() manufactures NULL keys from 'Brand#2' so the null-safe bucket
    is exercised; a plain = join would silently drop those pairs.
    """
    (part,) = load(spark, sf_dir, "part")
    a = part.select(F.col("p_partkey").alias("a_key"), F.nullif(F.col("p_brand"), F.lit("Brand#2")).alias("a_nb"))
    b = part.select(F.col("p_partkey").alias("b_key"), F.nullif(F.col("p_brand"), F.lit("Brand#2")).alias("b_nb"))
    return (
        a.join(b, F.col("a_nb").eqNullSafe(F.col("b_nb")) & (F.col("a_key") < F.col("b_key")))
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )


@query(
    "join_bloom_semi_reduction",
    oracle="""
        SELECT l.l_returnflag,
               count(*) AS n_items,
               CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                             AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
        GROUP BY l.l_returnflag
    """,
    tags=("join", "bloom", "scale"),
)
def join_bloom_semi_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction via Spark's own InjectRuntimeFilter:
    the selective dimension side (URGENT orders, ~1/5 of the table) folds
    into a bloom_filter_agg scalar subquery, and Catalyst rewrites the
    fact-side scan to might_contain(bloom, xxhash64(l_orderkey)) BEFORE
    the shuffle — so only ~selectivity + fpp of lineitem rows ever reach
    the exchange.  might_contain/bloom_filter_agg are internal-only
    expressions (not in the public function registry), so the supported
    surface IS the optimizer rule; this query pins the configuration that
    makes it fire in the shuffle-join regime and gates the injected
    filter in the plan (tests/test_plans.py).

    The rule only helps — and only fires — when the dimension side is too
    big to broadcast (broadcast already prunes via the hash table), which
    is exactly the 100 TB regime; the thresholds below simulate it at
    test scale.  Configs are restored after an eager materialization, so
    the session the bench shares sees no leaked planner state.

    Correctness never depends on the bloom: false positives survive the
    pre-filter but die in the exact equi join, so the oracle is the plain
    join.

    Scale: the bloom build is a map-side agg over already-filtered order
    keys (one ~MB bitset broadcast once, no extra lineitem pass); the
    fact-side shuffle — the whole cost at 100 TB — shrinks to the
    dimension predicate's selectivity."""
    (orders, lineitem) = load(spark, sf_dir, "orders", "lineitem")
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # Fire the rule at test scale: any fact-scan size qualifies, the
        # dimension side qualifies up to 1 GB, and broadcast is off so the
        # join actually shuffles (the regime the bloom exists for).
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        sel = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
        joined = (
            lineitem.join(sel, lineitem.l_orderkey == sel.o_orderkey)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_items"),
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                    ).cast("bigint")
                )
                .cast("bigint")
                .alias("revenue_cents"),
            )
        )
        # Materialize under the pinned configs (3 aggregate rows), then
        # restore — the returned frame is a scan of the checkpoint.
        return joined.localCheckpoint(eager=True)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@query(
    "join_bucketed_colocated",
    oracle="""
        SELECT o.o_orderpriority,
               count(*) AS n_items,
               CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS gross_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
    """,
    tags=("join", "bucketing", "scale"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join over CO-BUCKETED catalog tables: both sides are
    written bucketBy(16, key) + sortBy(key), so the join itself plans a
    sort-merge over matching bucket ids with ZERO exchange and ZERO sort
    — the shuffle was paid once at write time (tests/test_plans.py::
    TestBucketedJoin asserts shuffle_count == 0 for exactly this shape).

    This is the ingest-side contract for recurring fact-fact joins at
    100 TB: re-shuffling 100 TB per query is the single largest avoidable
    cost in a star-join workload, and bucketing amortizes it across every
    downstream join/agg on the same key.  The query measures the whole
    trade honestly — table build + co-located join — the way a nightly
    pipeline pays it (build once, query many; only the join side of the
    trade repeats in production).

    Broadcast is disabled during the join so the plan demonstrates the
    shuffle-free SMJ rather than broadcasting the (small at test SF)
    orders side; restored after eager materialization."""
    from aws_genaric_datapipeline_spark.operators.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    (orders, lineitem) = load(spark, sf_dir, "orders", "lineitem")
    write_bucketed(
        orders.select(
            F.col("o_orderkey").alias("k"), "o_orderpriority"
        ),
        "bkt_q_orders",
        ["k"],
        16,
        sort_cols=["k"],
    )
    write_bucketed(
        lineitem.select(F.col("l_orderkey").alias("k"), "l_extendedprice"),
        "bkt_q_lineitem",
        ["k"],
        16,
        sort_cols=["k"],
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "bkt_q_lineitem", "bkt_q_orders", ["k"])
        out = joined.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("gross_cents"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
