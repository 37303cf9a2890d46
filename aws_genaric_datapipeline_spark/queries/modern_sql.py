"""Modern Spark SQL surface: recursive CTEs (Spark 4), LATERAL correlated
subqueries, and Python UDTFs.

The reference predates all of these (Glue 2.0 = Spark 2.4); they matter for
the rebuild because they subsume driver-side loops: hierarchies that would
otherwise be a Python while-loop over collect() (recursive CTE), per-row
dependent subplans (LATERAL), and custom row-expanding generators (UDTF) all
stay inside one distributed plan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load


@query(
    "recursive_month_spine",
    oracle="""
        WITH RECURSIVE spine(mon) AS (
            SELECT CAST(date_trunc('month', min(o_orderdate)) AS DATE) FROM orders
            UNION ALL
            SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM spine
            WHERE mon < (SELECT CAST(date_trunc('month', max(o_orderdate)) AS DATE) FROM orders)
        )
        SELECT s.mon,
               count(o.o_orderkey) AS order_count,
               CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS revenue_cents
        FROM spine s
        LEFT JOIN orders o ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = s.mon
        GROUP BY s.mon
    """,
    tags=("modern-sql", "recursive"),
)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4): generate a gap-free month spine from min to
    max order date by recursion, then left-join monthly order counts —
    months with zero orders survive.  The recursion replaces a driver-side
    date loop; each iteration is a distributed step under one plan.

    The recursion bounds are LOOP-INVARIANT, so they are hoisted into
    literals by one tiny pre-aggregation (two scalars) instead of a
    min/max scalar subquery re-evaluated inside every recursive step —
    ~84 monthly iterations each re-paying an orders aggregation dropped
    the query from ~11 s to ~1 s at sf0.1 with an identical result.  The
    cost is iteration-count-bound either way; the hoist removes the
    data-bound term from the loop body entirely.

    (The sequence()/explode spine in events_resample_locf is the
    non-recursive alternative; both are first-class.)
    """
    (orders,) = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    lo, hi = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date"),
        F.date_trunc("month", F.max("o_orderdate")).cast("date"),
    ).first()
    # empty orders: NULL seed, NULL bound (mon < NULL never true) — the
    # exact rows the unhoisted form and the oracle produce
    lo_sql = f"DATE'{lo}'" if lo is not None else "CAST(NULL AS DATE)"
    hi_sql = f"DATE'{hi}'" if hi is not None else "CAST(NULL AS DATE)"
    return spark.sql(
        f"""
        WITH RECURSIVE spine(mon) AS (
            SELECT {lo_sql}
            UNION ALL
            SELECT CAST(mon + INTERVAL 1 MONTH AS DATE) FROM spine
            WHERE mon < {hi_sql}
        )
        SELECT s.mon,
               count(o.o_orderkey) AS order_count,
               CAST(coalesce(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)), 0) AS BIGINT) AS revenue_cents
        FROM spine s
        LEFT JOIN orders o ON CAST(date_trunc('month', o.o_orderdate) AS DATE) = s.mon
        GROUP BY s.mon
        """
    )


@query(
    "lateral_top_orders_per_customer",
    oracle="""
        SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        WHERE c.c_custkey <= 300
    """,
    tags=("modern-sql", "lateral"),
)
def lateral_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each customer's top-2 orders by price.
    The per-row dependent subplan (ORDER BY ... LIMIT inside LATERAL) is
    what plain joins can't express; Catalyst decorrelates it into a ranked
    window under the hood rather than re-running the subquery per row.
    """
    (orders, customer) = load(spark, sf_dir, "orders", "customer")
    orders.createOrReplaceTempView("orders")
    customer.createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price
        FROM customer c,
        LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) t
        WHERE c.c_custkey <= 300
        """
    )


@query(
    "udtf_token_positions",
    oracle=r"""
        WITH toks AS (
            SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
            FROM documents
            WHERE doc_id < 40 AND length(trim(text)) > 0
        )
        SELECT doc_id,
               unnest(range(1, len(l) + 1)) AS pos,
               unnest(l) AS word
        FROM toks
    """,
    tags=("modern-sql", "udtf"),
)
def udtf_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+): a row-expanding table function emitting
    (pos, word) per token — the custom-generator surface beyond explode().
    Arrow-batched like scalar pandas UDFs; the oracle is DuckDB's zipped
    double-unnest over the same split.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, pos: bigint, word: string")
    class TokenPositions:
        def eval(self, doc_id, text):
            for i, w in enumerate((text or "").split(), start=1):
                yield (doc_id, i, w)

    spark.udtf.register("token_positions", TokenPositions)
    (documents,) = load(spark, sf_dir, "documents")
    documents.where(F.col("doc_id") < 40).createOrReplaceTempView("docs_subset")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.word "
        "FROM docs_subset d, LATERAL token_positions(d.doc_id, d.text) t"
    )


@query(
    "pipe_syntax_revenue",
    oracle="""
        SELECT l_returnflag,
               count(*) AS n_items,
               CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                        AS BIGINT)) AS BIGINT) AS revenue_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        GROUP BY l_returnflag
    """,
    tags=("modern-sql", "pipe"),
)
def pipe_syntax_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4, |> operators): the same logical plan as the
    GROUP BY form — pipe stages are sugar over standard relational
    operators, so Catalyst sees an identical tree (the DuckDB oracle is the
    classic form, proving equivalence).
    """
    (lineitem,) = load(spark, sf_dir, "lineitem")
    lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |> EXTEND CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
                  AS item_cents
        |> AGGREGATE count(*) AS n_items,
                     CAST(sum(item_cents) AS BIGINT) AS revenue_cents
           GROUP BY l_returnflag
        """
    )


@query(
    "events_rfm_segments",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   max(ts)  AS last_ts,
                   count(*) AS frequency,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
            FROM events WHERE event_type = 'purchase'
            GROUP BY user_id
        ),
        scored AS (
            SELECT user_id, frequency, monetary_cents,
                   ntile(4) OVER (ORDER BY last_ts, user_id)         AS r_score,
                   ntile(4) OVER (ORDER BY frequency, user_id)       AS f_score,
                   ntile(4) OVER (ORDER BY monetary_cents, user_id)  AS m_score
            FROM per_user
        )
        SELECT CAST(r_score AS INT) AS r_score,
               CAST(f_score AS INT) AS f_score,
               CAST(m_score AS INT) AS m_score,
               count(*) AS n_users,
               CAST(sum(monetary_cents) AS BIGINT) AS segment_cents
        FROM scored
        GROUP BY 1, 2, 3
    """,
    tags=("events", "rfm"),
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quartiles per
    purchasing user, then segment rollup) — the standard customer-value
    cube.  Unique-id tie-breaks in every ntile make the quartile assignment
    deterministic and engine-portable.

    Scale: one fact aggregation to per-user rows, then windows over the
    (small) user dimension; the segment rollup is a partial-merge groupBy.
    """
    from pyspark.sql import Window

    (events,) = load(spark, sf_dir, "events")
    per_user = (
        events.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("monetary_cents"),
        )
    )
    scored = per_user.select(
        "user_id",
        "frequency",
        "monetary_cents",
        F.ntile(4).over(Window.orderBy("last_ts", "user_id")).alias("r_score"),
        F.ntile(4).over(Window.orderBy("frequency", "user_id")).alias("f_score"),
        F.ntile(4).over(Window.orderBy("monetary_cents", "user_id")).alias("m_score"),
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("monetary_cents").cast("bigint").alias("segment_cents"),
    )


@query(
    "agg_bitmap_exact_distinct",
    oracle="""
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events
        GROUP BY event_type
    """,
    tags=("agg", "modern-sql"),
)
def agg_bitmap_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregates (Spark 3.5+ bitmap
    family): ids bucket into 32k-bit bitmaps (bitmap_construct_agg per
    bucket), per-bucket set-bit counts SUM across buckets.  Bit
    positions are only meaningful WITHIN a bucket, so bitmaps from
    different buckets are never OR'd together — bitmap_or_agg is
    reserved for merging partial bitmaps of the SAME bucket (as
    operators/matview.merge_bitmap_states does); the final readout is
    sum(bitmap_count) over the (group, bucket) grid.
    Unlike count(DISTINCT) this state is MERGEABLE —
    partial bitmaps combine across partitions, batches, or materialized-
    view refreshes without a re-dedup shuffle of raw ids — and unlike HLL
    it is exact.  ids shift by +1 so id 0 cannot collide at position
    arithmetic boundaries; distinctness is shift-invariant, which the
    count(DISTINCT) oracle pins.

    Scale: state per group is ceil(max_id/32k) bitmaps of 4 KB — bounded
    by the ID DOMAIN, not row count; the raw 100 TB of events folds
    map-side."""
    (events,) = load(spark, sf_dir, "events")
    events.createOrReplaceTempView("events_bm")
    return spark.sql(BITMAP_DISTINCT_SQL.format(view="events_bm"))


# Shared by the query above and the multi-bucket regression test
# (tests/test_queries_extra.py): the inner grouping keys the bucket, the
# outer readout SUMS per-bucket set-bit counts — never ORs bitmaps across
# buckets, which would conflate bit positions once user_id + 1 > 32768.
BITMAP_DISTINCT_SQL = """
    SELECT event_type,
           CAST(sum(bitmap_count(b)) AS BIGINT) AS n_users
    FROM (
        SELECT event_type,
               bitmap_construct_agg(bitmap_bit_position(user_id + 1)) AS b
        FROM {view}
        GROUP BY event_type, bitmap_bucket_number(user_id + 1)
    )
    GROUP BY event_type
"""


@query(
    "func_sql_udf",
    oracle="""
        SELECT doc_id,
               CAST(least(n_chars * 20, 10000) AS BIGINT) AS len_score_bp,
               CAST(CASE WHEN n_chars >= 200 THEN 'long'
                         WHEN n_chars >= 50 THEN 'medium'
                         ELSE 'short' END AS VARCHAR) AS len_class
        FROM documents
    """,
    tags=("functions", "modern-sql"),
)
def func_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined UDFs (Spark 4 CREATE FUNCTION ... RETURN expr): the
    reusable-business-logic surface that stays ENTIRELY inside Catalyst —
    the function body is inlined into the plan at resolution, so unlike a
    Python UDF there is no serialization boundary, no worker process, and
    every downstream optimization (pushdown, codegen) still applies.  The
    oracle inlines the same expressions, proving the definitions."""
    (documents,) = load(spark, sf_dir, "documents")
    documents.createOrReplaceTempView("documents_sqludf")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION len_score_bp(n BIGINT) "
        "RETURNS BIGINT RETURN least(n * 20, 10000)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION len_class(n BIGINT) "
        "RETURNS STRING RETURN CASE WHEN n >= 200 THEN 'long' "
        "WHEN n >= 50 THEN 'medium' ELSE 'short' END"
    )
    return spark.sql(
        """
        SELECT doc_id,
               len_score_bp(n_chars) AS len_score_bp,
               len_class(n_chars) AS len_class
        FROM documents_sqludf
        """
    )


@query(
    "agg_bitmap_set_algebra",
    oracle="""
        WITH s AS (SELECT DISTINCT event_type AS t, user_id AS u FROM events),
        c AS (SELECT t, count(*) AS n FROM s GROUP BY t),
        pr AS (
            SELECT a.t AS type_a, b.t AS type_b
            FROM c a JOIN c b ON a.t < b.t
        ),
        i AS (
            SELECT a.t AS type_a, b.t AS type_b, count(*) AS ni
            FROM s a JOIN s b ON a.u = b.u AND a.t < b.t
            GROUP BY 1, 2
        )
        SELECT pr.type_a, pr.type_b,
               CAST(ca.n AS BIGINT) AS n_a,
               CAST(cb.n AS BIGINT) AS n_b,
               CAST(coalesce(i.ni, 0) AS BIGINT) AS n_both,
               CAST(ca.n - coalesce(i.ni, 0) AS BIGINT) AS n_only_a,
               CAST(cb.n - coalesce(i.ni, 0) AS BIGINT) AS n_only_b,
               CAST(ca.n + cb.n - coalesce(i.ni, 0) AS BIGINT) AS n_union
        FROM pr
        JOIN c ca ON ca.t = pr.type_a
        JOIN c cb ON cb.t = pr.type_b
        LEFT JOIN i ON i.type_a = pr.type_a AND i.type_b = pr.type_b
    """,
    tags=("agg", "modern-sql", "sketches"),
)
def agg_bitmap_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set algebra over distinct-user sets via bitmap state reuse:
    per-(event_type, bucket) partial bitmaps are built ONCE, then every
    pairwise audience-overlap readout (|A∩B|, |A\\B|, |B\\A|, |A∪B|) is
    derived by merging those partials — bitmap_or_agg WITHIN a bucket for
    the union, inclusion-exclusion for the intersection — never touching
    the raw event rows again.

    This is the query shape the round-8 bucket-conflation fix
    (BITMAP_DISTINCT_SQL above) exists to make safe: bit positions are
    bucket-local, so the pair union ORs bitmaps only inside a
    (pair, bucket) group and SUMS set-bit counts across buckets.  There
    is no binary bitmap AND in Spark's SQL surface — and none is needed:
    |A∩B| = |A| + |B| - |A∪B| is exact, not an estimate (contrast the
    HLL inclusion-exclusion in dedup_sketch_guarantees, where the same
    identity inherits sketch error).

    Scale: the raw 100 TB folds map-side into per-(type, bucket) 4 KB
    bitmaps — the pair readout then joins T·ceil(max_id/32k) bitmap rows
    (KBs at any corpus size), so adding a new pair costs no re-scan; the
    T² pair grid is over TYPES, not rows.  tests/test_queries_extra.py
    pins the multi-bucket path with ids spanning >32k."""
    (events,) = load(spark, sf_dir, "events")
    events.createOrReplaceTempView("events_bmsa")
    return spark.sql(BITMAP_SET_ALGEBRA_SQL.format(view="events_bmsa"))


# Shared with the multi-bucket regression test: per-(type, bucket) partial
# bitmaps → bucket-aligned OR per pair → inclusion-exclusion readout.
BITMAP_SET_ALGEBRA_SQL = """
    WITH per AS (
        SELECT event_type,
               bitmap_bucket_number(user_id + 1) AS bk,
               bitmap_construct_agg(bitmap_bit_position(user_id + 1)) AS b
        FROM {view}
        GROUP BY event_type, bitmap_bucket_number(user_id + 1)
    ),
    cnt AS (
        SELECT event_type, CAST(sum(bitmap_count(b)) AS BIGINT) AS n
        FROM per GROUP BY event_type
    ),
    pr AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b
        FROM cnt a JOIN cnt b ON a.event_type < b.event_type
    ),
    uni AS (
        SELECT type_a, type_b, CAST(sum(bitmap_count(ub)) AS BIGINT) AS n_union
        FROM (
            SELECT pr.type_a, pr.type_b, p.bk, bitmap_or_agg(p.b) AS ub
            FROM pr
            JOIN per p
              ON p.event_type = pr.type_a OR p.event_type = pr.type_b
            GROUP BY pr.type_a, pr.type_b, p.bk
        )
        GROUP BY type_a, type_b
    )
    SELECT pr.type_a, pr.type_b,
           ca.n AS n_a,
           cb.n AS n_b,
           CAST(ca.n + cb.n - u.n_union AS BIGINT) AS n_both,
           CAST(u.n_union - cb.n AS BIGINT) AS n_only_a,
           CAST(u.n_union - ca.n AS BIGINT) AS n_only_b,
           u.n_union
    FROM pr
    JOIN cnt ca ON ca.event_type = pr.type_a
    JOIN cnt cb ON cb.event_type = pr.type_b
    JOIN uni u ON u.type_a = pr.type_a AND u.type_b = pr.type_b
"""


@query(
    "udtf_table_arg_gaps",
    oracle="""
        WITH g AS (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY epoch_us(ts)
                   ) AS gap_us
            FROM events
        )
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(coalesce(max(gap_us), 0) AS BIGINT) AS max_gap_us
        FROM g GROUP BY user_id
    """,
    tags=("modern-sql", "udtf", "streaming-adjacent"),
)
def udtf_table_arg_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF with a TABLE argument (Spark 4): the
    engine PARTITIONS the input table BY user_id and ORDERS each
    partition BY timestamp before feeding it row-by-row into the UDTF —
    per-key sequential state (previous timestamp → max gap) written as
    plain Python, with the shuffle/sort contract owned by Catalyst.
    This is the API bridge between SQL and custom sequential logic that
    windows can't express cleanly (multi-variable state machines,
    MATCH_RECOGNIZE-class scans — events_sequence_pattern implements
    one relationally; this shows the imperative escape hatch on the
    same engine contract).

    Determinism: equal timestamps make gap 0 regardless of tie order,
    so the UDTF result is a pure function of the partition CONTENT.

    Scale: one hash partition + in-partition sort — identical exchange
    shape to a window aggregate; the Python boundary streams
    Arrow batches per partition, state is O(1) per key.  Prefer JVM
    windows (events_gap_report) when the logic fits one; the UDTF is
    for when it doesn't."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, max_gap_us bigint")
    class GapStats:
        def __init__(self):
            self._uid = None
            self._prev = None
            self._n = 0
            self._max = 0

        def eval(self, row):
            self._uid = row["user_id"]
            t = row["us"]
            if self._prev is not None and t - self._prev > self._max:
                self._max = t - self._prev
            self._prev = t
            self._n += 1

        def terminate(self):
            if self._uid is not None:
                yield self._uid, self._n, self._max

    (events,) = load(spark, sf_dir, "events")
    events.select(
        "user_id", F.unix_micros("ts").alias("us")
    ).createOrReplaceTempView("events_udtf_gaps")
    spark.udtf.register("gap_stats_udtf", GapStats)
    return spark.sql(
        """
        SELECT * FROM gap_stats_udtf(
            TABLE(SELECT user_id, us FROM events_udtf_gaps)
            PARTITION BY user_id ORDER BY us
        )
        """
    )


@query(
    "window_sliding_distinct_users",
    oracle="""
        WITH days AS (
            SELECT DISTINCT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS day
            FROM events
        ),
        du AS (
            SELECT DISTINCT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   user_id
            FROM events
        )
        SELECT d.event_type, d.day,
               CAST(count(DISTINCT u.user_id) AS BIGINT) AS uniques_7d
        FROM days d
        JOIN du u
          ON u.event_type = d.event_type
         AND u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
        GROUP BY d.event_type, d.day
    """,
    tags=("window", "sketches", "timeseries"),
)
def window_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT sliding-window distinct users (7-day, per event type) via
    MERGEABLE bitmap states: per-(type, day, bucket) bitmaps are built
    ONCE from the raw stream, then every window readout is a
    bucket-aligned OR of seven daily states — the production shape for
    sliding uniques, where count(DISTINCT) over each window would
    re-shuffle raw ids seven times per day and HLL would surrender
    exactness.  The same daily states serve any window length, backfill,
    or dashboard drill without touching raw data again (they are the
    distinct-count MV, windowed — cf. mv_incremental_distinct_refresh).

    Scale: the raw 100 TB folds map-side into types × days × buckets
    4 KB bitmaps; the window join runs on that tiny state grid, OR-ing
    WITHIN (window, bucket) groups only — the same bucket discipline as
    agg_bitmap_set_algebra."""
    (events,) = load(spark, sf_dir, "events")
    events.createOrReplaceTempView("events_swd")
    return spark.sql(
        """
        WITH per AS (
            SELECT event_type,
                   CAST(date_trunc('day', ts) AS DATE) AS day,
                   bitmap_bucket_number(user_id + 1) AS bk,
                   bitmap_construct_agg(bitmap_bit_position(user_id + 1)) AS b
            FROM events_swd
            GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE),
                     bitmap_bucket_number(user_id + 1)
        ),
        anchors AS (SELECT DISTINCT event_type, day FROM per)
        SELECT a.event_type, a.day,
               CAST(sum(cnt) AS BIGINT) AS uniques_7d
        FROM anchors a
        JOIN (
            SELECT a2.event_type, a2.day, p.bk,
                   bitmap_count(bitmap_or_agg(p.b)) AS cnt
            FROM (SELECT DISTINCT event_type, day FROM per) a2
            JOIN per p
              ON p.event_type = a2.event_type
             AND p.day BETWEEN a2.day - INTERVAL 6 DAY AND a2.day
            GROUP BY a2.event_type, a2.day, p.bk
        ) w ON w.event_type = a.event_type AND w.day = a.day
        GROUP BY a.event_type, a.day
        """
    )
