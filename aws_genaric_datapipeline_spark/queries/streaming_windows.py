"""Driver queries for the event-time window operators (streaming semantics,
batch execution).

The exact expressions used by the streaming jobs (streaming/windows.py) run
here in batch mode over the events table; DuckDB oracles use time_bucket /
lag-gap-cumsum equivalents.  Streaming execution of the same expressions
(watermarks, availableNow, checkpoints) is covered in tests/test_streaming.py
— window placement and aggregate values are engine semantics shared by both
modes, which is what the oracle pins down.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.streaming.windows import (
    session_windows,
    sliding_counts,
    tumbling_counts,
)
from aws_genaric_datapipeline_spark.tables import load


@query(
    "stream_tumbling_counts",
    oracle="""
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
               event_type,
               count(*) AS event_count,
               round(sum(value), 2) AS value_sum
        FROM events
        GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 5-minute windows per event type (F.window ≡ time_bucket)."""
    (events,) = load(spark, sf_dir, "events")
    return tumbling_counts(events)


@query(
    "stream_sliding_counts",
    oracle="""
        SELECT window_start, count(*) AS event_count FROM (
            SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '10 minutes', ts,
                               TIMESTAMP '2000-01-01 00:05:00') AS window_start FROM events
        )
        GROUP BY 1
    """,
    tags=("streaming", "window"),
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 10-minute windows every 5 minutes (each event in 2 windows);
    oracle = union of two phase-shifted tumbling bucketings."""
    (events,) = load(spark, sf_dir, "events")
    return sliding_counts(events)


@query(
    "stream_session_windows",
    oracle="""
        WITH ordered AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                             > INTERVAL '30 minutes'
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM ordered
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL '30 minutes' AS session_end,
               count(*) AS event_count
        FROM sessions
        GROUP BY user_id, session_id
    """,
    tags=("streaming", "session"),
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows per user (native session_window operator;
    oracle = classic lag-gap-cumsum sessionization — same partitions by
    construction)."""
    (events,) = load(spark, sf_dir, "events")
    return session_windows(events)


@query(
    "stream_join_click_view",
    oracle="""
        SELECT v.user_id AS user_id,
               v.event_id AS view_id,
               c.event_id AS click_id,
               v.ts AS view_ts,
               c.ts AS click_ts
        FROM events v
        JOIN events c
          ON c.user_id = v.user_id
         AND v.event_type = 'view'
         AND c.event_type = 'click'
         AND c.ts >= v.ts
         AND c.ts <= v.ts + INTERVAL '1 hour'
    """,
    tags=("streaming", "join"),
)
def stream_join_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (attribution shape), batch-executed:
    each click pairs with the same user's views from the preceding hour.
    The exact operator the streaming job runs (streaming/windows.py
    join_click_after_view — watermark + time-range bound state eviction);
    batch/stream equivalence of the pair set is pinned by
    tests/test_streaming.py::TestStreamStreamJoin, and the oracle checks
    the interval-join semantics both modes share."""
    from aws_genaric_datapipeline_spark.streaming.windows import (
        join_click_after_view,
    )
    import pyspark.sql.functions as F

    (events,) = load(spark, sf_dir, "events")
    return join_click_after_view(
        events.where(F.col("event_type") == "view"),
        events.where(F.col("event_type") == "click"),
        max_lag="1 hour",
    )


@query(
    "stream_join_view_no_click",
    oracle="""
        SELECT v.user_id AS user_id,
               v.event_id AS view_id,
               v.ts AS view_ts
        FROM events v
        WHERE v.event_type = 'view'
          AND NOT EXISTS (
              SELECT 1 FROM events c
              WHERE c.event_type = 'click'
                AND c.user_id = v.user_id
                AND c.ts >= v.ts
                AND c.ts <= v.ts + INTERVAL '1 hour'
          )
    """,
    tags=("streaming", "join"),
)
def stream_join_view_no_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OUTER half of the attribution join, batch-executed: views that
    got no click within the hour — exactly the null-padded rows the
    streaming left-outer interval join emits once the watermark proves no
    partner can still arrive (streaming/windows.py join_click_after_view
    how='left_outer'; stream/batch equivalence incl. the min-watermark
    drain discipline is pinned by
    tests/test_streaming.py::TestStreamStreamOuterJoin).  The oracle is
    the equivalent NOT EXISTS anti-semantics."""
    from aws_genaric_datapipeline_spark.streaming.windows import (
        join_click_after_view,
    )
    import pyspark.sql.functions as F

    (events,) = load(spark, sf_dir, "events")
    out = join_click_after_view(
        events.where(F.col("event_type") == "view"),
        events.where(F.col("event_type") == "click"),
        max_lag="1 hour",
        how="left_outer",
    )
    return out.where(F.col("click_id").isNull()).select(
        "user_id", "view_id", "view_ts"
    )


@query(
    "stream_dedup_events",
    oracle="""
        SELECT DISTINCT user_id, event_type,
               date_trunc('minute', ts) AS minute
        FROM events
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once event dedup (debounce to one row per
    (user, type, minute)), batch-executed: the SAME operator the streaming
    job runs via dropDuplicatesWithinWatermark — watermark-evicted per-key
    state, so streaming memory is bounded by the duplicate horizon, not
    stream length.  Batch/stream survivor-set equivalence is pinned by
    tests/test_streaming.py::TestStreamingDedup; the oracle checks the
    key-set semantics both modes share."""
    from aws_genaric_datapipeline_spark.streaming.windows import debounce_dedup

    (events,) = load(spark, sf_dir, "events")
    return debounce_dedup(events)


@query(
    "stream_enrich_dim",
    oracle="""
        SELECT c.c_mktsegment AS segment,
               e.event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(e.value), 2) AS value_sum
        FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
    """,
    tags=("streaming", "join"),
)
def stream_enrich_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment (streaming/windows.py
    enrich_with_dim): the events stream broadcast-joins the customer
    dimension per micro-batch — stateless by construction, the standard
    star-schema enrich — then rolls up per (segment, event_type).
    Identical expression on a batch frame = the oracle; the streaming
    equivalence (availableNow drain, unmatched keys kept by the left
    join) is pinned in TestStreamStaticJoin."""
    from aws_genaric_datapipeline_spark.streaming.windows import (
        enrich_with_dim,
    )

    events, customer = load(spark, sf_dir, "events", "customer")
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = enrich_with_dim(events, dim)
    return enriched.groupBy(
        F.col("c_mktsegment").alias("segment"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


def _duck_cdf_diff(old_cte: str, new_cte: str, version: int) -> str:
    """One table_changes(v-1, v) replay: full-outer join between snapshot
    CTEs, null-safe value compare, change_type classification."""
    return f"""
        SELECT coalesce(n.k, o.k) AS k,
               CASE WHEN o.k IS NULL THEN 'insert'
                    WHEN n.k IS NULL THEN 'delete'
                    ELSE 'update_postimage' END AS change_type,
               o.v AS old_v, n.v AS new_v,
               CAST({version} AS BIGINT) AS _cdf_version
        FROM {old_cte} o FULL OUTER JOIN {new_cte} n ON o.k = n.k
        WHERE o.k IS NULL OR n.k IS NULL OR o.v IS DISTINCT FROM n.v"""


@query(
    "stream_cdf_feed",
    oracle=f"""
        WITH base AS (
            SELECT o_orderkey AS k, o_orderstatus AS v FROM orders
        ),
        s1 AS (SELECT k, v FROM base WHERE k % 3 = 0),
        upd AS (SELECT k, v || '+' AS v FROM base WHERE k % 2 = 0),
        s2 AS (
            SELECT k, v FROM s1 WHERE k NOT IN (SELECT k FROM upd)
            UNION ALL SELECT k, v FROM upd
        ),
        s3 AS (SELECT k, v || '-' AS v FROM base WHERE k % 4 = 0),
        s0 AS (SELECT k, v FROM s1 WHERE 1 = 0)
        {_duck_cdf_diff('s0', 's1', 1)}
        UNION ALL {_duck_cdf_diff('s1', 's2', 2)}
        UNION ALL {_duck_cdf_diff('s2', 's3', 3)}
    """,
    tags=("streaming", "cdc", "txn"),
)
def stream_cdf_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed consumed AS A STREAM, end to end: three upstream
    commits (bootstrap append of k%3=0, MERGE of k%2=0 with '+'-suffixed
    values, overwrite to k%4=0 with '-'-suffixed values) land in a real
    TxnTable; streaming/cdf.py stream_table_changes then tails the commit
    log with a genuine Structured Streaming file source (availableNow)
    and appends each version's row-level diff into a downstream TxnTable
    with per-version exactly-once app_txn_ids.  The returned frame is the
    downstream table's CONTENT — so the oracle (three full-outer-join
    snapshot diffs replayed in SQL) value-checks what the stream actually
    delivered, inserts/updates/deletes and version stamps included.

    Scale: the stream ships only ~1 KB commit JSONs; each version's
    data-plane cost is one snapshot full-outer join (see streaming/cdf.py
    for the 100 TB posture and self-healing offset design)."""
    import tempfile

    from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable
    from aws_genaric_datapipeline_spark.streaming.cdf import (
        stream_table_changes,
    )

    import shutil

    (orders,) = load(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("v")
    )
    tmp = tempfile.mkdtemp(prefix="cdf_feed_")
    try:
        src = TxnTable(spark, f"{tmp}/src")
        dst = TxnTable(spark, f"{tmp}/dst")
        src.append(base.where(F.col("k") % 3 == 0))
        src.merge_upsert(
            base.where(F.col("k") % 2 == 0).select(
                "k", F.concat("v", F.lit("+")).alias("v")
            ),
            keys=["k"],
        )
        src.overwrite(
            base.where(F.col("k") % 4 == 0).select(
                "k", F.concat("v", F.lit("-")).alias("v")
            )
        )
        q = stream_table_changes(
            spark, src, dst, ["k"], f"{tmp}/ckpt", sink_id="q"
        )
        if not q.awaitTermination(300):
            q.stop()  # or the finally-rmtree pulls files from a live query
            raise RuntimeError(
                "CDF stream did not drain within 300 s — refusing to return "
                "a partial feed"
            )
        # pin the feed into Spark storage so the temp parquet can go away
        # immediately (this query runs many times per bench/sweep; leaking
        # a multi-MB table per run would grow /tmp without bound)
        return dst.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "stream_cdf_replica",
    oracle="""
        WITH base AS (
            SELECT o_orderkey AS k, o_orderstatus AS v FROM orders
        ),
        s3 AS (SELECT k, v || '-' AS v FROM base WHERE k % 4 = 0)
        SELECT k, v FROM s3 WHERE k % 3 <> 0
    """,
    tags=("streaming", "cdc", "txn"),
)
def stream_cdf_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY CHANGES INTO, end to end: the same 3-version upstream as
    stream_cdf_feed plus a row-level DELETE version (k%3=0 removed via
    TxnTable.delete_keys), consumed by streaming/cdf.py
    stream_apply_changes — a real availableNow stream maintaining a
    REPLICA table through insert/update/delete/pure-delete versions with
    per-version marker commits.  The returned frame is the replica's
    final content, which must equal the upstream's last snapshot (the
    oracle): overwrite-to-(k%4=0, '-'-suffixed) minus the deleted k%3=0
    keys.  Intermediate per-version diff values are pinned by the
    stream_cdf_feed oracle; this query pins the APPLY semantics."""
    import shutil
    import tempfile

    from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable
    from aws_genaric_datapipeline_spark.streaming.cdf import (
        stream_apply_changes,
    )

    (orders,) = load(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("v")
    )
    tmp = tempfile.mkdtemp(prefix="cdf_replica_")
    try:
        src = TxnTable(spark, f"{tmp}/src")
        rep = TxnTable(spark, f"{tmp}/rep")
        src.append(base.where(F.col("k") % 3 == 0))
        src.merge_upsert(
            base.where(F.col("k") % 2 == 0).select(
                "k", F.concat("v", F.lit("+")).alias("v")
            ),
            keys=["k"],
        )
        src.overwrite(
            base.where(F.col("k") % 4 == 0).select(
                "k", F.concat("v", F.lit("-")).alias("v")
            )
        )
        src.delete_keys(
            base.where(F.col("k") % 3 == 0).select("k"), ["k"]
        )
        q = stream_apply_changes(
            spark, src, rep, ["k"], f"{tmp}/ckpt", sink_id="q"
        )
        if not q.awaitTermination(300):
            q.stop()  # or the finally-rmtree pulls files from a live query
            raise RuntimeError(
                "replica stream did not drain within 300 s — refusing to "
                "return a partial replica"
            )
        return rep.read().localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
