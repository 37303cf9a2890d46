"""Event-time windowed aggregations over the events stream.

Each aggregation is a plain DataFrame expression: applied to a streaming
DataFrame it runs incrementally with watermark-managed state; applied to a
batch DataFrame it computes the same result in one pass (this is how the
driver's DuckDB oracle verifies the semantics).  The reference's only
"streaming" was per-record Lambda dispatch with batch_size=1
(aws_genaric_datapipeline_stack.py:82) — no windows, no watermarks.

Scale notes: streaming state is keyed by (group keys, window); the
watermark bounds state size — without it a windowed agg leaks state
forever.  Sliding windows multiply state by window/slide; session windows
keep one merging state per key.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over an events directory (schema pinned — streaming
    sources never infer)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame, width: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Per-type counts/sums in tumbling event-time windows."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "value_sum",
        )
    )


def sliding_counts(
    events: DataFrame,
    width: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window event counts (each row lands in width/slide windows)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(F.col("w.start").alias("window_start"), "event_count")
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Per-user session windows (gap-merged): start/end/count per session.

    Uses the native session_window operator — in streaming it merges
    partial sessions as events arrive; in batch it's equivalent to the
    classic lag-gap-cumsum sessionization (which is exactly what the DuckDB
    oracle runs).
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "event_count",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Drop duplicate event_ids within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds dedup state by event time —
    the streaming analog of exact dedup; state size = ids per horizon, not
    ids ever seen."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    static dimension snapshot — no watermark or state needed because the
    static side is re-read per batch (stateless by construction, unlike
    stream-stream joins).

    Scale: broadcast the dimension (the standard star-schema enrich);
    Catalyst does this per micro-batch, so dimension updates between
    batches are picked up automatically when the static side is a table.
    """
    return events.join(F.broadcast(dim), on, how)


def join_click_after_view(
    views: DataFrame,
    clicks: DataFrame,
    max_lag: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each click pairs with the same user's
    views from the preceding ``max_lag`` (attribution shape).  Works on
    batch DataFrames identically — that is how equivalence is tested.

    Stream-stream inner joins need BOTH a watermark on each side and a
    time-range condition relating the two event times: together they bound
    how long a buffered row can still find a partner, so the join state is
    evicted instead of growing forever.  Without the interval bound the
    state is unbounded regardless of watermark.

    Scale: state is hash-partitioned by user_id; the watermark caps state
    at (events within `watermark + max_lag`) per side.

    ``how="left_outer"`` adds the never-clicked views: an outer
    stream-stream join emits its null-padded rows only when the watermark
    proves no partner can still arrive, so results trail the inner rows by
    the watermark delay — the batch-equivalence test advances the
    watermark with a sentinel event to drain them deterministically.
    """
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    if views.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (v["v_user"] == c["c_user"])
        & (c["click_ts"] >= v["view_ts"])
        & (c["click_ts"] <= v["view_ts"] + F.expr(f"INTERVAL {max_lag}"))
    )
    return v.join(c, cond, how).select(
        F.col("v_user").alias("user_id"), "view_id", "click_id", "view_ts", "click_ts"
    )


def debounce_dedup(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """First-occurrence deduplication of (user_id, event_type, minute) keys
    — the streaming exactly-once event-dedup shape a training-data ingest
    runs in front of every downstream consumer: at-least-once upstreams
    (replayed Kafka ranges, retried webhooks) emit duplicates that would
    double-count into features and corpora.

    Streaming mode uses ``dropDuplicatesWithinWatermark``: per-key state is
    EVICTED once the watermark passes the key's event time, so state is
    bounded by the duplicate-arrival horizon (the watermark) instead of
    growing with the whole stream — the property plain ``dropDuplicates``
    lacks in streaming (its state never expires).  A duplicate arriving
    within the watermark of its first occurrence is dropped; one arriving
    later than the watermark re-emits (the documented at-most-horizon
    contract — size the watermark to the upstream's replay window).

    Batch mode is the same projection + ``dropDuplicates``; the output is
    the KEY COLUMNS ONLY, so the survivor set is deterministic in both
    modes and a plain SELECT DISTINCT replays it (queries/streaming_windows
    stream_dedup_events carries the oracle; batch/stream equivalence is
    pinned by tests/test_streaming.py::TestStreamingDedup)."""
    keyed = events.select(
        "ts",
        "user_id",
        "event_type",
        F.date_trunc("minute", F.col("ts")).alias("minute"),
    )
    if events.isStreaming:
        dd = keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["user_id", "event_type", "minute"]
        )
    else:
        dd = keyed.dropDuplicates(["user_id", "event_type", "minute"])
    return dd.select("user_id", "event_type", "minute")
