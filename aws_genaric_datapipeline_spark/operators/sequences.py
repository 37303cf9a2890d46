"""Event-sequence pattern matching (MATCH_RECOGNIZE-class, Spark-first).

Spark has no MATCH_RECOGNIZE; the standard distributed recipe is to
ENCODE each key's time-ordered event stream as a compact string (one
char per event type) and run regular expressions over it — regex IS the
row-pattern language of MATCH_RECOGNIZE, and the string encoding turns
a sequential scan per key into one groupBy plus per-row JVM regex.

Engine-portability: the encoding is deterministic ((ts, event_id)
tie-broken sort), and the patterns used by the driver query restrict to
syntax with identical semantics in Java regex and RE2 (literals,
classes, ``.*``, ``+`` — greedy, non-overlapping leftmost matches), so
a DuckDB oracle replays match COUNTS and positions bit-for-bit.

Scale: one shuffle of (user, char) rows.  The DEFAULT encoding is
per-SESSION (``encode_session_sequences``): a whale user with millions
of events yields many bounded session strings, never one unbounded
string — the same partitioning MATCH_RECOGNIZE uses.  The per-user
form (``encode_sequences``) remains for corpora whose per-key event
counts are known-bounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# event_type -> single encoding char (must stay in sync with the oracle)
EVENT_CHARS = {
    "view": "v",
    "click": "c",
    "purchase": "p",
    "signup": "s",
    "error": "e",
}


def _event_char(event_type: Column) -> Column:
    out = None
    for k, ch in EVENT_CHARS.items():
        out = (
            F.when(event_type == k, F.lit(ch))
            if out is None
            else out.when(event_type == k, F.lit(ch))
        )
    return out.otherwise(F.lit("x"))


def encode_sequences(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(key, seq): each key's events as a char string in (ts, tiebreak)
    order — deterministic for any partitioning."""
    return (
        events.select(
            F.col(key_col).alias("key"),
            F.struct(
                F.col(ts_col).alias("ts"),
                F.col(tiebreak_col).alias("tb"),
                _event_char(F.col(type_col)).alias("ch"),
            ).alias("ev"),
        )
        .groupBy("key")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("ev")), lambda s: s["ch"]),
                "",
            ).alias("seq")
        )
    )


def encode_session_sequences(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_s: int = 21600,
) -> DataFrame:
    """(key, session_id, seq): per-SESSION journey strings — the
    whale-safe default.  Sessions are cut with the same lag-gap-cumsum
    the sessionize query uses (inactivity > ``gap_s`` seconds, default
    6 h, epoch-second arithmetic so any engine replays the boundaries
    exactly); within a session, chars are in (ts, tiebreak) order.

    Scale: one shuffle on the key serves the lag window, the running
    session counter, AND the per-session string agg (same partition
    key throughout); the string length is bounded by session size —
    per-user event counts never bound memory."""
    # project to the ALIASED key first and window on that same attribute:
    # a lag window on user_id followed by a running sum on its alias
    # would not be recognized as co-partitioned and would pay a second
    # Exchange (plan-gated single-shuffle in TestRound10Plans).  es
    # (epoch seconds as double) preserves the ts order exactly, so both
    # windows and the final agg ride one hashpartitioning(key).
    base = events.select(
        F.col(key_col).alias("key"),
        F.col(tiebreak_col).alias("tb"),
        F.col(ts_col).cast("double").alias("es"),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(tiebreak_col).alias("tb"),
            _event_char(F.col(type_col)).alias("ch"),
        ).alias("ev"),
    )
    lag_w = Window.partitionBy("key").orderBy("es", "tb")
    marked = base.withColumn("prev_es", F.lag("es").over(lag_w)).withColumn(
        "is_new",
        F.when(
            F.col("prev_es").isNull() | (F.col("es") - F.col("prev_es") > gap_s),
            1,
        ).otherwise(0),
    )
    run_w = (
        Window.partitionBy("key")
        .orderBy("es", "tb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = marked.withColumn(
        "session_id", F.sum("is_new").over(run_w).cast("bigint")
    )
    return sess.groupBy("key", "session_id").agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list("ev")), lambda s: s["ch"]),
            "",
        ).alias("seq")
    )


def pattern_features(seq: Column) -> list[Column]:
    """The driver query's pattern feature set over an encoded sequence:
    immediate view→click count, signup→view→click→purchase subsequence
    flag, error-burst count and longest error run."""
    bursts = F.regexp_extract_all(seq, F.lit("e+"), 0)
    return [
        F.length(seq).cast("bigint").alias("seq_len"),
        F.md5(seq).alias("seq_md5"),
        F.size(F.regexp_extract_all(seq, F.lit("vc"), 0))
        .cast("bigint")
        .alias("n_view_click"),
        F.when(seq.rlike("s.*v.*c.*p"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("funnel_complete"),
        F.size(bursts).cast("bigint").alias("n_error_bursts"),
        F.coalesce(
            F.array_max(F.transform(bursts, lambda b: F.length(b))), F.lit(0)
        )
        .cast("bigint")
        .alias("max_error_run"),
    ]
