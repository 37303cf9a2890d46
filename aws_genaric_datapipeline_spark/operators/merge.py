"""Upsert (MERGE) and slowly-changing-dimension operators.

The reference's state table does upsert-by-key via DynamoDB ``put_item``
(raw_layer_job.py:177-210) — one row at a time, driver-side.  These are the
distributed equivalents for data-plane tables: MERGE semantics without
requiring a transactional table format, and SCD Type-2 interval building
for dimension history.

Scale notes:
- ``merge_upsert`` is one shuffle on the merge key (the window); with both
  sides bucketed on the key (operators/bucketing.py) the exchange
  disappears.  Against a partitioned target table, pair it with dynamic
  partition overwrite (sources/writers.py) so only touched partitions
  rewrite.
- ``scd2_collapse`` is the gaps-and-islands shape: two windows over the
  same (key, ts) ordering — Catalyst plans a single sort/exchange reused by
  both, then a partial-merge-friendly aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

_PRIORITY = "__merge_priority"
_RN = "__merge_rn"


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Whole-row MERGE: for each key, the source row wins if present,
    otherwise the target row is kept; source rows with no target match are
    inserted.  Schemas must be union-compatible by name.

    ``order_cols`` breaks ties deterministically (descending) when a side
    holds multiple rows per key; without it each side MUST be unique per key
    (standard MERGE errors on multiple source matches — here the survivor
    would be partitioning-dependent).

    Implemented as a priority union + one row_number per key — a single
    shuffle, versus a full-outer join's two, and the window sort is
    reused if downstream consumers need key ordering.
    """
    tagged = target.withColumn(_PRIORITY, F.lit(0)).unionByName(
        source.withColumn(_PRIORITY, F.lit(1))
    )
    tiebreak = [F.desc(c) for c in (order_cols or [])]
    w = Window.partitionBy(*keys).orderBy(F.desc(_PRIORITY), *tiebreak)
    return (
        tagged.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .drop(_PRIORITY, _RN)
    )


def scd2_collapse(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse a change log into SCD Type-2 validity intervals: consecutive
    rows per key with the same ``attr`` value become one interval with
    ``valid_from`` / ``valid_to`` (NULL = current) and the run's row count.

    Gaps-and-islands: flag attribute changes with lag(), integrate the flags
    into run ids with a running sum, aggregate each run, then lead() the
    next run's start as this run's end.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w_seq = Window.partitionBy(key).orderBy(*order)
    changed = (~F.lag(F.col(attr)).over(w_seq).eqNullSafe(F.col(attr))).cast("int")
    runs = df.withColumn("__grp", F.sum(changed).over(w_seq))
    islands = runs.groupBy(key, attr, "__grp").agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    w_iv = Window.partitionBy(key).orderBy("valid_from")
    return islands.select(
        key,
        attr,
        "valid_from",
        F.lead("valid_from").over(w_iv).alias("valid_to"),
        "n_rows",
    )


def cdc_apply(
    base: DataFrame,
    changelog: DataFrame,
    keys: list[str],
    op_col: str = "op",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a CDC changelog (upserts + delete tombstones) to a base table.

    ``changelog`` rows carry ``op_col`` ∈ {'U','D'} (upsert / delete) and a
    deterministic ordering (``order_cols``, e.g. [ts, seq]).  Per key, the
    LATEST changelog row decides: 'U' replaces the base row with the
    changelog payload, 'D' removes the key; keys untouched by the changelog
    pass through.  This is MERGE WHEN MATCHED DELETE/UPDATE WHEN NOT
    MATCHED INSERT — without needing a transactional table format.

    Scale: one shuffle on the key for the latest-wins window over the
    changelog (usually tiny next to the base), one shuffle for the
    outer join against base; with base bucketed on the key
    (operators/bucketing.py) the base side never reshuffles, and with a
    partitioned base + dynamic partition overwrite only touched partitions
    rewrite.
    """
    order_cols = order_cols or ["ts"]
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
    latest = (
        changelog.withColumn(_RN, F.row_number().over(w))
        .where(F.col(_RN) == 1)
        .drop(_RN)
    )
    payload = [c for c in base.columns if c not in keys]
    # keys touched by the changelog leave the base either way ('D' ends
    # there; 'U' re-enters with the changelog payload) — so the result is
    # untouched-base ∪ latest-upserts, with no separate delete pass.
    upserts = latest.where(F.col(op_col) != "D").select(*keys, *payload)
    kept = base.join(latest.select(*keys), keys, "left_anti")
    return kept.unionByName(upserts)
