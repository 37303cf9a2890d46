"""Incremental materialized-view maintenance for distributive aggregates.

The warehouse pattern behind every "refresh the dashboard table without
rescanning history" job: a materialized aggregate over keys K with
DISTRIBUTIVE measures (count, sum — and anything algebraic over them:
avg = sum/count) can absorb a delta batch by aggregating JUST the delta
and merging partial states, because

    agg(base ∪ delta) = merge(agg(base), agg(delta))

is exactly Spark's own partial/final aggregation contract lifted to the
storage layer.  Refresh cost tracks the delta, not the corpus — at
100 TB of history and a 10 GB daily batch this is the difference between
a 4-minute and a 10-hour refresh.

Non-distributive measures (exact distinct, exact percentile) do NOT
merge this way; they need a sketch state (HLL registers, histogram
bins — see operators/sketches.py) or a recompute.  The operator keeps
to count/sum columns so the identity is exact, and the driver query's
oracle verifies refresh-equals-full-recompute on real data.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def agg_state(
    df: DataFrame, keys: tuple[str, ...], sum_cols: tuple[str, ...]
) -> DataFrame:
    """Aggregate ``df`` into a mergeable state frame: per key group, a
    row count ``cnt`` plus ``sum_<c>`` for each measure column."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )


def merge_agg_states(
    mv: DataFrame, delta: DataFrame, keys: tuple[str, ...]
) -> DataFrame:
    """Merge two state frames of identical shape (see agg_state): union
    then re-sum — cell-wise addition per key, the same merge the
    count-min grid and histogram sketch use.  New keys appear, existing
    keys accumulate; the result is again a valid state frame, so
    refreshes chain indefinitely."""
    measures = [c for c in mv.columns if c not in keys]
    return (
        mv.unionByName(delta)
        .groupBy(*keys)
        .agg(*[F.sum(c).alias(c) for c in measures])
    )
