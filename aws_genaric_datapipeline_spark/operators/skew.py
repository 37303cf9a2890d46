"""Skew mitigation for joins and aggregations.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on by
default in session.py) handles most skew at runtime by splitting oversized
partitions.  Salting is the explicit fallback for the cases AQE can't fix —
e.g. a single hot key driving one reducer, or skewed aggregation state:

- ``salted_join``: replicate the small side ``salt`` times, scatter the big
  side's hot keys across ``salt`` sub-keys, join on (key, salt), drop the
  salt.  Result is identical to the plain join; the hot key's work spreads
  over ``salt`` tasks.
- ``two_phase_agg``: pre-aggregate on (key, salt) then re-aggregate on key —
  bounds per-task state for skewed group-bys (only needed for non-algebraic
  aggregates; sums/counts already combine map-side).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed big side to a small side with salt-fanned keys.

    The small side is replicated ``salt``× via explode (fine: it's small by
    precondition); each big-side row picks a deterministic pseudo-random
    salt from its whole row hash.  Equivalent to
    ``big.join(small, big[big_key] == small[small_key], how)`` for inner and
    left joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (right/full would drop salted rows)")
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    big_s = big.withColumn("_salt", salt_col)
    small_s = small.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = big_s.join(
        small_s,
        (F.col(big_key) == F.col(small_key)) & (big_s["_salt"] == small_s["_salt"]),
        how,
    )
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt: int = 16,
) -> DataFrame:
    """Skew-safe distinct-ish aggregation: count + sum per key via a salted
    pre-aggregation.  Algebraic example; extend with the same shape for
    heavy collect_set/percentile state."""
    pre = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(salt)))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_c"), F.sum(value).alias("_s"))
    )
    return pre.groupBy(key).agg(
        F.sum("_c").alias("cnt"), F.sum("_s").alias("total")
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int = 20, min_count: int | None = None
) -> DataFrame:
    """Frequent items (heavy hitters) with exact counts in two passes:

    1. Per-partition Misra-Gries sketch with k counters (mapInPandas —
       constant memory per task regardless of partition size).  Averaging
       argument: any value with global frequency > N/(k+1) must exceed
       n_p/(k+1) in at least one partition, so it survives at least one
       partition's sketch — no false negatives for true heavy hitters.
    2. Exact count of the candidate values only (semi-join + groupBy over
       a candidate set bounded by k x partitions, not by cardinality).

    Returns (value, exact_count) for candidates with exact_count >=
    ``min_count`` (default N/(k+1), the MG guarantee threshold).  This is
    also the skew-detection primitive: run it on a join key to find the
    keys that need salting (operators/skew.py salted_join).
    """
    import pandas as pd

    def mg_sketch(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame({col: list(counters.keys())})

    field = df.schema[col]
    cand = (
        df.select(col)
        .mapInPandas(mg_sketch, schema=f"{col} {field.dataType.simpleString()}")
        .distinct()
    )
    counted = (
        df.join(F.broadcast(cand), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    if min_count is not None:
        return counted.where(F.col("exact_count") >= min_count)
    total = df.count()  # driver-side scalar; one lightweight count action
    return counted.where(F.col("exact_count") > total / (k + 1))
