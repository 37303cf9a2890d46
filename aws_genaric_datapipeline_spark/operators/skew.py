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
