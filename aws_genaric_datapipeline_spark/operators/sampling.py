"""Deterministic sampling operators for training-data pipelines.

Random `df.sample()` is non-reproducible across runs/partitionings (seeded
sampling is per-partition, so a repartition changes the selected rows).
Training-data curation needs *content-addressed* sampling: whether a row is
in the sample depends only on its key, so the same corpus always yields the
same sample regardless of cluster layout, and train/holdout splits never
leak when data is re-ingested.

The hash is Knuth's multiplicative scheme over the key — pure bigint
arithmetic, so it runs JVM-side inside WholeStageCodegen (no UDF) and is
reproducible in any engine (the DuckDB oracles use the identical
expression).

Reference parity: the reference has no sampling at all (SURVEY.md §2b);
this is north-star surface for the 100 TB curation use case.

Scale: a narrow map — no shuffle, no state; the filter is pushed into the
scan stage and composes with partition pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

# Knuth multiplicative hashing: h(k) = (k * A) mod 2^32 with A chosen so
# consecutive keys scatter across buckets.  Kept within bigint range:
# |key| * A must stay < 2^63 (fine for ids < ~3.4e9).
KNUTH_A = 2654435761
HASH_MOD = 4294967296  # 2^32
BUCKETS = 10000  # basis points: rate_bp=2500 → 25% sample


def hash_bucket(key: Column, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from a numeric key column.

    Both modulo steps use pmod: Spark's ``%`` keeps the dividend's sign, so a
    negative key would otherwise land in a negative bucket and silently pass
    every ``bucket < rate_bp`` filter.
    """
    return F.pmod(F.pmod(key.cast("bigint") * F.lit(KNUTH_A), F.lit(HASH_MOD)), F.lit(buckets))


def deterministic_sample(df: DataFrame, key_col: str, rate_bp: int) -> DataFrame:
    """Keep rows whose hash-bucket falls below ``rate_bp`` basis points.

    rate_bp=2500 keeps ~25% of rows — exactly the same rows on every run,
    every partitioning, every engine.
    """
    return df.where(hash_bucket(F.col(key_col)) < F.lit(rate_bp))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates_bp: dict[str, int],
    default_bp: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant languages
    harder than rare ones — the standard corpus-rebalancing move).

    ``rates_bp`` maps stratum value → basis points kept; unlisted strata get
    ``default_bp``.  Unlike ``df.sampleBy``, the selection is content-
    addressed: stable across runs and partitionings.
    """
    rate = F.lit(default_bp)
    for value, bp in rates_bp.items():
        rate = F.when(F.col(strata_col) == value, F.lit(bp)).otherwise(rate)
    return df.where(hash_bucket(F.col(key_col)) < rate)


def train_holdout_split(
    df: DataFrame, key_col: str, holdout_bp: int = 1000
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, reproducible train/holdout split by key hash.

    The same key always lands on the same side — re-ingesting or re-scaling
    the corpus can never leak holdout rows into train.
    """
    b = hash_bucket(F.col(key_col))
    return df.where(b >= F.lit(holdout_bp)), df.where(b < F.lit(holdout_bp))
