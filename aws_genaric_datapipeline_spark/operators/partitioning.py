"""Partitioning guards for CPU-dense operators.

A scan's partition count is set by the source layout (file count × row-group
splits), not by how much compute each row needs downstream.  When the input
is a few large unsplittable files (single-row-group parquet, gzip text, one
JDBC partition), every per-row-heavy stage — shingling, 16-way min-hashing,
vector dot products, Arrow-batched decoding — inherits that near-serial
partitioning and runs on a fraction of the cluster.

``ensure_parallelism`` is the standard fix: pay one narrow-ish shuffle of the
(projected) input to spread rows across the cluster before the expensive
stage.  Cheap relational pipelines should NOT do this — their scan-stage
work is trivial and the extra exchange would only add latency; it belongs
in front of compute-bound operators only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the session's default parallelism (or an
    explicit floor) if its current partitioning is coarser.  No-op when the
    source already provides enough splits."""
    if df.isStreaming:
        # Streaming plans cannot inspect .rdd (no materialized partitions
        # outside a micro-batch) and get their parallelism from the
        # source/shuffle configuration; pass through so batch operators
        # compose into streaming pipelines unchanged.
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
