"""Similarity search over embedding columns (array<float>).

Two tiers, per SURVEY.md §2b / the north-star spec:

- ``cosine_topk``      — exact brute-force top-k (the baseline/oracle path).
- ``lsh_bucketed_topk``— random-hyperplane LSH candidate generation, exact
                         re-rank within buckets (the 100 TB path).
- ``cosine_near_pairs``— embedding near-duplicate pairs above a threshold.

All vector math is JVM-side (`zip_with`/`aggregate` higher-order functions):
dot products and norms never leave Tungsten, no Python in the loop.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _dbl(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i via zip_with + aggregate (JVM, no UDF)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (0 when either norm is 0)."""
    n = norm(a) * norm(b)
    return F.when(n == 0, F.lit(0.0)).otherwise(dot(a, b) / n)


def with_unit_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pre-normalize embeddings to unit length (cosine → plain dot product).

    At scale, normalize ONCE at ingest and store the unit vector + norm;
    every downstream similarity op then skips the per-pair norm work.
    """
    v = _dbl(F.col(vec_col))
    n = norm(v)
    unit = F.when(n == 0, v).otherwise(F.transform(v, lambda x: x / n))
    return df.withColumn("unit_vec", unit)


def cosine_topk(
    df: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for the given query ids (brute force).

    The query side is tiny → broadcast; the corpus side streams through one
    pass computing dot products against each query.  O(|Q|·N·d) flops with
    no shuffle of the corpus; the only shuffle is the per-query top-k window
    over |Q|·N score rows (use k-heaps via window row_number).
    """
    base = with_unit_vectors(df, vec_col).select(
        F.col(id_col).alias("nid"), F.col("unit_vec").alias("nvec")
    )
    queries = base.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"), F.col("nvec").alias("qvec")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(base)
        .where(F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(dot(F.col("qvec"), F.col("nvec")), 4).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane via a splitmix64-style integer
    mix — reproducible across runs/engines with no RNG state."""
    out = []
    for d in range(dim):
        z = (plane_idx * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) % (1 << 64)
        z = (z ^ (z >> 31)) * 0xD6E8FEB86659FD93 % (1 << 64)
        z = z ^ (z >> 32)
        out.append(((z % 2000003) / 1000001.0) - 1.0)  # ≈ uniform [-1, 1]
    return out


def lsh_bucket(vec: Column, dim: int, num_planes: int = 8, table: int = 0) -> Column:
    """Random-hyperplane LSH bucket id: bit i = sign(v·h_i).  Vectors with
    high cosine land in the same bucket with prob (1 - θ/π)^num_planes.
    ``table`` offsets the hyperplane family for OR-amplification."""
    bucket = F.lit(0).cast("bigint")
    for p in range(num_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, table * num_planes + p)])
        bit = (dot(vec, plane) > 0).cast("bigint")
        bucket = bucket + bit * F.lit(2**p).cast("bigint")
    return bucket


def lsh_bucketed_topk(
    df: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    num_planes: int = 6,
    num_tables: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH buckets,
    exact cosine re-rank on the candidate union.

    AND-OR amplification: within a table, all ``num_planes`` sign bits must
    match (AND, prob p^b per pair, p = 1-θ/π); across ``num_tables``
    independent hyperplane families any one match suffices (OR,
    1-(1-p^b)^L).  The corpus-wide crossJoin of cosine_topk becomes an
    equi-join on (table, bucket) — per-table candidate count drops
    ~2^num_planes-fold; tune (b, L) for the recall/cost point.
    """
    base = with_unit_vectors(df, vec_col).select(
        F.col(id_col).alias("nid"),
        F.col("unit_vec").alias("nvec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        lsh_bucket(F.col("unit_vec"), dim, num_planes, table=t).alias("bucket"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("tb"),
    ).select("nid", "nvec", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    queries = base.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"), F.col("nvec").alias("qvec"), "tbl", "bucket"
    )
    scored = (
        F.broadcast(queries)
        .join(base, ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(dot(F.col("qvec"), F.col("nvec")), 4).alias("cosine_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


def cosine_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-duplicate pairs: all (a<b) with cosine ≥ threshold.

    Brute-force O(N²/2) pair scan — the oracle-checkable baseline.  At scale
    swap the crossJoin for the LSH bucket equi-join (same re-rank).
    """
    base = with_unit_vectors(df, vec_col).select(
        F.col(id_col).alias("vid"), F.col("unit_vec").alias("uvec")
    )
    a = base.select(F.col("vid").alias("id_a"), F.col("uvec").alias("vec_a"))
    b = base.select(F.col("vid").alias("id_b"), F.col("uvec").alias("vec_b"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(dot(F.col("vec_a"), F.col("vec_b")), 4).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )
