"""Similarity search over embedding columns (array<float>).

Tiers, per SURVEY.md §2b / the north-star spec:

- ``cosine_topk``      — exact brute-force top-k (the baseline/oracle path).
- ``lsh_bucketed_topk``— random-hyperplane LSH candidate generation, exact
                         re-rank within buckets.
- ``cosine_near_pairs``— embedding near-duplicate pairs above a threshold
                         (keys-only LSH candidate shuffle).
- ``ivf_topk`` / ``ivf_build_index`` / ``ivf_query_index`` — inverted-file
                         ANN: trained coarse cells, partition-pruned probes.
- ``pq_*`` / ``ivfpq_topk`` — product quantization (per-subspace codebooks,
                         ADC scoring, ~64× compression) and the composed
                         IVF-PQ production recipe.

Relational math is JVM-side (`zip_with`/`aggregate` higher-order
functions); the dense batch kernels (bucketing, cell assignment, PQ
encode/ADC) are Arrow-batched numpy closures — the one place pandas UDFs
beat built-in expressions, each justified in its docstring.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from aws_genaric_datapipeline_spark.operators.partitioning import ensure_parallelism


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
    return ensure_parallelism(df).withColumn("unit_vec", unit)


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


def hard_negatives(
    df: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor, the
    k most-similar vectors carrying a DIFFERENT label — the negatives that
    sit closest to the decision boundary, which is exactly what embedding
    / reranker training wants batched against each anchor.

    Plan shape = cosine_topk plus the label-inequality predicate pushed
    into the broadcast-join filter: anchors broadcast, the corpus streams
    through one scan, and the only shuffle is the per-anchor top-k window.
    For ALL-anchor mining at 100 TB, run the same predicate through the
    persisted ANN index (ivf_query_index with post-filter) instead of the
    brute-force scan — this operator is the exact baseline that path is
    measured against."""
    base = with_unit_vectors(df, vec_col).select(
        F.col(id_col).alias("nid"),
        F.col(label_col).alias("nlabel"),
        F.col("unit_vec").alias("nvec"),
    )
    anchors = base.where(F.col("nid").isin(query_ids)).select(
        F.col("nid").alias("query_id"),
        F.col("nlabel").alias("query_label"),
        F.col("nvec").alias("qvec"),
    )
    scored = (
        F.broadcast(anchors)
        .crossJoin(base)
        .where(F.col("query_label") != F.col("nlabel"))
        .select(
            "query_id",
            "query_label",
            F.col("nid").alias("neighbor_id"),
            F.col("nlabel").alias("neighbor_label"),
            F.round(dot(F.col("qvec"), F.col("nvec")), 4).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


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
    ``table`` offsets the hyperplane family for OR-amplification.

    The plane is sliced to the vector's length: zip_with pads the shorter
    array with nulls, which would null the whole bucket for vectors shorter
    than ``dim`` (unused trailing plane dimensions are harmless)."""
    n = F.least(F.size(vec), F.lit(dim))
    bucket = F.lit(0).cast("bigint")
    for p in range(num_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, table * num_planes + p)])
        bit = (dot(F.slice(vec, 1, n), F.slice(plane, 1, n)) > 0).cast("bigint")
        bucket = bucket + bit * F.lit(2**p).cast("bigint")
    return bucket


def _lsh_buckets_udf(dim: int, num_planes: int, num_tables: int, stride: int | None = None):
    """Arrow-vectorized twin of lsh_bucket: per row, the bucket id in EVERY
    table at once — one numpy matmul per batch against the (tables×planes)
    hyperplane matrix, instead of tables×planes interpreted zip_with/
    aggregate lambdas per row.  Bit-compatible with lsh_bucket (same
    hyperplanes, same `> 0` sign convention, same short-vector slicing).

    ``stride`` fixes the hyperplane-family allocation per table (plane p of
    table t is global plane t·stride + p) independently of how many planes
    are USED.  The corpus-adaptive path passes stride=LSH_MAX_PLANES so a
    derived num_planes changes only how many of table t's fixed planes
    contribute bits — the plane literals themselves stay constant and thus
    SQL-replayable (the oracle inlines the same splitmix64 constants).
    Default (None) keeps the legacy dense allocation t·num_planes + p used
    by the pinned-parameter queries."""
    import numpy as np
    import pandas as pd

    stride = num_planes if stride is None else stride
    pm = np.array(
        [_hyperplane(dim, t * stride + p) for t in range(num_tables) for p in range(num_planes)],
        dtype=np.float64,
    )  # (tables·planes) × dim
    weights = (1 << np.arange(num_planes)).astype(np.int64)

    def _buckets(v):
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        d = min(mat.shape[1], dim)
        proj = mat[:, :d] @ pm[:, :d].T
        bits = (proj > 0).astype(np.int64).reshape(len(mat), num_tables, num_planes)
        buckets = (bits * weights).sum(axis=2)
        return pd.Series(list(buckets))

    return F.pandas_udf(_buckets, "array<bigint>")


def lsh_bucketed_topk(
    df: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    num_planes: int = 6,
    num_tables: int = 8,
    target_bucket_size: int | None = None,
    corpus_count: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH buckets,
    exact cosine re-rank on the candidate union.

    AND-OR amplification: within a table, all ``num_planes`` sign bits must
    match (AND, prob p^b per pair, p = 1-θ/π); across ``num_tables``
    independent hyperplane families any one match suffices (OR,
    1-(1-p^b)^L).  The corpus-wide crossJoin of cosine_topk becomes an
    equi-join on (table, bucket) — per-table candidate count drops
    ~2^num_planes-fold; tune (b, L) for the recall/cost point.

    ``target_bucket_size`` switches on corpus-adaptive plane sizing (same
    contract as cosine_near_pairs: count-derived planes at the fixed
    LSH_MAX_PLANES stride), keeping per-query candidate counts
    ~num_tables·target_bucket_size at ANY corpus size instead of growing
    as N/2^planes.
    """
    stride = None
    if target_bucket_size is not None:
        n = corpus_count if corpus_count is not None else df.count()
        num_planes = adaptive_num_planes(n, target_bucket_size)
        stride = LSH_MAX_PLANES
    buckets = _lsh_buckets_udf(dim, num_planes, num_tables, stride=stride)
    base = with_unit_vectors(df, vec_col).select(
        F.col(id_col).alias("nid"),
        F.col("unit_vec").alias("nvec"),
        F.posexplode(buckets(F.col("unit_vec"))).alias("tbl", "bucket"),
    )
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


def ivf_train_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 16,
    iters: int = 1,
) -> DataFrame:
    """Train IVF cell centroids: deterministic seeding + Lloyd iterations.

    Seeds are the ``num_cells`` corpus vectors with the smallest Knuth
    multiplicative scramble of their id — ((id mod 2^31)·2654435761)
    mod 2^32, ties broken by id.  Reproducible with no RNG state AND
    expressible in plain integer SQL (unlike the earlier xxhash64 pick),
    which is what lets the sim_ivf_* oracles replay the entire training
    pass in DuckDB.  The inner product stays below 2^63 by reducing the id
    mod 2^31 first, so ANSI-mode bigint arithmetic never overflows at any
    id scale.  Each Lloyd step is one
    distributed pass over the corpus: assign every vector to its max-dot
    cell (vectorized, see _assign_cells), then recompute each cell's mean
    vector with one applyInPandas per cell — a single shuffle keyed by
    cell_id carrying the unit vectors, numpy mean inside the Arrow batch.

    Each iteration's centroids are collected to the driver and re-seeded as
    a literal DataFrame: centroids are driver-sized BY CONSTRUCTION, and
    materializing them (a) caps lineage depth — a lazy loop would nest every
    iteration's full corpus pass inside the next, recomputing pass 1 under
    pass N — and (b) lets every downstream consumer (corpus assignment,
    query probing) reuse the trained values without replaying training.
    This is the standard iterative-refinement pattern (MLlib k-means does
    the same with its cost-function loop).

    Returns (cell_id:int, cvec:array<double>) with unit-normalized cvec.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    base = _unit_vectors_np(df, id_col, vec_col)
    # Seed from RAW vectors (hash-ordered TakeOrdered, pure JVM — no reason
    # to run the normalization UDF over the whole corpus just to pick
    # num_cells rows); normalize the handful driver-side.
    scramble = F.pmod(
        F.pmod(F.col(id_col).cast("bigint"), F.lit(2147483648)) * F.lit(2654435761),
        F.lit(4294967296),
    )
    seeds = (
        df.select(F.col(vec_col).alias("v"), F.col(id_col).alias("sid"))
        .orderBy(scramble, F.col("sid"))
        .limit(num_cells)
        .collect()
    )
    seed_vecs = []
    for r in seeds:
        v = np.asarray(list(r["v"]), dtype=np.float64)
        n = np.linalg.norm(v)
        seed_vecs.append((v / n if n > 0 else v).tolist())
    centroids = spark.createDataFrame(
        list(enumerate(seed_vecs)), "cell_id int, cvec array<double>"
    )

    def _cell_mean(pdf: "pd.DataFrame") -> "pd.DataFrame":
        mean = np.vstack(pdf["uvec"].to_numpy()).mean(axis=0)
        n = np.linalg.norm(mean)
        if n > 0:
            mean = mean / n
        return pd.DataFrame({"cell_id": [int(pdf["cell_id"].iloc[0])], "cvec": [mean.tolist()]})

    for _ in range(iters):
        assigned = _assign_cells(base, centroids)
        rows = (
            assigned.groupBy("cell_id")
            .applyInPandas(_cell_mean, "cell_id int, cvec array<double>")
            .collect()
        )
        centroids = spark.createDataFrame(
            [(r["cell_id"], list(r["cvec"])) for r in rows], "cell_id int, cvec array<double>"
        )
    return centroids


def _unit_vectors_np(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(vid, uvec) with numpy-normalized unit vectors — the vectorized twin
    of with_unit_vectors for the IVF path, where every corpus pass would
    otherwise pay the interpreted higher-order-function normalization."""
    import numpy as np
    import pandas as pd

    def _norm(v):
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        np.divide(mat, norms, out=mat, where=norms > 0)
        return pd.Series(list(mat))

    unit = F.pandas_udf(_norm, "array<double>")
    # Deliberately NO ensure_parallelism here: the numpy kernels behind the
    # IVF/PQ tiers are batch-matmuls that finish in milliseconds at fixture
    # scale, and a repartition of the wide vector column costs more than
    # the extra task slots recover (measured 2-3x slower across all four
    # ANN bench entries with the repartition in).  At cluster scale the
    # parquet source already supplies many splits.
    return df.select(F.col(id_col).alias("vid"), unit(F.col(vec_col)).alias("uvec"))


def _pair_dot() -> "F.Column":
    """Arrow-vectorized dot product over (qvec, nvec) pair columns."""
    import numpy as np
    import pandas as pd

    def _dotp(a, b):
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        ma = np.vstack(a.to_numpy())
        mb = np.vstack(b.to_numpy())
        return pd.Series(np.einsum("ij,ij->i", ma, mb))

    return F.pandas_udf(_dotp, "double")


def _assign_cells(
    base: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    ranked: bool = False,
) -> DataFrame:
    """Attach the ``nprobe`` max-dot cell ids to every row of ``base``
    (columns vid, uvec) — no shuffle, one map pass over the corpus.

    The centroid matrix rides into an Arrow-vectorized pandas UDF as a
    closure (it is driver-sized by construction), and scoring is one numpy
    matmul per Arrow batch.  Dense fixed-dimension vector math is the one
    place pandas UDFs beat built-in expressions: Catalyst evaluates
    higher-order-function lambdas interpreted per element (~100x slower
    than the BLAS loop), while the relational paths around it stay JVM.
    Ties broken toward the lower cell_id (stable argsort), deterministic.
    """
    import numpy as np
    import pandas as pd

    rows = sorted((r["cell_id"], r["cvec"]) for r in centroids.collect())
    cell_ids = np.array([cid for cid, _ in rows], dtype=np.int32)
    cmat = np.array([vec for _, vec in rows], dtype=np.float64)  # cells × dim
    n = min(nprobe, len(rows))

    def _topn(v):
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack(v.to_numpy())  # batch × dim
        scores = mat @ cmat.T  # batch × cells
        idx = np.argsort(-scores, axis=1, kind="stable")[:, :n]
        return pd.Series([cell_ids[r].tolist() for r in idx])

    # explicit form, not type-hint inference: `from __future__ import
    # annotations` stringifies hints, which the udf resolver can't evaluate
    # against function-local imports
    topn_cells = F.pandas_udf(_topn, "array<int>")

    if ranked:
        # posexplode keeps each cell's position in the ordered probe list
        # (r = 1-based rank).  Because the argsort is stable, rank <= p is
        # EXACTLY the nprobe=p assignment — the tuning sweep probes once
        # at pmax and filters per tier.
        return base.select(
            "vid",
            "uvec",
            F.posexplode(topn_cells(F.col("uvec"))).alias("pos0", "cell_id"),
        ).select("vid", "uvec", "cell_id", (F.col("pos0") + 1).alias("r"))
    return base.select("vid", "uvec", F.explode(topn_cells(F.col("uvec"))).alias("cell_id"))


def ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 4,
    iters: int = 1,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: corpus vectors
    are bucketed by nearest trained centroid; each query probes its
    ``nprobe`` nearest cells and exact-re-ranks only those candidates.

    The 100 TB shape: candidate generation is an equi-join on cell_id (a
    shuffle of ~nprobe/num_cells of the corpus instead of a full crossJoin),
    and the cell assignment is computed in one broadcast pass.  At real
    scale, persist the assignment (partitionBy cell_id) at ingest so queries
    read only the probed cells' partitions — partition pruning on parquet.
    """
    base = _unit_vectors_np(df, id_col, vec_col)
    centroids = ivf_train_centroids(df, id_col, vec_col, num_cells, iters)
    corpus = _assign_cells(base, centroids, nprobe=1).select(
        F.col("vid").alias("nid"), F.col("uvec").alias("nvec"), "cell_id"
    )
    queries = _assign_cells(base.where(F.col("vid").isin(query_ids)), centroids, nprobe=nprobe).select(
        F.col("vid").alias("query_id"), F.col("uvec").alias("qvec"), "cell_id"
    )
    scored = (
        F.broadcast(queries)
        .join(corpus, "cell_id")
        .where(F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(_pair_dot()(F.col("qvec"), F.col("nvec")), 4).alias("cosine_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


# Fixed hyperplane-allocation stride (and plane-count ceiling) for the
# corpus-adaptive LSH family: table t owns global planes [t·8, t·8+8) forever,
# an adaptive num_planes just uses the first np of them.
LSH_MAX_PLANES = 8


def adaptive_num_planes(
    corpus_count: int,
    target_bucket_size: int = 64,
    min_planes: int = 3,
    max_planes: int = LSH_MAX_PLANES,
) -> int:
    """Size the hyperplane count from the corpus: planes = clamp(
    ceil(log2(N / target_bucket_size)), min, max) — 2^planes buckets per
    table puts the EXPECTED bucket width at ~target_bucket_size, so the
    per-bucket self-join emits ~N·target/2 candidate rows per table:
    O(N·bucket_size), linear in N, instead of the O(N²/2^planes) a FIXED
    plane count degrades to as the corpus grows (the round-6 scale gap:
    8 buckets/table is fine at 2k vectors and quadratic death at 200M).

    Recall tradeoff is inherent to LSH: each extra plane multiplies
    per-table collision probability by p = 1-θ/π, so tables must grow like
    1/p^planes to hold recall at a loose threshold; at near-duplicate
    thresholds (≥0.9, p ≥ 0.85) the decay is mild and the default table
    counts keep recall >0.95 across the clamp range.  Deterministic —
    pure integer function of the count — hence replayable in the DuckDB
    oracle as the same formula over COUNT(*).
    """
    import math

    n = max(int(corpus_count), 1)
    raw = math.ceil(math.log2(n / float(target_bucket_size)))
    return max(min_planes, min(max_planes, raw))


def adaptive_num_cells(
    corpus_count: int, min_cells: int = 4, max_cells: int = 1 << 18
) -> int:
    """Size the IVF coarse quantizer from the corpus: cells = clamp to
    [min, max] of the power of two nearest √N — the standard FAISS sizing
    (cells ≈ √N balances the two scan legs: queries probe
    nprobe·N/cells candidates after a cells-sized centroid argmax, and
    √N minimizes cells + N/cells).  A FIXED cell count has the same
    failure mode the fixed LSH plane count had: at 1000× vectors each
    cell holds 1000× more, and probe cost grows linearly with the corpus
    instead of with √N.  Deterministic integer function of the count —
    usable at build time (ivf_build_index/ivfpq_build_index take the
    result as num_cells) without touching query-side replayability, since
    the trained centroids are persisted with the index."""
    import math

    n = max(int(corpus_count), 1)
    cells = 1 << round(math.log2(math.sqrt(n))) if n > 1 else min_cells
    return max(min_cells, min(max_cells, cells))


def lsh_candidate_pairs(
    base: DataFrame,
    num_planes: int,
    num_tables: int,
    dim: int = 64,
    stride: int | None = None,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """LSH candidate (id_a < id_b) pairs from a (vid, uvec) frame — the
    keys-only candidate stage shared by cosine_near_pairs and the
    adaptive-sizing tests.  The shuffle carries (tbl, bucket, vid) rows
    only; vectors never ride through the self-join.

    ``max_bucket_width`` drops (table, bucket) groups wider than the cap
    before the self-join — the embedding-side analog of MinHash's
    max_band_width band guard: a degenerate bucket (hash skew, a mega
    boilerplate cluster, an adversarial corpus) would otherwise emit
    O(width²) rows.  Dropping is sound for CANDIDATE generation (recall
    only: a pair sharing a dropped bucket can still collide in another
    table) and keeps worst-case per-bucket cost bounded by cap²/2.
    """
    buckets = _lsh_buckets_udf(dim, num_planes, num_tables, stride=stride)
    bucketed = base.select(
        "vid", F.posexplode(buckets(F.col("uvec"))).alias("tbl", "bucket")
    )
    if max_bucket_width is not None:
        narrow = (
            bucketed.groupBy("tbl", "bucket")
            .agg(F.count(F.lit(1)).alias("bw"))
            .where(F.col("bw") <= max_bucket_width)
            .select("tbl", "bucket")
        )
        bucketed = bucketed.join(narrow, ["tbl", "bucket"], "left_semi")
    a = bucketed.select(F.col("vid").alias("id_a"), "tbl", "bucket")
    b = bucketed.select(F.col("vid").alias("id_b"), "tbl", "bucket")
    return (
        a.join(b, ["tbl", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )


def cosine_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    exact: bool = False,
    dim: int = 64,
    num_planes: int = 5,
    num_tables: int = 10,
    target_bucket_size: int | None = None,
    corpus_count: int | None = None,
    max_bucket_width: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs: all (a<b) with cosine ≥ threshold.

    Default path: random-hyperplane LSH candidate generation (self
    equi-join on (table, bucket) — the only shuffle carries ids + 64-bit
    bucket keys), then exact cosine verification of candidates only.  Pair
    recall ≈ 1-(1-p^b)^L with p = 1-θ/π — at near-duplicate thresholds
    (≥0.9) the defaults give >0.999; at loose thresholds LSH misses pairs,
    so thresholds well below ~0.8 belong on ``exact=True``.

    ``exact=True``: brute-force O(N²/2) corpus×corpus crossJoin — the
    oracle-checkable tier; would not survive corpus×corpus at 100 TB.

    ``target_bucket_size`` switches on CORPUS-ADAPTIVE plane sizing:
    num_planes is derived as adaptive_num_planes(N, target_bucket_size)
    with N = ``corpus_count`` if given (pass the known table cardinality to
    skip the count job) else one metadata-cheap df.count().  Adaptive mode
    allocates hyperplanes at the fixed LSH_MAX_PLANES stride so the plane
    literals per table never depend on the derived count — the oracle
    replays the identical family and derives the same count from COUNT(*).
    ``max_bucket_width`` (either mode) is the skew guard — see
    lsh_candidate_pairs.
    """
    base = with_unit_vectors(df, vec_col).select(
        F.col(id_col).alias("vid"), F.col("unit_vec").alias("uvec")
    )
    if exact:
        a = base.select(F.col("vid").alias("id_a"), F.col("uvec").alias("vec_a"))
        b = base.select(F.col("vid").alias("id_b"), F.col("uvec").alias("vec_b"))
        scored = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        # Candidate generation shuffles KEYS ONLY: (tbl, bucket, vid).  The
        # unit vectors (dim doubles ≈ 0.5 KB each) must not ride through the
        # per-bucket self-join or the pair dedup — a bucket of m vectors
        # emits O(m²) candidate rows per table, and carrying both vectors
        # widens that shuffle ~40× (measured 12→2 s on the sf0.1 semantic-
        # dedup edge build).  Vectors re-enter AFTER dedup, via two joins
        # against the corpus-sized base frame, one row per verified pair.
        stride = None
        if target_bucket_size is not None:
            n = corpus_count if corpus_count is not None else df.count()
            num_planes = adaptive_num_planes(n, target_bucket_size)
            stride = LSH_MAX_PLANES
        cand = lsh_candidate_pairs(
            base,
            num_planes,
            num_tables,
            dim=dim,
            stride=stride,
            max_bucket_width=max_bucket_width,
        )
        scored = cand.join(
            base.select(F.col("vid").alias("id_a"), F.col("uvec").alias("vec_a")),
            "id_a",
        ).join(
            base.select(F.col("vid").alias("id_b"), F.col("uvec").alias("vec_b")),
            "id_b",
        )
    return scored.select(
        "id_a",
        "id_b",
        F.round(dot(F.col("vec_a"), F.col("vec_b")), 4).alias("cosine_sim"),
    ).where(F.col("cosine_sim") >= threshold)


# ------------------------------------------------------ persisted IVF index
def ivf_build_index(
    df: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 16,
    iters: int = 1,
) -> None:
    """Build and persist an IVF index: trained centroids + the corpus
    partitioned BY CELL on disk.  This is the amortized half of IVF — at
    100 TB the index is built once at ingest; every query then reads only
    its probed cells' partitions (real parquet partition pruning), instead
    of re-training and re-assigning per query (what ivf_topk does for
    self-contained benchmarking).
    """
    base = _unit_vectors_np(df, id_col, vec_col)
    centroids = ivf_train_centroids(df, id_col, vec_col, num_cells, iters)
    assigned = _assign_cells(base, centroids, nprobe=1)
    assigned.select("vid", "uvec", "cell_id").write.mode("overwrite").partitionBy(
        "cell_id"
    ).parquet(f"{index_path}/cells")
    centroids.write.mode("overwrite").parquet(f"{index_path}/centroids")


def ivf_query_index(
    spark,
    index_path: str,
    query_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Query a persisted IVF index: assign queries to their nprobe nearest
    cells (one broadcast pass over the small centroid table), then join
    ONLY those cells' partitions and exact-re-rank.

    The cell filter is a partition filter on the index parquet — Catalyst
    prunes unprobed cells at the file listing, so scan cost scales with
    nprobe/num_cells of the corpus, not the corpus.
    """
    from pyspark.sql import Window

    centroids = spark.read.parquet(f"{index_path}/centroids")
    cells = spark.read.parquet(f"{index_path}/cells")
    q = _unit_vectors_np(query_vectors, id_col, vec_col)
    probed = _assign_cells(q, centroids, nprobe=nprobe).select(
        F.col("vid").alias("query_id"), F.col("uvec").alias("qvec"), "cell_id"
    )
    wanted = [r["cell_id"] for r in probed.select("cell_id").distinct().collect()]
    scored = (
        F.broadcast(probed)
        .join(
            cells.where(F.col("cell_id").isin(wanted)).withColumnsRenamed(
                {"vid": "nid", "uvec": "nvec"}
            ),
            "cell_id",
        )
        .where(F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(_pair_dot()(F.col("qvec"), F.col("nvec")), 4).alias("cosine_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


def ivf_append_batch(
    spark,
    new_df: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally maintain a persisted IVF index: assign an ingest
    batch's vectors to the EXISTING trained centroids and append them to
    the per-cell parquet layout — no retraining, no rewrite of the
    standing corpus.

    This is how IVF indexes live in production: centroids are trained
    once (or re-trained rarely, offline) and every ingest batch is a
    fixed-centroid assignment — one map pass over the batch plus a
    partitioned append, so index maintenance cost tracks the BATCH size
    while the 100 TB standing index is untouched.  Because assignment is
    a pure function of (vector, centroids), the appended index is
    byte-for-byte the index a single build pass would produce with the
    same centroids over the union corpus — pinned by
    tests/test_operators.py::TestIvfIndex::test_append_equals_union_build,
    so queries see appended vectors with identical semantics.

    Centroid drift: if the corpus distribution shifts, rebuild with
    ivf_build_index (the cache key in queries/north_star.py demonstrates
    content-keyed invalidation); appending never degrades correctness —
    only cell balance — because queries re-rank with exact dot products.
    """
    centroids = spark.read.parquet(f"{index_path}/centroids")
    base = _unit_vectors_np(new_df, id_col, vec_col)
    assigned = _assign_cells(base, centroids, nprobe=1)
    assigned.select("vid", "uvec", "cell_id").write.mode("append").partitionBy(
        "cell_id"
    ).parquet(f"{index_path}/cells")


# ------------------------------------------------- txn-backed streaming IVF
def ivf_txn_seed(
    spark,
    df: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 16,
    iters: int = 1,
):
    """Seed a TRANSACTIONAL IVF index: trained centroids (parquet, same
    layout ivf_build_index uses) + the assigned corpus in a TxnTable at
    ``{index_path}/cells_txn`` instead of loose partitioned parquet.  The
    txn log is what upgrades index maintenance from at-least-once to
    EXACTLY-ONCE under Structured Streaming (see ivf_txn_maintainer) —
    appended cell files are invisible until their commit, and a replayed
    micro-batch re-commits as a no-op via its app_txn_id.

    Cell locality is preserved by RANGE-repartitioning on cell_id before
    the write (an EXPLICIT partition count, so AQE cannot coalesce the
    tiny test-scale shuffle into one mixed file): each committed file
    covers a narrow contiguous cell band and its footer [min, max] on
    cell_id IS the partition-pruning metadata — a probe reads only the
    files whose band intersects its probed cells (ivf_query_txn), the
    same scan-scaling as the partitionBy layout.  Returns the TxnTable.
    """
    from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable

    base = _unit_vectors_np(df, id_col, vec_col)
    centroids = ivf_train_centroids(df, id_col, vec_col, num_cells, iters)
    centroids.write.mode("overwrite").parquet(f"{index_path}/centroids")
    assigned = _assign_cells(base, centroids, nprobe=1).select(
        "vid", "uvec", "cell_id"
    )
    table = TxnTable(spark, f"{index_path}/cells_txn")
    table.overwrite(
        assigned.repartitionByRange(num_cells, "cell_id"),
        app_txn_id="ivf-seed",
    )
    return table


def ivf_txn_maintainer(
    table,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sink_id: str = "ivf",
    num_files: int = 8,
):
    """foreachBatch handler keeping a txn-backed IVF index current from
    an embedding STREAM — the streaming twin of ivf_append_batch, wired
    through the exactly-once commit protocol (pipeline/txn.py
    exactly_once_stream_sink's contract): each micro-batch is assigned
    to the EXISTING trained centroids (fixed-centroid assignment, no
    retrain, no standing-corpus rewrite) and appended under
    ``app_txn_id=f"{sink_id}-{batch_id}"``, so a batch replayed after a
    crash/restart re-commits as a no-op instead of double-inserting
    vectors.

        q = (spark.readStream.schema(...).parquet(src)
               .writeStream
               .foreachBatch(ivf_txn_maintainer(table, index_path))
               .option("checkpointLocation", ckpt)
               .trigger(availableNow=True).start())

    Assignment is a pure function of (vector, centroids), so the
    stream-fed index content equals the one-shot build over the union
    corpus with the same centroids — the maintenance identity
    tests/test_streaming.py::TestStreamingIvfMaintenance pins under the
    real streaming runtime, crash replay included.

    Scale: per trigger this is one Arrow-batched assignment map over the
    micro-batch plus one cell-local shuffle of BATCH size; the standing
    index is untouched and the commit is a single put-if-absent JSON."""

    def _handle(batch_df, batch_id: int) -> None:
        spark = batch_df.sparkSession
        centroids = spark.read.parquet(f"{index_path}/centroids")
        base = _unit_vectors_np(batch_df, id_col, vec_col)
        assigned = _assign_cells(base, centroids, nprobe=1).select(
            "vid", "uvec", "cell_id"
        )
        table.append(
            assigned.repartitionByRange(num_files, "cell_id"),
            app_txn_id=f"{sink_id}-{batch_id}",
        )

    return _handle


def ivf_query_txn(
    spark,
    table,
    index_path: str,
    query_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Query the txn-backed IVF index: assign queries to their nprobe
    nearest cells (broadcast centroid pass), prune the cell files by
    their committed cell_id [min, max] stats (cell-pure files ⇒ the
    prune is exact — the txn-log analog of parquet partition pruning),
    then exact-re-rank only the surviving files' vectors.  Same output
    contract as ivf_query_index."""
    centroids = spark.read.parquet(f"{index_path}/centroids")
    q = _unit_vectors_np(query_vectors, id_col, vec_col)
    probed = _assign_cells(q, centroids, nprobe=nprobe).select(
        F.col("vid").alias("query_id"), F.col("uvec").alias("qvec"), "cell_id"
    )
    wanted = sorted(
        r["cell_id"] for r in probed.select("cell_id").distinct().collect()
    )
    # shared txn helpers (see TxnTable.prune_files_values/read_files):
    # membership prune on committed cell bands; empty prune yields a
    # schema-correct empty frame so the join below returns zero rows
    chosen = table.prune_files_values("cell_id", wanted)
    cells = table.read_files(chosen)
    scored = (
        F.broadcast(probed)
        .join(
            cells.where(F.col("cell_id").isin(wanted)).withColumnsRenamed(
                {"vid": "nid", "uvec": "nvec"}
            ),
            "cell_id",
        )
        .where(F.col("query_id") != F.col("nid"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.round(_pair_dot()(F.col("qvec"), F.col("nvec")), 4).alias(
                "cosine_sim"
            ),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .drop("rn")
    )


# ------------------------------------------------------ product quantization
def pq_train_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_subspaces: int = 8,
    num_codes: int = 16,
    dim: int = 64,
):
    """Train PQ codebooks (Jégou et al., TPAMI 2011: "Product Quantization
    for Nearest Neighbor Search"): split each unit vector into
    ``num_subspaces`` contiguous sub-vectors and k-means each subspace
    independently into ``num_codes`` centroids.

    Returns a numpy array of shape (num_subspaces, num_codes, dim/M) —
    driver-sized BY CONSTRUCTION (8·16·8 doubles = 8 KB), the PQ analog of
    the IVF centroid table.

    Determinism mirrors ivf_train_centroids so the whole training pass is
    SQL-replayable: seeds are the ``num_codes`` corpus vectors with the
    smallest Knuth scramble ((id mod 2^31)·2654435761 mod 2^32, tie on
    id) — the SAME seed rows for every subspace — followed by exactly one
    Lloyd step (argmin-L2 assignment, ties to the lower code id, then the
    per-(subspace, code) element-wise mean).

    Distribution shape: one mapInPandas pass over the corpus emits
    PER-BATCH partial sums — (subspace, code, pos, psum, pcnt) rows, at
    most M·ks·d per batch — and one aggregation reduces them; the corpus
    itself never shuffles.  At 100 TB that is the map-side-combine shape
    of any global mean.
    """
    import numpy as np
    import pandas as pd

    d = dim // num_subspaces
    scramble = F.pmod(
        F.pmod(F.col(id_col).cast("bigint"), F.lit(2147483648)) * F.lit(2654435761),
        F.lit(4294967296),
    )
    seed_rows = (
        df.select(F.col(vec_col).alias("v"), F.col(id_col).alias("sid"))
        .orderBy(scramble, F.col("sid"))
        .limit(num_codes)
        .collect()
    )
    seed_mat = []
    for r in seed_rows:
        v = np.asarray(list(r["v"]), dtype=np.float64)
        n = np.linalg.norm(v)
        seed_mat.append(v / n if n > 0 else v)
    # (M, ks, d): subspace m's seed c = sub-vector m of global seed c
    seeds = np.stack(seed_mat).reshape(num_codes, num_subspaces, d).transpose(1, 0, 2)

    base = _unit_vectors_np(df, id_col, vec_col)

    def _partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.vstack(pdf["uvec"].to_numpy()).reshape(-1, num_subspaces, d)
            out = {"m": [], "code": [], "pos": [], "psum": [], "pcnt": []}
            for m in range(num_subspaces):
                sub = mat[:, m, :]  # batch × d
                d2 = ((sub[:, None, :] - seeds[m][None, :, :]) ** 2).sum(axis=2)
                codes = np.argmin(d2, axis=1)  # ties -> lower code (argmin is first)
                for c in np.unique(codes):
                    sel = sub[codes == c]
                    for pos in range(d):
                        out["m"].append(m)
                        out["code"].append(int(c))
                        out["pos"].append(pos)
                        out["psum"].append(float(sel[:, pos].sum()))
                        out["pcnt"].append(int(len(sel)))
            yield pd.DataFrame(out)

    agg = (
        base.mapInPandas(
            _partials, "m int, code int, pos int, psum double, pcnt bigint"
        )
        .groupBy("m", "code", "pos")
        .agg(F.sum("psum").alias("s"), F.sum("pcnt").alias("n"))
        .collect()
    )
    codebook = seeds.copy()  # codes with no assigned vectors keep their seed
    for r in agg:
        codebook[r["m"], r["code"], r["pos"]] = r["s"] / r["n"]
    return codebook


def pq_encode(
    df: DataFrame,
    codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, codes) — each unit vector compressed to one code per subspace
    (argmin L2 against the trained codebook, ties to the lower code id).

    64 doubles (512 B) become M small ints (codes fit a byte at ks ≤ 256)
    — the ~64× compression that lets a 100 TB embedding corpus's codes
    live in memory.  The codebook rides into the Arrow batch as a numpy
    closure; encoding is a map pass, no shuffle.
    """
    import numpy as np
    import pandas as pd

    M, ks, d = codebook.shape

    def _enc(v):
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack(v.to_numpy()).reshape(-1, M, d)
        out = np.empty((len(mat), M), dtype=np.int32)
        for m in range(M):
            d2 = ((mat[:, m, None, :] - codebook[m][None, :, :]) ** 2).sum(axis=2)
            out[:, m] = np.argmin(d2, axis=1)
        return pd.Series(list(out))

    enc = F.pandas_udf(_enc, "array<int>")
    base = _unit_vectors_np(df, id_col, vec_col)
    return base.select("vid", enc(F.col("uvec")).alias("codes"))


def pq_topk(
    df: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_subspaces: int = 8,
    num_codes: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over PQ
    codes: score(q, x) ≈ Σ_m 〈q_m, codebook[m][code_m(x)]〉 — the query
    keeps its exact sub-vectors, the corpus contributes only its codes,
    and each query's M×ks lookup table of partial dots is built once.

    The 100 TB shape: the codebook (8 KB) and per-query LUTs (M·ks
    doubles) broadcast; scoring reads 1 byte per (vector, subspace) and
    never touches the original embeddings — the scan is over the
    compressed codes column.  Returns (query_id, neighbor_id, approx_sim)
    with approx_sim = round(ADC estimate, 4), ranked (approx_sim DESC,
    neighbor_id) per query, self-matches excluded.  Fully deterministic —
    seeded training, stable argmin ties — and SQL-replayable end to end
    (queries/north_star.py sim_pq_topk carries the full-pipeline oracle).
    """
    import numpy as np
    import pandas as pd

    codebook = pq_train_codebooks(df, id_col, vec_col, num_subspaces, num_codes, dim)
    M, ks, d = codebook.shape
    codes = pq_encode(df, codebook, id_col, vec_col)

    base = _unit_vectors_np(df, id_col, vec_col)
    qrows = sorted(
        (r["vid"], np.asarray(list(r["uvec"]), dtype=np.float64))
        for r in base.where(F.col("vid").isin(query_ids)).collect()
    )
    if not qrows:  # none of the requested ids exist: empty result, not np.stack([])
        return df.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, approx_sim double"
        )
    return _adc_topk_all(codes, qrows, codebook, k)


def _adc_topk_all(codes: DataFrame, qrows, codebook, k: int) -> DataFrame:
    """ADC top-k of every query against EVERY stored code row: per-query
    M×ks LUTs broadcast in the UDF closure; one posexplode emits (query,
    score) per (vector, query) — shared by pq_topk (fresh encode) and
    pq_query_index (persisted codes)."""
    import numpy as np
    import pandas as pd

    M = codebook.shape[0]
    # luts[i]: M × ks partial dots for query i
    qids = np.array([q for q, _ in qrows], dtype=np.int64)
    d = codebook.shape[2]
    luts = np.stack(
        [
            np.einsum("md,mkd->mk", qv.reshape(M, d), codebook)
            for _, qv in qrows
        ]
    )  # Q × M × ks

    def _score(c):
        if len(c) == 0:
            return pd.Series([], dtype=object)
        cm = np.vstack(c.to_numpy())  # batch × M
        # batch × Q: sum over subspaces of lut[q, m, code]
        s = luts[:, np.arange(M)[None, :], cm[:, :]].sum(axis=2).T
        return pd.Series(list(s))

    score = F.pandas_udf(_score, "array<double>")
    scored = (
        codes.select("vid", F.posexplode(score(F.col("codes"))).alias("qi", "s"))
        .select(
            F.element_at(F.lit(qids.tolist()), F.col("qi") + 1)
            .cast("bigint")
            .alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            F.round("s", 4).alias("approx_sim"),
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


def ivfpq_topk(
    df: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_cells: int = 16,
    nprobe: int = 4,
    num_subspaces: int = 8,
    num_codes: int = 16,
    dim: int = 64,
) -> DataFrame:
    """IVF-PQ: the production ANN composition (coarse inverted-file
    probing × product-quantized scoring).  Queries probe their ``nprobe``
    nearest trained cells and ADC-score ONLY those cells' vectors from
    their PQ codes — candidate count scales with nprobe/num_cells of the
    corpus AND each candidate costs one byte per subspace, so at 100 TB
    the scan is nprobe/num_cells of a 64×-compressed codes column.

    This is the raw-vector IVF+PQ variant (codebooks trained on the
    vectors themselves, not the per-cell residuals — residual PQ encodes
    tighter but its codebooks depend on the coarse assignment, which
    would couple the two training replays; the raw variant keeps both
    pipelines independently deterministic and SQL-replayable).  Both
    trainers share the Knuth-scramble seeding; the full composition is
    oracle-replayed by queries/north_star.py _ivfpq_oracle_sql.
    """
    import numpy as np
    import pandas as pd

    centroids = ivf_train_centroids(df, id_col, vec_col, num_cells, iters=1)
    base = _unit_vectors_np(df, id_col, vec_col)
    corpus_cells = _assign_cells(base, centroids, nprobe=1).select("vid", "cell_id")
    codebook = pq_train_codebooks(df, id_col, vec_col, num_subspaces, num_codes, dim)
    M, ks, d = codebook.shape
    coded = pq_encode(df, codebook, id_col, vec_col).join(corpus_cells, "vid")

    qbase = base.where(F.col("vid").isin(query_ids))
    probed = _assign_cells(qbase, centroids, nprobe=nprobe).select(
        F.col("vid").alias("query_id"), "cell_id"
    )
    qrows = sorted(
        (r["vid"], np.asarray(list(r["uvec"]), dtype=np.float64))
        for r in qbase.collect()
    )
    if not qrows:  # none of the requested ids exist: empty result, not np.stack([])
        return df.sparkSession.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, approx_sim double"
        )
    return _adc_topk_probed(probed, coded, qrows, codebook, k)


def _adc_topk_probed(
    probed: DataFrame, coded: DataFrame, qrows, codebook, k: int
) -> DataFrame:
    """ADC top-k restricted to probed cells: broadcast the (query, cell)
    probe table, join the codes of those cells only, score each candidate
    with ITS query's LUT (qid-indexed in the UDF closure) — shared by
    ivfpq_topk (fresh build) and ivfpq_query_index (persisted codes)."""
    import numpy as np
    import pandas as pd

    M, _ks, d = codebook.shape
    qidx = {q: i for i, (q, _) in enumerate(qrows)}
    luts = np.stack(
        [np.einsum("md,mkd->mk", qv.reshape(M, d), codebook) for _, qv in qrows]
    )  # Q × M × ks

    def _score(qid, c):
        if len(c) == 0:
            return pd.Series([], dtype="float64")
        cm = np.vstack(c.to_numpy())  # batch × M
        qi = qid.map(qidx).to_numpy(dtype=np.int64)
        s = luts[qi[:, None], np.arange(M)[None, :], cm].sum(axis=1)
        return pd.Series(s)

    score = F.pandas_udf(_score, "double")
    scored = (
        F.broadcast(probed)
        .join(coded, "cell_id")
        .where(F.col("query_id") != F.col("vid"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            F.round(score(F.col("query_id"), F.col("codes")), 4).alias("approx_sim"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("approx_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k).drop("rn")


# ----------------------------------------------- persisted PQ / IVF-PQ indexes
def _write_codebook(spark, codebook, path: str) -> None:
    """Persist a trained (M, ks, d) codebook as narrow parquet rows
    (m, code, pos, val) — engine-portable, humanly inspectable, and tiny
    (M·ks·d doubles; 1k rows at the defaults)."""
    M, ks, d = codebook.shape
    rows = [
        (m, c, p, float(codebook[m, c, p]))
        for m in range(M)
        for c in range(ks)
        for p in range(d)
    ]
    spark.createDataFrame(rows, "m int, code int, pos int, val double").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def _read_codebook(spark, path: str):
    """Load a persisted codebook back into the (M, ks, d) numpy array."""
    import numpy as np

    rows = spark.read.parquet(path).collect()
    M = max(r["m"] for r in rows) + 1
    ks = max(r["code"] for r in rows) + 1
    d = max(r["pos"] for r in rows) + 1
    cb = np.zeros((M, ks, d), dtype=np.float64)
    for r in rows:
        cb[r["m"], r["code"], r["pos"]] = r["val"]
    return cb


def pq_build_index(
    df: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_subspaces: int = 8,
    num_codes: int = 16,
    dim: int = 64,
) -> None:
    """Build and persist a PQ index: trained codebooks + the corpus's codes
    column.  The amortized half of PQ — the production FAISS recipe: train
    once at ingest, store 1 byte/subspace per vector (the ~64× compression
    that lets a 100 TB embedding corpus's codes live hot), and every query
    is then an ADC scan of STORED codes — no re-training, no re-encoding,
    and the original embeddings are never read again on the query path.

    Because training and encoding are deterministic (Knuth-scramble seeds,
    stable argmin ties — pq_train_codebooks), the persisted index is
    byte-equivalent to what any fresh pq_topk run derives, so the
    full-pipeline PQ oracle also checks queries served from the index
    (queries/north_star.py sim_pq_query_only).
    """
    codebook = pq_train_codebooks(df, id_col, vec_col, num_subspaces, num_codes, dim)
    codes = pq_encode(df, codebook, id_col, vec_col)
    codes.write.mode("overwrite").parquet(f"{index_path}/codes")
    _write_codebook(df.sparkSession, codebook, f"{index_path}/codebook")


def pq_query_index(
    spark,
    index_path: str,
    query_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Query a persisted PQ index: load the (tiny) codebook, build each
    query's M×ks LUT from its EXACT sub-vectors, ADC-scan the stored codes.
    Scan cost: 1 byte per (stored vector, subspace) — the compressed codes
    column is the only corpus-sized input."""
    codebook = _read_codebook(spark, f"{index_path}/codebook")
    codes = spark.read.parquet(f"{index_path}/codes")
    import numpy as np

    qbase = _unit_vectors_np(query_vectors, id_col, vec_col)
    qrows = sorted(
        (r["vid"], np.asarray(list(r["uvec"]), dtype=np.float64))
        for r in qbase.collect()
    )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, approx_sim double"
        )
    return _adc_topk_all(codes, qrows, codebook, k)


def ivfpq_build_index(
    df: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 16,
    num_subspaces: int = 8,
    num_codes: int = 16,
    dim: int = 64,
) -> None:
    """Build and persist an IVF-PQ index: coarse centroids + PQ codebooks +
    the codes column partitioned BY CELL on disk.  The full production ANN
    layout — queries probe nprobe cells (parquet partition pruning on
    cell_id, as ivf_query_index) and ADC-scan only those cells' 1-byte-per-
    subspace codes: scan cost is nprobe/num_cells of a 64×-compressed
    column.  Both trainers are deterministic, so index-served results are
    byte-equal to a fresh ivfpq_topk run (the replayed oracle covers both).
    """
    centroids = ivf_train_centroids(df, id_col, vec_col, num_cells, iters=1)
    base = _unit_vectors_np(df, id_col, vec_col)
    cellmap = _assign_cells(base, centroids, nprobe=1).select("vid", "cell_id")
    codebook = pq_train_codebooks(df, id_col, vec_col, num_subspaces, num_codes, dim)
    coded = pq_encode(df, codebook, id_col, vec_col).join(cellmap, "vid")
    coded.write.mode("overwrite").partitionBy("cell_id").parquet(f"{index_path}/codes")
    centroids.write.mode("overwrite").parquet(f"{index_path}/centroids")
    _write_codebook(df.sparkSession, codebook, f"{index_path}/codebook")


def ivfpq_query_index(
    spark,
    index_path: str,
    query_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Query a persisted IVF-PQ index: assign queries to their nprobe
    nearest cells (one broadcast pass over the centroid table), read ONLY
    those cells' code partitions (Catalyst prunes the rest at file
    listing), ADC-score with per-query LUTs, exact window top-k."""
    import numpy as np

    centroids = spark.read.parquet(f"{index_path}/centroids")
    codebook = _read_codebook(spark, f"{index_path}/codebook")
    coded = spark.read.parquet(f"{index_path}/codes")
    qbase = _unit_vectors_np(query_vectors, id_col, vec_col)
    probed = _assign_cells(qbase, centroids, nprobe=nprobe).select(
        F.col("vid").alias("query_id"), "cell_id"
    )
    qrows = sorted(
        (r["vid"], np.asarray(list(r["uvec"]), dtype=np.float64))
        for r in qbase.collect()
    )
    if not qrows:
        return spark.createDataFrame(
            [], "query_id bigint, neighbor_id bigint, approx_sim double"
        )
    wanted = [r["cell_id"] for r in probed.select("cell_id").distinct().collect()]
    return _adc_topk_probed(
        probed, coded.where(F.col("cell_id").isin(wanted)), qrows, codebook, k
    )


def pq_append_batch(
    spark,
    new_df: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally maintain a persisted PQ index: encode an ingest
    batch against the EXISTING trained codebooks and append its codes —
    no retraining, no rewrite of the standing codes column.  Mirrors
    ivf_append_batch: encoding is a pure function of (vector, codebook),
    so the appended index equals a single encode pass over the union
    corpus with the same codebooks (pinned by TestPqIndex), and
    maintenance cost tracks the BATCH.  Codebook drift (corpus
    distribution shift) degrades ADC fidelity, never correctness of the
    stored codes; rebuild offline with pq_build_index when recall decays.
    """
    codebook = _read_codebook(spark, f"{index_path}/codebook")
    pq_encode(new_df, codebook, id_col, vec_col).write.mode("append").parquet(
        f"{index_path}/codes"
    )


def ivfpq_append_batch(
    spark,
    new_df: DataFrame,
    index_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally maintain a persisted IVF-PQ index: assign the batch
    to the existing coarse centroids, encode against the existing
    codebooks, append to the per-cell partitioned codes layout.  Both
    steps are pure functions of (vector, trained artifacts), so appended
    == union-built with the same artifacts; per-batch cost is one map
    pass plus a partitioned append, independent of the standing corpus.
    """
    centroids = spark.read.parquet(f"{index_path}/centroids")
    codebook = _read_codebook(spark, f"{index_path}/codebook")
    base = _unit_vectors_np(new_df, id_col, vec_col)
    cellmap = _assign_cells(base, centroids, nprobe=1).select("vid", "cell_id")
    coded = pq_encode(new_df, codebook, id_col, vec_col).join(cellmap, "vid")
    coded.write.mode("append").partitionBy("cell_id").parquet(f"{index_path}/codes")


# ------------------------------------------ incremental embedding LSH index
def lsh_build_index(
    corpus_df: DataFrame,
    buckets_table: str,
    vecs_table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 10,
    num_planes: int | None = None,
    target_bucket_size: int = 64,
    dim: int = 64,
    num_buckets: int = 8,
    mode: str = "overwrite",
) -> int:
    """Persist the corpus's hyperplane-LSH buckets + unit vectors as
    bucketed catalog tables — the EMBEDDING analog of minhash_build_index:
    bucket the 100 TB embedding corpus once at ingest, then find each
    incoming batch's semantic near-duplicates against it at per-batch cost
    (the incremental SemDeDup ingest gate).

    ``num_planes=None`` derives the count adaptively from the corpus
    (adaptive_num_planes at the fixed LSH_MAX_PLANES stride).  RETURNS the
    plane count used — appends and queries must reuse it (bucket ids are a
    function of it), so callers thread it through; passing a different
    count against a standing index would silently mis-bucket, which is why
    query/append take it explicitly rather than re-deriving from a corpus
    that has since grown.

    Tables: ``buckets_table`` (vid, bkey) with bkey = xxhash64(tbl,
    bucket), bucketed by bkey (candidate join side — a fused-key collision
    across tables can only ADD a candidate; verification is exact);
    ``vecs_table`` (vid, uvec) bucketed by vid (exact-cosine re-rank side,
    joined only for candidate ids).  Append a promoted batch's rows with
    ``mode="append"`` — per-batch maintenance, no rebuild.
    """
    from aws_genaric_datapipeline_spark.operators.bucketing import write_bucketed

    if num_planes is None:
        num_planes = adaptive_num_planes(corpus_df.count(), target_bucket_size)
    base = with_unit_vectors(corpus_df, vec_col).select(
        F.col(id_col).alias("vid"), F.col("unit_vec").alias("uvec")
    )
    buckets = _lsh_buckets_udf(dim, num_planes, num_tables, stride=LSH_MAX_PLANES)
    keys = base.select(
        "vid", F.posexplode(buckets(F.col("uvec"))).alias("tbl", "bucket")
    ).select("vid", F.xxhash64("tbl", "bucket").alias("bkey"))
    write_bucketed(keys, buckets_table, ["bkey"], num_buckets, mode=mode)
    write_bucketed(
        base, vecs_table, ["vid"], num_buckets, mode=mode
    )
    return num_planes


def lsh_query_index(
    spark,
    new_df: DataFrame,
    buckets_table: str,
    vecs_table: str,
    num_planes: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 10,
    dim: int = 64,
    threshold: float = 0.9,
) -> DataFrame:
    """Semantic near-duplicates between an incoming embedding batch and
    the standing corpus index: (batch_id, corpus_id, cosine_sim) with
    exact cosine ≥ threshold among LSH candidates — the per-ingest-batch
    SemDeDup check, at per-batch cost.

    Shuffle shape mirrors minhash_query_index: the batch's keys and unit
    vectors shuffle into the index's bucket layouts; the corpus bucket and
    vector tables read CO-LOCATED (zero corpus-side Exchange, plan-gated
    in tests/test_plans.py::TestLshIndex).  ``num_planes`` must be the
    value lsh_build_index returned for this index."""
    base = with_unit_vectors(new_df, vec_col).select(
        F.col(id_col).alias("batch_id"), F.col("unit_vec").alias("bvec")
    )
    buckets = _lsh_buckets_udf(dim, num_planes, num_tables, stride=LSH_MAX_PLANES)
    bkeys = base.select(
        "batch_id", F.posexplode(buckets(F.col("bvec"))).alias("tbl", "bucket")
    ).select("batch_id", F.xxhash64("tbl", "bucket").alias("bkey"))
    cand = (
        bkeys.join(spark.table(buckets_table), "bkey")
        .select("batch_id", F.col("vid").alias("corpus_id"))
        .dropDuplicates()
    )
    cvecs = spark.table(vecs_table).withColumnsRenamed({"uvec": "cvec"})
    scored = (
        cand.withColumnsRenamed({"corpus_id": "vid"})
        .join(cvecs, "vid")
        .withColumnsRenamed({"vid": "corpus_id"})
        .join(base, "batch_id")
        .select(
            "batch_id",
            "corpus_id",
            F.round(_pair_dot()(F.col("bvec"), F.col("cvec")), 4).alias("cosine_sim"),
        )
    )
    return scored.where(F.col("cosine_sim") >= threshold)


def ivf_tuning_report(
    df: DataFrame,
    query_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_cells: int = 16,
    nprobes: tuple[int, ...] = (1, 2, 4, 8),
    iters: int = 1,
) -> DataFrame:
    """Recall@k vs scan-fraction sweep over nprobe — the report that
    tells a 100 TB operator where to sit on the IVF recall/cost curve
    before committing a cluster-month to the wrong setting.

    One row per nprobe: ``recall_bp`` = 10000 · |IVF top-k ∩ exact
    top-k| / (k·|Q|) and ``scan_bp`` = 10000 · |candidate pairs| /
    (N·|Q|) — the fraction of the corpus each query actually scored.
    Both are integer basis points (truncating division), so the report
    is bit-reproducible and SQL-replayable; the exact top-k ground truth
    is computed in-line (brute force over the same unit vectors).

    Cost: the corpus is unit-normalized and cell-assigned ONCE
    (checkpointed), the exact ground truth is one brute-force pass, and
    the WHOLE nprobe sweep is one ranked candidate join + one windowed
    aggregate (the tiers are nested — see below), not one join and
    checkpoint per setting.  Only the per-tier count rows reach the
    driver."""
    spark = df.sparkSession
    base = _unit_vectors_np(df, id_col, vec_col).localCheckpoint(eager=True)
    centroids = ivf_train_centroids(df, id_col, vec_col, num_cells, iters)
    corpus = _assign_cells(base, centroids, nprobe=1).select(
        F.col("vid").alias("nid"), F.col("uvec").alias("nvec"), "cell_id"
    ).localCheckpoint(eager=True)
    n = base.count()
    nq = len(query_ids)
    exact = (
        cosine_topk(df, query_ids, id_col, vec_col, k)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    qbase = base.where(F.col("vid").isin(query_ids))
    # The swept tiers are NESTED: _assign_cells' stable argsort means the
    # nprobe=p cell list is exactly the first p entries of the nprobe=pmax
    # list.  So ONE ranked assignment at pmax + one candidate join serves
    # every tier — a pair enters tier p iff the lowest rank among its
    # shared probed cells is <= p — instead of re-assigning, re-joining and
    # re-checkpointing per tier (4x the probe work and 12+ driver-blocking
    # jobs for the default sweep).  One exploded (tier, pair) frame then
    # computes every tier's scan count, top-k window and exact-overlap in a
    # SINGLE distributed action.
    pmax = max(nprobes)
    ranked = _assign_cells(qbase, centroids, nprobe=pmax, ranked=True).select(
        F.col("vid").alias("query_id"),
        F.col("uvec").alias("qvec"),
        "cell_id",
        "r",
    )
    pairs = (
        F.broadcast(ranked)
        .join(corpus, "cell_id")
        .where(F.col("query_id") != F.col("nid"))
        .groupBy("query_id", F.col("nid").alias("neighbor_id"))
        .agg(
            F.min("r").alias("r"),
            F.first("qvec").alias("qvec"),
            F.first("nvec").alias("nvec"),
        )
        .select(
            "query_id",
            "neighbor_id",
            "r",
            F.round(_pair_dot()(F.col("qvec"), F.col("nvec")), 4).alias("s"),
        )
    )
    tiers = F.array(*[F.lit(int(p)) for p in sorted(nprobes)])
    tiered = pairs.withColumn(
        "nprobe", F.explode(F.filter(tiers, lambda t: t >= F.col("r")))
    )
    w = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("s"), F.asc("neighbor_id")
    )
    hits = (
        tiered.withColumn("rn", F.row_number().over(w))
        .join(
            F.broadcast(exact.withColumn("_hit", F.lit(1))),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("nprobe")
        .agg(
            F.count(F.lit(1)).alias("scanned"),
            F.sum(
                F.when((F.col("rn") <= k) & F.col("_hit").isNotNull(), 1).otherwise(0)
            ).alias("overlap"),
        )
        .collect()
    )
    by_tier = {int(r["nprobe"]): r for r in hits}
    rows = []
    for p in nprobes:
        t = by_tier.get(int(p))
        scanned = int(t["scanned"]) if t else 0
        overlap = int(t["overlap"]) if t else 0
        rows.append(
            (p, overlap * 10000 // (k * nq), scanned * 10000 // (n * nq))
        )
    return spark.createDataFrame(
        rows, "nprobe bigint, recall_bp bigint, scan_bp bigint"
    )


# --------------------------------------------------------- index erasure
def erase_from_lsh_index(
    spark,
    buckets_table: str,
    vecs_table: str,
    victim_ids: DataFrame,
    num_buckets: int = 8,
) -> None:
    """Cascade a right-to-erasure deletion into the persisted hyperplane-
    LSH embedding index (lsh_build_index): both tables are per-vector, so
    victim rows anti-join out exactly — same rebuild-equivalence contract
    as the MinHash eraser (operators/dedup.py), asserted in
    tests/test_erasure.py::TestLshIndexErasure.  The PLANE COUNT is a
    frozen index parameter (bucket ids are a function of it), so the
    rebuild comparison pins num_planes rather than re-deriving it from
    the shrunken corpus."""
    from aws_genaric_datapipeline_spark.operators.dedup import _erase_rows

    _erase_rows(spark, buckets_table, victim_ids, "vid", ["bkey"], num_buckets)
    _erase_rows(spark, vecs_table, victim_ids, "vid", ["vid"], num_buckets)


def erase_from_ivf_index(spark, index_path: str, victim_ids: DataFrame) -> None:
    """Cascade a deletion into the persisted IVF index (ivf_build_index):
    rewrite ONLY the cell partitions that contain victim vectors (dynamic
    partition overwrite — untouched cells' files are never read or
    rewritten, the file-pruned shape the 100 TB path needs), and drop a
    partition outright when every vector in it was erased (dynamic
    overwrite only replaces partitions present in the NEW data, so an
    all-victim cell would otherwise survive as a stale ghost).

    The trained centroids are a MODEL ARTIFACT (like classifier weights):
    they stay frozen, so post-erasure query results are exactly those of
    an index rebuilt from survivors under the same centroids — the
    contract tests/test_erasure.py::TestIvfIndexErasure asserts.  Full
    erasure of the victims' influence on the centroids themselves means
    retraining (ivf_build_index over survivors)."""
    import shutil as _shutil

    victims = victim_ids.select(
        F.col(victim_ids.columns[0]).alias("vid")
    ).localCheckpoint(eager=True)
    cells = spark.read.parquet(f"{index_path}/cells")
    affected = [
        r["cell_id"]
        for r in cells.join(F.broadcast(victims), "vid")
        .select("cell_id")
        .distinct()
        .collect()
    ]
    if not affected:
        return
    kept = (
        cells.where(F.col("cell_id").isin(affected))
        .join(F.broadcast(victims), "vid", "left_anti")
        .select("vid", "uvec", "cell_id")
        .localCheckpoint(eager=True)
    )
    survivors = {r["cell_id"] for r in kept.select("cell_id").distinct().collect()}
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        kept.write.mode("overwrite").partitionBy("cell_id").parquet(
            f"{index_path}/cells"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    for cell in set(affected) - survivors:
        _shutil.rmtree(f"{index_path}/cells/cell_id={cell}", ignore_errors=True)


# ----------------------------------------------------------- k-center coreset
def _dist2_micro(a: Column, b: Column) -> Column:
    """Squared euclidean distance quantized to integer micro-units.

    Element ops run in DOUBLE with a fixed left-to-right accumulation
    (both engines evaluate the same expression shape), then quantize:
    floor(d² · 1e6) as bigint.  Every later comparison — running minima,
    farthest-point argmax, nearest-center assignment — is then EXACT
    integer arithmetic, so the greedy trajectory cannot diverge between
    engines on a last-ulp tie; the only residual risk is a raw distance
    landing within one ulp of a quantization boundary (same negligible
    class as the rounded-threshold filters elsewhere)."""
    d2 = F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.floor(d2 * 1e6).cast("bigint")


def kcenter_coreset(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversity coreset by greedy k-center (Gonzalez farthest-point):
    seed with the smallest id, then k-1 times add the point FARTHEST
    from its nearest chosen center (ties → smallest id).  The classic
    2-approximation to the k-center cover, and the standard diverse-
    subset selector for embedding-space data curation (pick prototypes
    that SPAN the corpus, where uniform sampling oversamples dense
    modes).

    Returns one row per center: (round_idx, center_id, n_assigned,
    max_dist2_micro) — assignment of every point to its nearest center
    (quantized distance, ties → smaller round_idx), and the coverage
    radius per center.

    Scale: each greedy round is ONE map pass (distance to the newest
    center, running integer min) + a global top-1 reduce; k rounds total,
    nothing quadratic.  The per-round driver hop carries one (id, vector)
    row — bounded control data, same class as the IVF centroid loop.  At
    100 TB with large k, switch the exact top-1 to the k-center++ sampled
    variant; the operator contract is unchanged."""
    pts = ensure_parallelism(df).select(
        F.col(id_col).alias("pid"), _dbl(F.col(vec_col)).alias("v")
    ).localCheckpoint(eager=True)
    seed = pts.orderBy("pid").limit(1).collect()[0]
    centers = [(0, int(seed["pid"]), list(seed["v"]))]
    lit_v = lambda vec: F.array(*[F.lit(float(x)) for x in vec])  # noqa: E731
    dmin = pts.select(
        "pid", "v", _dist2_micro(F.col("v"), lit_v(centers[0][2])).alias("dq")
    )
    for r in range(1, k):
        far = dmin.orderBy(F.desc("dq"), F.asc("pid")).limit(1).collect()[0]
        centers.append((r, int(far["pid"]), list(far["v"])))
        dmin = dmin.select(
            "pid",
            "v",
            F.least(
                F.col("dq"), _dist2_micro(F.col("v"), lit_v(far["v"]))
            ).alias("dq"),
        ).localCheckpoint(eager=True)  # k short plans, not one k-deep plan
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [(r, cid, vec) for r, cid, vec in centers],
        f"round_idx int, center_id bigint, cvec array<double>",
    )
    assigned = (
        pts.crossJoin(F.broadcast(cdf))
        .select(
            "pid",
            "round_idx",
            "center_id",
            _dist2_micro(F.col("v"), F.col("cvec")).alias("dq"),
        )
    )
    w = Window.partitionBy("pid").orderBy(F.asc("dq"), F.asc("round_idx"))
    best = assigned.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (
        best.groupBy("round_idx", "center_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_assigned"),
            F.max("dq").alias("max_dist2_micro"),
        )
        .select(
            F.col("round_idx").cast("bigint").alias("round_idx"),
            "center_id",
            "n_assigned",
            "max_dist2_micro",
        )
    )
