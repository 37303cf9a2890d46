"""Training-run preparation queries: context-window chunking, sequence
packing, perplexity filtering, corpus mixing, embedding compression.

The last mile between a curated corpus (corpus_curation.py) and a training
job — every query is the exact operator from operators/trainprep.py with a
DuckDB oracle where SQL can express it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.operators import trainprep as P
from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load

_TOKS = "string_split_regex(trim(text), '\\s+')"

_CHUNK, _STRIDE = 20, 15


@query(
    "chunk_token_windows",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS n
            FROM documents
        ),
        c AS (
            SELECT doc_id,
                   CAST(u.i AS INT) AS chunk_idx,
                   list_slice(toks, u.i * {_STRIDE} + 1,
                              u.i * {_STRIDE} + {_CHUNK}) AS ck
            FROM t, UNNEST(range(0, greatest(1,
                     1 + CAST(ceil(greatest(n - {_CHUNK}, 0) / CAST({_STRIDE} AS DOUBLE)) AS BIGINT)))) AS u(i)
        )
        SELECT doc_id, chunk_idx,
               CAST(len(ck) AS INT) AS n_tokens,
               array_to_string(ck, ' ') AS chunk_text
        FROM c WHERE len(ck) > 0
    """,
    tags=("north-star", "trainprep"),
)
def chunk_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: overlapping token windows of {size}/{stride}
    = 20/15 per document — pure sequence/transform/explode array
    expressions, no UDF, no shuffle (work ∝ output tokens)."""
    (documents,) = load(spark, sf_dir, "documents")
    return P.chunk_token_windows(documents, size=_CHUNK, stride=_STRIDE)


@query(
    "pack_token_bins",
    oracle=f"""
        WITH t AS (
            SELECT lang, doc_id,
                   CAST(len({_TOKS}) AS INT) AS n_tokens
            FROM documents
        )
        SELECT lang, doc_id, n_tokens,
               CAST(floor((sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - 1) / CAST(1000 AS DOUBLE)) AS BIGINT)
                   AS bin_id
        FROM t
    """,
    tags=("north-star", "trainprep"),
)
def pack_token_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents (id-ordered within language) assigned to
    consecutive 1000-token training bins via a running-sum window — one
    shuffle on the stratum key, reproducible across engines."""
    (documents,) = load(spark, sf_dir, "documents")
    return P.pack_token_bins(documents, budget=1000, strata_col="lang")


@query(
    "text_unigram_logprob",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id AS did, s.tok
            FROM documents, UNNEST({_TOKS}) AS s(tok)
        ),
        vocab AS (SELECT tok, count(*) AS tf FROM tok GROUP BY tok),
        tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM vocab)
        SELECT did AS doc_id,
               count(*) AS n_tokens,
               round(avg(-ln(tf / total)), 4) AS avg_neg_logprob
        FROM tok JOIN vocab USING (tok), tot
        GROUP BY did
    """,
    tags=("north-star", "trainprep", "text"),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality filter: per-document mean negative log
    probability under the corpus unigram LM.  Vocabulary is one aggregation
    then broadcast; scoring joins map-side — one shuffle on doc id."""
    (documents,) = load(spark, sf_dir, "documents")
    return P.unigram_logprob(documents)


_MIX = {"en": 0.3, "zh": 0.25, "fr": 0.2, "de": 0.15, "es": 0.1}


@query(
    "curate_mix_ratios",
    oracle=f"""
        WITH c AS (SELECT lang AS stratum, count(*) AS n_docs FROM documents GROUP BY lang),
        s AS (
            SELECT stratum, n_docs,
                   CASE stratum
                        WHEN 'en' THEN CAST(0.3 AS DOUBLE)
                        WHEN 'zh' THEN CAST(0.25 AS DOUBLE)
                        WHEN 'fr' THEN CAST(0.2 AS DOUBLE)
                        WHEN 'de' THEN CAST(0.15 AS DOUBLE)
                        WHEN 'es' THEN CAST(0.1 AS DOUBLE)
                   END AS share
            FROM c
        ),
        a AS (SELECT min(n_docs / share) AS anchor FROM s)
        SELECT stratum, n_docs,
               CAST(floor(10000 * anchor * share / n_docs) AS BIGINT) AS rate_bp,
               CAST(floor(n_docs * floor(10000 * anchor * share / n_docs) / 10000) AS BIGINT)
                   AS n_kept
        FROM s, a
    """,
    tags=("north-star", "trainprep", "curation"),
)
def curate_mix_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing plan: per-language sampling rates hitting a target
    mixture (en 30 / zh 25 / fr 20 / de 15 / es 10) without upsampling —
    the binding stratum anchors the achievable corpus size.  Driver-sized
    aggregation; applied downstream via stratified_sample."""
    (documents,) = load(spark, sf_dir, "documents")
    return P.mix_ratios(documents, "lang", _MIX)


@query(
    "curate_temperature_mixture",
    oracle="""
        WITH c AS (
            SELECT lang AS stratum, count(*) AS n_docs
            FROM documents GROUP BY lang
        ),
        t AS (SELECT sum(sqrt(n_docs)) AS z, sum(n_docs) AS n FROM c)
        SELECT stratum,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(floor(10000 * sqrt(n_docs) / z + 0.000001) AS BIGINT)
                   AS weight_bp,
               CAST(floor(10000 * (sqrt(n_docs) / z)
                          / (n_docs / CAST(n AS DOUBLE)) + 0.000001)
                    AS BIGINT) AS boost_bp
        FROM c, t
    """,
    tags=("north-star", "trainprep", "curation"),
)
def curate_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed (α = 0.5) language-mixture weights derived
    FROM the corpus — w_s ∝ sqrt(n_s), the exponent-smoothing multilingual
    pretraining uses so high-resource languages stop drowning the tail —
    plus each stratum's up/down-weighting factor vs its natural share.
    Complements curate_mix_ratios (which takes the mixture as a given).
    One partial-aggregate scan + a 1-row broadcast; α is pinned to 0.5
    because IEEE sqrt is correctly rounded (bit-identical across engines)
    where pow(n, α) is not — see operators/trainprep.py."""
    (documents,) = load(spark, sf_dir, "documents")
    return P.temperature_mixture(documents, "lang")


@query(
    "embed_int8_quantize",
    oracle="""
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        m AS (SELECT vec_id, e,
                     list_max(list_transform(e, x -> abs(x))) AS ma FROM v),
        s AS (SELECT vec_id, e, ma, ma / 127.0 AS scale FROM m)
        SELECT vec_id,
               round(scale, 6) AS scale,
               array_to_string(
                   CASE WHEN ma = 0
                        THEN list_transform(e, x -> CAST(0 AS INT))
                        ELSE list_transform(e, x -> CAST(round(x / scale) AS INT))
                   END, ',') AS qvec_csv,
               CASE WHEN ma = 0 THEN 0.0
                    ELSE round(list_max(list_transform(range(1, len(e) + 1),
                         i -> abs(e[i] - round(e[i] / scale) * scale))), 4)
               END AS max_abs_err
        FROM s
    """,
    tags=("north-star", "trainprep", "similarity"),
)
def embed_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column with
    reconstruction-error reporting — 4x compression before ANN indexing.
    Pure array expressions; narrow map, no shuffle.

    The quantized vector stays ``array<int>`` inside the operator
    (operators/trainprep.py quantize_int8); the query surface joins it to a
    CSV string because the driver's canonicalizer sorts result columns and
    cannot hash a list-typed cell.
    """
    (embeddings,) = load(spark, sf_dir, "embeddings")
    out = P.quantize_int8(embeddings)
    return out.withColumn("qvec_csv", F.array_join("qvec", ",")).drop("qvec")


def _jl_projection_oracle(out_dim: int = 16, n_emit: int = 4, in_dim: int = 64) -> str:
    """Oracle SQL replaying the JL projection's first ``n_emit`` output
    coordinates with LITERAL matrix constants: the engine's projection rows
    are _hyperplane(64, 7919+j) scaled by sqrt(3/out_dim) — deterministic
    integer mixing, no RNG state — so the exact float64 row values are
    reproducible here and the matmul becomes a list_dot_product per row."""
    import math

    from aws_genaric_datapipeline_spark.operators.similarity import _hyperplane

    s = math.sqrt(3.0 / out_dim)
    cols = []
    for j in range(n_emit):
        lit = "[" + ", ".join(repr(x * s) for x in _hyperplane(in_dim, 7919 + j)) + "]"
        cols.append(
            f"round(list_dot_product(CAST(embedding AS DOUBLE[]), {lit}), 6) AS p{j}"
        )
    return "SELECT vec_id, " + ", ".join(cols) + " FROM embeddings"


@query(
    "embed_random_projection",
    oracle=_jl_projection_oracle(),
    tags=("north-star", "trainprep", "similarity"),
)
def embed_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss projection 64 → 16 dims (deterministic
    splitmix64 hyperplanes, Arrow-batched matmul).

    FULLY oracle-checked (was rows-only through r05): the projection
    matrix is deterministic (splitmix64 rows scaled by sqrt(3/16)), so the
    oracle inlines the exact float64 matrix literals and recomputes the
    emitted coordinates as dot products in DuckDB.  The JL
    distance-preservation contract additionally stays driver-verified by
    embed_projection_distortion_check and pytest."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    out = P.random_projection(embeddings, out_dim=16)
    return out.select(
        "vec_id", *[F.round(F.element_at("proj_vec", i + 1), 6).alias(f"p{i}") for i in range(4)]
    )


_JL_PAIRS = [(1, 2), (3, 4), (5, 6), (7, 8), (9, 10),
             (11, 12), (13, 14), (15, 16), (17, 18), (19, 20)]


@query(
    "embed_projection_distortion_check",
    oracle=f"""
        WITH pairs(id_a, id_b) AS (VALUES {", ".join(f"({a}, {b})" for a, b in _JL_PAIRS)})
        SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
               round(list_distance(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 4) AS dist_orig,
               true AS distortion_ok
        FROM pairs
        JOIN embeddings a ON a.vec_id = pairs.id_a
        JOIN embeddings b ON b.vec_id = pairs.id_b
    """,
    tags=("north-star", "trainprep", "similarity"),
)
def embed_projection_distortion_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable JL guarantee for embed_random_projection (VERDICT
    r2 item 7: oracle the verification stage of engine-specific ops).

    The oracle recomputes the EXACT original Euclidean distance for a fixed
    pair sample in SQL; the engine emits that distance plus a boolean
    asserting the 64→16 projected distance stays inside the same
    per-pair distortion band the pytest contract pins ([0.3, 1.9] — the
    hyperplanes are deterministic splitmix64, so the ratio is a fixed
    property of the data, observed ~[0.7, 1.3]).  A red row means the
    projection broke distance preservation."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    pairs = spark.createDataFrame(_JL_PAIRS, "id_a long, id_b long")
    proj = P.random_projection(embeddings, out_dim=16)

    def dist(va, vb):
        return F.sqrt(
            F.aggregate(
                F.zip_with(va, vb, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, z: acc + z,
            )
        )

    orig = embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    prj = proj.select("vec_id", F.col("proj_vec").alias("p"))
    j = (
        pairs.join(orig.withColumnsRenamed({"vec_id": "id_a", "v": "va"}), "id_a")
        .join(orig.withColumnsRenamed({"vec_id": "id_b", "v": "vb"}), "id_b")
        .join(prj.withColumnsRenamed({"vec_id": "id_a", "p": "pa"}), "id_a")
        .join(prj.withColumnsRenamed({"vec_id": "id_b", "p": "pb"}), "id_b")
    )
    d0 = dist(F.col("va"), F.col("vb"))
    d1 = dist(F.col("pa"), F.col("pb"))
    return j.select(
        "id_a",
        "id_b",
        F.round(d0, 4).alias("dist_orig"),
        F.when(d0 == 0, F.lit(True))
        .otherwise((d1 >= 0.3 * d0) & (d1 <= 1.9 * d0))
        .alias("distortion_ok"),
    )


@query(
    "sample_quantile_bins",
    oracle="""
        WITH b AS (
            SELECT o_orderstatus, o_totalprice,
                   ntile(10) OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY o_totalprice, o_orderkey
                   ) AS bin
            FROM orders
        )
        SELECT o_orderstatus, CAST(bin AS INT) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               round(min(o_totalprice), 2) AS lo,
               round(max(o_totalprice), 2) AS hi
        FROM b GROUP BY 1, 2
    """,
    tags=("trainprep", "sampling"),
)
def sample_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretization (the exact analog of Spark ML's
    QuantileDiscretizer): per order status, rows split into 10
    equal-population bins by rank — ntile over a deterministic
    (value, key) order, so bin edges are integer-rank-exact with no
    float-boundary ambiguity — reporting each bin's population and
    value range.  Feature binning for training plus an equi-depth
    histogram readout in one pass.

    Scale: the window partitions by group, so each group sorts in
    parallel; for a single 100-TB global binning, swap ntile for
    histogram_quantile_report's mergeable bins (operators/sketches.py)
    and assign by boundary broadcast."""
    (orders,) = load(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderstatus").orderBy(
        "o_totalprice", "o_orderkey"
    )
    binned = orders.select(
        "o_orderstatus",
        "o_totalprice",
        F.ntile(10).over(w).cast("int").alias("bin"),
    )
    return binned.groupBy("o_orderstatus", "bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("lo"),
        F.round(F.max("o_totalprice"), 2).alias("hi"),
    )


@query(
    "report_embedding_drift",
    oracle="""
        WITH e AS (
            SELECT vec_id, label,
                   CASE WHEN vec_id % 3 = 0 THEN 2 ELSE 1 END AS ver,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        x AS (
            SELECT label, ver, CAST(t.i AS INT) AS pos, v[t.i] AS val
            FROM e, UNNEST(range(1, len(v) + 1)) AS t(i)
        ),
        m AS (SELECT label, ver, pos, avg(val) AS mv FROM x GROUP BY 1, 2, 3),
        n AS (
            SELECT label,
                   CAST(count(*) FILTER (ver = 1) AS BIGINT) AS n_v1,
                   CAST(count(*) FILTER (ver = 2) AS BIGINT) AS n_v2
            FROM e GROUP BY label
        ),
        p AS (
            SELECT a.label,
                   sum(a.mv * b.mv) AS dot,
                   sum(a.mv * a.mv) AS na,
                   sum(b.mv * b.mv) AS nb
            FROM m a JOIN m b ON a.label = b.label AND a.pos = b.pos
            WHERE a.ver = 1 AND b.ver = 2
            GROUP BY a.label
        )
        SELECT CAST(p.label AS INT) AS label, n.n_v1, n.n_v2,
               round(p.dot / (sqrt(p.na) * sqrt(p.nb)), 4) AS centroid_cosine
        FROM p JOIN n ON p.label = n.label
    """,
    tags=("north-star", "trainprep", "similarity", "report"),
)
def report_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between two snapshot epochs: per label, the
    cosine between the epoch centroids (v1 = vec_id % 3 != 0, v2 = the
    rest) plus both population counts — the embedding-modality member of
    the drift family (PSI / KL / KS / chi² cover value and category
    distributions; this one catches encoder or upstream-content shifts
    that leave scalar stats untouched).  A healthy re-embed shows
    centroid_cosine ≈ 1; drops flag label-level distribution movement.

    Scale: posexplode → (label, ver, dim) partial-avg is one shuffle of
    dim-sized aggregates (the 100 TB of vectors collapses map-side); the
    centroid cosine then reduces d rows per label — no vector ever
    reaches the driver."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    e = embeddings.withColumn(
        "ver", F.when(F.col("vec_id") % 3 == 0, F.lit(2)).otherwise(F.lit(1))
    )
    counts = e.groupBy("label").agg(
        F.count(F.when(F.col("ver") == 1, 1)).alias("n_v1"),
        F.count(F.when(F.col("ver") == 2, 1)).alias("n_v2"),
    )
    means = (
        e.select(
            "label", "ver", F.posexplode(F.col("embedding")).alias("pos", "val")
        )
        .groupBy("label", "ver", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("mv"))
    )
    a = means.where(F.col("ver") == 1).select(
        "label", "pos", F.col("mv").alias("m1")
    )
    b = means.where(F.col("ver") == 2).select(
        "label", "pos", F.col("mv").alias("m2")
    )
    sims = (
        a.join(b, ["label", "pos"])
        .groupBy("label")
        .agg(
            F.round(
                F.sum(F.col("m1") * F.col("m2"))
                / (
                    F.sqrt(F.sum(F.col("m1") * F.col("m1")))
                    * F.sqrt(F.sum(F.col("m2") * F.col("m2")))
                ),
                4,
            ).alias("centroid_cosine")
        )
    )
    return counts.join(sims, "label").select(
        F.col("label").cast("int").alias("label"),
        "n_v1",
        "n_v2",
        "centroid_cosine",
    )


_KC_K = 6


def _kc_dist(a: str, b: str) -> str:
    """Quantized squared euclidean distance — DuckDB replay of
    operators/similarity._dist2_micro (double element ops, floor·1e6)."""
    return (
        f"CAST(floor(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) "
        f"* (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))) * 1e6) AS BIGINT)"
    )


def _kc_round_sql(r: int) -> str:
    prev = f"d{r - 1}"
    return f"""
        c{r} AS MATERIALIZED (
            SELECT pid AS cid, v AS cv FROM {prev}
            ORDER BY dq DESC, pid LIMIT 1
        ),
        d{r} AS MATERIALIZED (
            SELECT p.pid, p.v, least(p.dq, {_kc_dist('p.v', f'c{r}.cv')}) AS dq
            FROM {prev} p, c{r}
        )"""


@query(
    "sample_kcenter_coreset",
    oracle=f"""
        WITH pts AS (SELECT vec_id AS pid, embedding AS v FROM embeddings),
        c0 AS MATERIALIZED (SELECT pid AS cid, v AS cv FROM pts ORDER BY pid LIMIT 1),
        d0 AS MATERIALIZED (
            SELECT p.pid, p.v, {_kc_dist('p.v', 'c0.cv')} AS dq FROM pts p, c0
        ),
        {",".join(_kc_round_sql(r) for r in range(1, _KC_K))},
        centers AS ({" UNION ALL ".join(f"SELECT {r} AS round_idx, cid, cv FROM c{r}" for r in range(_KC_K))}),
        assigned AS (
            SELECT p.pid, c.round_idx, c.cid,
                   {_kc_dist('p.v', 'c.cv')} AS dq,
                   row_number() OVER (
                       PARTITION BY p.pid
                       ORDER BY {_kc_dist('p.v', 'c.cv')} ASC, c.round_idx ASC
                   ) AS rn
            FROM pts p, centers c
        )
        SELECT CAST(round_idx AS BIGINT) AS round_idx,
               CAST(cid AS BIGINT) AS center_id,
               CAST(count(*) AS BIGINT) AS n_assigned,
               max(dq) AS max_dist2_micro
        FROM assigned WHERE rn = 1
        GROUP BY round_idx, cid
    """,
    tags=("training", "sampling", "coreset"),
)
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity coreset over the embedding corpus: greedy k-center
    (Gonzalez farthest-point, k=6) picks prototypes that SPAN the space
    — the diverse-subset selector for curation/annotation budgets, where
    uniform sampling oversamples dense modes and misses tails.  The
    greedy trajectory runs on integer-quantized distances so both
    engines walk the identical center sequence (see
    operators/similarity.kcenter_coreset); the oracle unrolls all six
    rounds declaratively and replays the nearest-center assignment."""
    from aws_genaric_datapipeline_spark.operators.similarity import (
        kcenter_coreset,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    return kcenter_coreset(embeddings, k=_KC_K)


@query(
    "text_bigram_lm_quality",
    oracle=f"""
        WITH base AS (
            SELECT doc_id AS did, (doc_id % 2 = 0) AS is_train, {_TOKS} AS toks
            FROM documents WHERE length(trim(text)) > 0
        ),
        tok AS (
            SELECT did, is_train, u.i AS pos, toks[u.i] AS tok
            FROM base, UNNEST(range(1, len(toks) + 1)) AS u(i)
        ),
        vocab AS (SELECT DISTINCT tok FROM tok WHERE is_train),
        vs AS (SELECT count(*) + 1 AS V FROM vocab),
        m AS (
            SELECT t.did, t.is_train, t.pos,
                   CASE WHEN v.tok IS NULL THEN '<unk>' ELSE t.tok END AS w
            FROM tok t LEFT JOIN vocab v USING (tok)
        ),
        bg AS (
            SELECT did, is_train,
                   coalesce(lag(w) OVER (PARTITION BY did ORDER BY pos),
                            '<s>') AS prev,
                   w
            FROM m
        ),
        cb AS (
            SELECT prev, w, count(*) AS cb FROM bg WHERE is_train GROUP BY 1, 2
        ),
        cx AS (SELECT prev, CAST(sum(cb) AS BIGINT) AS cx FROM cb GROUP BY 1),
        sc AS (
            SELECT bg.did,
                   CAST(floor(1e6 * ln((coalesce(cb.cb, 0) + 1)
                        / CAST(coalesce(cx.cx, 0) + vs.V AS DOUBLE)))
                       AS BIGINT) AS q
            FROM bg
            LEFT JOIN cb ON cb.prev = bg.prev AND cb.w = bg.w
            LEFT JOIN cx ON cx.prev = bg.prev
            CROSS JOIN vs
        ),
        doc AS (
            SELECT did, count(*) AS n_tokens, CAST(-sum(q) AS BIGINT) AS nll_q
            FROM sc GROUP BY did
        ),
        r AS (
            SELECT did, n_tokens, nll_q,
                   CAST(floor(nll_q / CAST(n_tokens AS DOUBLE)) AS BIGINT)
                       AS avg_nll_micro,
                   count(*) OVER () AS N
            FROM doc
        ),
        rr AS (
            SELECT *, row_number() OVER (ORDER BY avg_nll_micro, did) AS rn
            FROM r
        )
        SELECT did AS doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
               nll_q, avg_nll_micro,
               CASE CAST(1 + floor((rn - 1) * 3 / CAST(N AS DOUBLE)) AS INT)
                    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
               END AS ppl_band
        FROM rr
    """,
    tags=("north-star", "trainprep", "text", "curation"),
)
def text_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style trained-LM perplexity filter (Wenzek et al. 2020): an
    add-one-smoothed word-bigram LM is fit on the even-doc-id reference
    slice, every document is scored under it (scored-side OOV → <unk>),
    and documents band into head/middle/tail terciles of integer
    micro-nat mean NLL — the filter CCNet runs with a Wikipedia-trained
    KenLM before keeping only head+middle of Common Crawl.  The oracle
    replays training, scoring, quantization, and the tercile banding in
    full; banding uses scalable_global_rank (range partitions + census
    offsets), never a single-partition window."""
    (documents,) = load(spark, sf_dir, "documents")
    return P.bigram_lm_scores(documents, F.col("doc_id") % 2 == 0)


@query(
    "curate_dsir_importance",
    oracle=f"""
        WITH base AS (
            SELECT doc_id AS did, (lang = 'en') AS is_target, {_TOKS} AS toks
            FROM documents WHERE length(trim(text)) > 0
        ),
        tok AS (
            SELECT did, is_target, u.i AS pos, toks[u.i] AS tok
            FROM base, UNNEST(range(1, len(toks) + 1)) AS u(i)
        ),
        wp AS (
            SELECT did, is_target, tok,
                   lag(tok) OVER (PARTITION BY did ORDER BY pos) AS prev
            FROM tok
        ),
        feats AS (
            SELECT did, is_target, tok AS feat FROM wp
            UNION ALL
            SELECT did, is_target, prev || ' ' || tok AS feat
            FROM wp WHERE prev IS NOT NULL
        ),
        fb AS (
            SELECT did, is_target,
                   CAST(('0x' || substr(md5(feat), 1, 8)) AS BIGINT) % 1024
                       AS b
            FROM feats
        ),
        raw AS (SELECT b, count(*) AS cr FROM fb GROUP BY b),
        tgt AS (SELECT b, count(*) AS ct FROM fb WHERE is_target GROUP BY b),
        nr AS (SELECT CAST(sum(cr) AS BIGINT) AS Nr FROM raw),
        nt AS (SELECT CAST(sum(ct) AS BIGINT) AS Nt FROM tgt),
        w AS (
            SELECT raw.b,
                   CAST(floor(1e6 * (
                        ln((coalesce(tgt.ct, 0) + 1)
                           / CAST(nt.Nt + 1024 AS DOUBLE))
                        - ln((raw.cr + 1)
                           / CAST(nr.Nr + 1024 AS DOUBLE))
                   )) AS BIGINT) AS lw
            FROM raw LEFT JOIN tgt ON tgt.b = raw.b
            CROSS JOIN nr CROSS JOIN nt
        ),
        doc AS (
            SELECT did, count(*) AS n_features,
                   CAST(sum(lw) AS BIGINT) AS dsir_q
            FROM fb JOIN w USING (b) GROUP BY did
        ),
        r AS (
            SELECT *, count(*) OVER () AS N,
                   row_number() OVER (ORDER BY dsir_q DESC, did) AS rn
            FROM doc
        )
        SELECT did AS doc_id, n_features, dsir_q,
               (rn <= floor(N / 4)) AS keep
        FROM r
    """,
    tags=("north-star", "trainprep", "curation"),
)
def curate_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al. 2023):
    hashed unigram+bigram features (md5 → 1024 buckets, the repo's
    engine-portable hash), add-one-smoothed target (lang='en') vs raw
    bucket distributions, per-document quantized log importance ratio,
    keep = top quarter by score.  The oracle replays feature hashing,
    both distributions, the quantized log-ratio weights, scoring, and
    the rank-based selection in full."""
    (documents,) = load(spark, sf_dir, "documents")
    return P.dsir_importance(documents, F.col("lang") == "en")


@query(
    "curate_span_corruption",
    oracle=f"""
        WITH base AS (
            SELECT doc_id AS did, {_TOKS} AS toks FROM documents
            WHERE length(trim(text)) > 0
        ),
        tok AS (
            SELECT did, CAST(u.i AS INT) AS pos, toks[u.i] AS tok
            FROM base, UNNEST(range(1, len(toks) + 1)) AS u(i)
        ),
        t AS (
            SELECT did, pos, tok,
                   CASE WHEN CAST(('0x' || substr(
                            md5(did || ':' || (pos - 1)), 1, 8)) AS BIGINT)
                            % 20 = 0
                        THEN 1 ELSE 0 END AS trig
            FROM tok
        ),
        m AS (
            SELECT *,
                   max(trig) OVER (PARTITION BY did ORDER BY pos
                       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1
                       AS masked
            FROM t
        ),
        r AS (
            SELECT *,
                   masked AND NOT coalesce(
                       lag(masked) OVER (PARTITION BY did ORDER BY pos),
                       false) AS run_start
            FROM m
        ),
        rr AS (
            SELECT *,
                   sum(CASE WHEN run_start THEN 1 ELSE 0 END)
                       OVER (PARTITION BY did ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS run_id
            FROM r
        ),
        pieces AS (
            SELECT did, pos, masked, run_start,
                   CASE WHEN NOT masked THEN tok
                        WHEN run_start
                        THEN '<extra_id_' || (run_id - 1) || '>'
                   END AS in_piece,
                   CASE WHEN masked AND run_start
                        THEN '<extra_id_' || (run_id - 1) || '>' || ' ' || tok
                        WHEN masked THEN tok
                   END AS tgt_piece
            FROM rr
        )
        SELECT did AS doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_masked,
               CAST(sum(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_spans,
               md5(coalesce(string_agg(in_piece, ' ' ORDER BY pos), ''))
                   AS inputs_md5,
               md5(coalesce(string_agg(tgt_piece, ' ' ORDER BY pos), ''))
                   AS targets_md5
        FROM pieces GROUP BY did
    """,
    tags=("north-star", "trainprep", "text"),
)
def curate_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020): ~15% of tokens
    masked in mean-3 spans, inputs with per-span <extra_id_k> sentinels,
    targets carrying the masked content — the denoising-objective prep
    pass.  The noise is a pure md5 function of (doc_id, position), so
    BOTH corrupted streams are deterministic and the oracle replays
    trigger positions, span merging, sentinel numbering, and both md5
    streams exactly."""
    (documents,) = load(spark, sf_dir, "documents")
    return P.span_corruption(documents)
