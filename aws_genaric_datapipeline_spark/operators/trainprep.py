"""Training-data preparation operators: context-window chunking, sequence
packing, unigram-LM perplexity scoring, corpus mixing, embedding
compression.

These are the steps between a curated corpus and a training run:

- ``chunk_token_windows`` — split documents into overlapping token windows
  sized for a model's context length.
- ``pack_token_bins``     — assign documents to fixed token budgets
  (sequence packing) with a deterministic running-sum rule.
- ``unigram_logprob``     — corpus-unigram-LM negative log-likelihood per
  document (the classic perplexity quality filter).
- ``mix_ratios``          — per-stratum sampling rates that hit a target
  corpus mixture.
- ``quantize_int8``       — per-vector symmetric int8 quantization with
  reconstruction-error reporting.
- ``random_projection``   — deterministic Johnson-Lindenstrauss projection
  to a lower dimension.

Scale notes: chunking and quantization are narrow maps (no shuffle);
packing is one window over the ordering key; the unigram LM is one
aggregation to build the (broadcastable) vocabulary and one map-side join
to score — nothing here materializes to the driver except the vocab table
when it is broadcast.

Reference parity: none of this exists in the reference (SURVEY.md §2b
north-star rows) — it is the LLM-pipeline extension surface.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from aws_genaric_datapipeline_spark.operators.text import tokens


def chunk_token_windows(
    df: DataFrame,
    size: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token windows: chunk i covers tokens [i·stride,
    i·stride + size).  The final partial window is kept when it holds at
    least one token not covered by a previous chunk (standard context-
    window prep).  Pure array expressions — sequence + transform + explode,
    no UDF, no shuffle; work is proportional to output tokens.

    Returns (id, chunk_idx, n_tokens, chunk_text).
    """
    if stride <= 0 or size <= 0 or stride > size:
        raise ValueError("need 0 < stride <= size")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(n - size, 0) / stride); 0 when no tokens
    n_chunks = F.when(
        n <= 0, F.lit(0)
    ).otherwise(
        F.lit(1) + F.ceil((F.greatest(n - size, F.lit(0))) / F.lit(stride)).cast("int")
    )
    chunked = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice(toks, i * stride + 1, size),
            )
        ).alias("chunk_idx", "chunk_toks"),
    ).where(F.size("chunk_toks") > 0)
    return chunked.select(
        id_col,
        "chunk_idx",
        F.size("chunk_toks").alias("n_tokens"),
        F.array_join("chunk_toks", " ").alias("chunk_text"),
    )


def pack_token_bins(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str | None = None,
) -> DataFrame:
    """Sequence packing: assign documents (ordered by id within a stratum)
    to consecutive bins of at most ``budget`` tokens, greedily — a document
    that would overflow the current bin starts the next one.  Deterministic
    by construction (pure function of the id ordering), so packing is
    reproducible across runs and engines.

    The greedy rule is expressed as a running quantity: doc d starts a new
    bin iff the running token total within its bin would exceed the budget.
    An exact sequential greedy scan is inherently order-dependent; this
    uses the bin_id = floor(cumulative_tokens / budget) relaxation — the
    standard distributed approximation: same asymptotic packing density,
    one window (single shuffle on the stratum key), no sequential pass.
    Documents longer than the budget get their own bin id (they must be
    chunked first — chunk_token_windows).

    Returns (id, [stratum], n_tokens, bin_id).
    """
    part = [strata_col] if strata_col else []
    w = Window.partitionBy(*part).orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n_toks = F.size(tokens(F.col(text_col)))
    out = df.select(
        *([F.col(strata_col)] if strata_col else []),
        F.col(id_col),
        n_toks.alias("n_tokens"),
    ).withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.lit(1)) / F.lit(budget)).cast("bigint"),
    )
    return out


def unigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    precision: int = 4,
) -> DataFrame:
    """Per-document mean negative log-probability under the corpus unigram
    LM (add-nothing MLE over the full corpus) — the classic perplexity
    quality filter: degenerate/boilerplate docs score low, rare-token noise
    scores high; both tails get cut.

    Scale: vocab = one groupBy over (token) → broadcast (vocabularies are
    ~millions of rows, far under broadcast limits after hashing); scoring
    is a map-side join + per-doc aggregation — one shuffle on doc id.

    Returns (id, n_tokens, avg_neg_logprob) for docs with ≥1 token.
    """
    tok = df.select(F.col(id_col).alias("did"), F.explode(tokens(F.col(text_col))).alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    total = vocab.agg(F.sum("tf").cast("double").alias("total"))
    scored = (
        tok.join(F.broadcast(vocab), "tok")
        .crossJoin(F.broadcast(total))
        .select("did", (-F.log(F.col("tf") / F.col("total"))).alias("nll"))
    )
    return scored.groupBy("did").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("nll"), precision).alias("avg_neg_logprob"),
    ).select(F.col("did").alias(id_col), "n_tokens", "avg_neg_logprob")


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
) -> DataFrame:
    """Temperature-smoothed mixture weights: w_s ∝ sqrt(n_s) — the α = 0.5
    exponent-smoothing the multilingual-pretraining literature applies so
    high-resource languages stop drowning the tail (natural share n_s/N is
    α = 1; uniform is α = 0).  Unlike ``mix_ratios`` the target mixture is
    DERIVED from the data, not supplied.

    α is pinned to 0.5 because sqrt is the one fractional power IEEE 754
    requires to be correctly rounded — Spark's JVM and any replaying
    engine (DuckDB libm) produce bit-identical sqrt, whereas pow(n, 0.3)
    may differ in the last ulp between libms and break value-replay.

    Returns (stratum, n_docs, weight_bp, boost_bp):
      weight_bp = floor(10000 · sqrt(n_s) / Σ sqrt(n_t)) — the target share;
      boost_bp  = floor(10000 · w_s / (n_s / N)) — the up/down-weighting
                  factor vs natural share (>10000 means the stratum is
                  upsampled relative to its natural frequency).

    Driver-sized output (one row per stratum); the weights feed
    ``mix_ratios``/``stratified_sample`` downstream.  At 100 TB this is
    one partial-aggregate scan plus a 1-row broadcast."""
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    totals = counts.agg(
        F.sum(F.sqrt(F.col("n_docs"))).alias("z"),
        F.sum("n_docs").alias("n"),
    )
    w = F.sqrt(F.col("n_docs")) / F.col("z")
    # Boundary guard: Σ sqrt(n_t) is a float sum whose fold order differs
    # between engines by ~1 ulp.  When strata counts are EQUAL, 10000·w
    # lands exactly on an integer and that ulp decides the floor — the
    # epsilon absorbs it (and cannot move a non-boundary value: weights
    # are quotients of irrationals otherwise, never within 1e-6 of an
    # integer by accident at bp granularity).
    eps = F.lit(1e-6)
    return counts.crossJoin(F.broadcast(totals)).select(
        "stratum",
        "n_docs",
        F.floor(F.lit(10000) * w + eps).cast("bigint").alias("weight_bp"),
        F.floor(
            F.lit(10000) * w / (F.col("n_docs") / F.col("n").cast("double"))
            + eps
        )
        .cast("bigint")
        .alias("boost_bp"),
    )


def mix_ratios(
    df: DataFrame,
    strata_col: str,
    targets: dict[str, float],
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-mixing plan: per stratum, the sampling rate (basis points)
    that reshapes the corpus toward ``targets`` (shares summing to ≤1)
    without upsampling — the stratum that binds at rate 1.0 anchors the
    achievable total, everything else downsamples proportionally.

    total_achievable = min over strata of n_s / share_s; then
    rate_s = total_achievable · share_s / n_s  (≤ 1 by construction).

    Returns (stratum, n_docs, rate_bp, n_kept) — n_kept = floor(n·rate).
    Driver-sized aggregation (one row per stratum); the plan is then
    applied with deterministic_sample / stratified_sample.
    """
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    share = F.lit(None).cast("double")
    for value, s in targets.items():
        share = F.when(F.col("stratum") == value, F.lit(float(s))).otherwise(share)
    with_share = counts.withColumn("share", share).where(F.col("share").isNotNull())
    # min over strata of n_s / share_s — a scalar; computed with one extra
    # tiny aggregation and a cross join of the 1-row result (stratum counts
    # are driver-sized by definition)
    anchor = with_share.agg(F.min(F.col("n_docs") / F.col("share")).alias("anchor"))
    return (
        with_share.crossJoin(F.broadcast(anchor))
        .select(
            "stratum",
            "n_docs",
            F.floor(F.lit(10000) * F.col("anchor") * F.col("share") / F.col("n_docs"))
            .cast("bigint")
            .alias("rate_bp"),
            F.floor(
                F.col("n_docs")
                * F.floor(F.lit(10000) * F.col("anchor") * F.col("share") / F.col("n_docs"))
                / F.lit(10000)
            )
            .cast("bigint")
            .alias("n_kept"),
        )
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    precision: int = 4,
) -> DataFrame:
    """Per-vector symmetric int8 quantization: scale = max|x| / 127,
    q_i = round(x_i / scale).  Returns the quantized vector plus
    reconstruction-error stats — the compression step before shipping
    embeddings to an ANN index or feature store (4x smaller than float32).

    Pure array expressions (transform/aggregate) — a narrow map, no
    shuffle, fully pushed into the scan stage.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    max_abs = F.array_max(F.transform(v, F.abs))
    scale = max_abs / F.lit(127.0)
    q = F.when(max_abs == 0, F.transform(v, lambda x: F.lit(0).cast("int"))).otherwise(
        F.transform(v, lambda x: F.round(x / scale).cast("int"))
    )
    err = F.when(max_abs == 0, F.lit(0.0)).otherwise(
        F.array_max(
            F.zip_with(v, q, lambda x, qi: F.abs(x - qi.cast("double") * scale))
        )
    )
    return df.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        q.alias("qvec"),
        F.round(err, precision).alias("max_abs_err"),
    )


def random_projection(
    df: DataFrame,
    out_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    in_dim: int = 64,
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction with a deterministic
    pseudo-random Gaussian-ish projection (the same splitmix64 hyperplane
    family as the LSH operators, scaled by 1/sqrt(out_dim)).  Distances are
    preserved within (1±ε) w.h.p. — asserted against brute-force pairwise
    distances in tests.

    One Arrow-batched matmul per batch (the projection matrix rides in the
    closure), no shuffle.
    """
    import numpy as np
    import pandas as pd

    from aws_genaric_datapipeline_spark.operators.similarity import _hyperplane

    # components are ~uniform[-1,1] (variance 1/3), so the JL normalizer is
    # sqrt(3/out_dim) — makes E[|Px|^2] = |x|^2 like a Gaussian projection
    pm = np.array(
        [_hyperplane(in_dim, 7919 + j) for j in range(out_dim)], dtype=np.float64
    ) * np.sqrt(3.0 / out_dim)

    def _proj(v):
        if len(v) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack(v.to_numpy()).astype(np.float64)
        d = min(mat.shape[1], in_dim)
        out = mat[:, :d] @ pm[:, :d].T
        return pd.Series(list(out))

    proj = F.pandas_udf(_proj, "array<double>")
    return df.select(F.col(id_col), proj(F.col(vec_col)).alias("proj_vec"))


def scalable_global_rank(
    df: DataFrame,
    order_cols: list[str],
    num_ranges: int = 32,
) -> DataFrame:
    """Dense global position over ``order_cols`` WITHOUT a single-partition
    window: range-partition on the ordering key, per-partition row_number,
    plus a broadcast per-partition offset from the tiny partition census —
    the same shape link_sorted_neighborhood uses.  Requires ``order_cols``
    to be a UNIQUE key so the rank is a pure function of the data
    (identical whatever range boundaries repartitionByRange samples).

    Returns ``df`` plus a ``pos`` column (1-based).  Scale: one range
    shuffle + in-partition sort — the cost class of any global-order op.

    The range-partitioned frame feeds TWO plan branches (the partition
    census and the per-partition row_number join).  repartitionByRange
    SAMPLES its boundaries, so the branches must share one physical
    materialization — relying on Spark's exchange reuse is fragile
    (spark.sql.exchange.reuse off, or AQE re-planning one branch, would
    give the census and the local ranks DIFFERENT __pid layouts and
    corrupt every offset).  localCheckpoint pins a single layout; its
    cost is the same shuffle-write the exchange already pays."""
    parts = (
        df.repartitionByRange(num_ranges, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    census = (
        parts.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__offset",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__offset")
    )
    lw = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        parts.withColumn("__local", F.row_number().over(lw))
        .join(F.broadcast(census), "__pid")
        .withColumn("pos", (F.col("__local") + F.col("__offset")).cast("bigint"))
        .drop("__pid", "__local", "__offset")
    )


def bigram_lm_scores(
    df: DataFrame,
    train_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style TRAINED-LM quality filter (Wenzek et al. 2020): fit an
    add-one-smoothed word-bigram language model on a reference slice of the
    corpus (``train_pred``), score EVERY document's negative log-likelihood
    under it, and band documents into head/middle/tail perplexity terciles
    — the filter CCNet applies with a Wikipedia-trained KenLM before
    keeping only the head/middle of Common Crawl.

    Differs from ``unigram_logprob`` (unsmoothed MLE over the full corpus,
    no train/score split) exactly where CCNet differs from a frequency
    filter: the model is trained on a REFERENCE slice, so out-of-domain
    and out-of-vocabulary text scores poorly even when it is frequent in
    the scored corpus.

    Model: vocabulary = distinct reference tokens (scored-side OOV maps to
    ``<unk>``); contexts get a ``<s>`` sentinel at position 0;
    p(w | prev) = (c(prev,w) + 1) / (c(prev) + V) with V = |vocab| + 1.
    Per-bigram log-probs are quantized floor(1e6·ln p) so the per-document
    sums — and therefore the tercile band boundaries — are integer-exact
    across engines.

    Returns (id, n_tokens, nll_q, avg_nll_micro, ppl_band) for documents
    with ≥1 token; ``nll_q`` = −Σ floor(1e6·ln p) (positive, micro-nats),
    ``avg_nll_micro`` = floor(nll_q / n_tokens), ``ppl_band`` ∈
    {head, middle, tail} by ascending avg_nll_micro (doc-id tie-break),
    band of rank pos = 1 + floor((pos−1)·3/N) — ceil-style partitions,
    so at non-divisible N the EARLIER bands hold the extra ranks (N=4:
    head = ranks {1, 2}).

    Scale: bigram pairs are built as array expressions (tokens zipped
    against their <s>-prefixed shift), so there is NO per-token lag
    window and no doc-id shuffle before aggregation; the vocab and the
    bigram/context count tables are broadcast (aggregation outputs,
    vastly smaller than the corpus; swap to a shuffle join past ~100M
    distinct bigrams); per-doc scoring is one groupBy on the doc id; the
    tercile banding uses scalable_global_rank — no single-partition
    window anywhere."""
    base = df.select(
        F.col(id_col).alias("did"),
        train_pred.alias("is_train"),
        tokens(F.col(text_col)).alias("toks"),
    ).where(F.size("toks") > 0)
    # bigram pairs built as array expressions (zip tokens against their
    # <s>-prefixed shift) — no posexplode+lag window, so the per-token
    # doc-id shuffle the window would force never happens
    pair = F.zip_with(
        F.concat(
            F.array(F.lit("<s>")),
            F.slice(F.col("toks"), 1, F.size("toks") - 1),
        ),
        F.col("toks"),
        lambda p, c: F.struct(p.alias("prev_raw"), c.alias("cur_raw")),
    )
    bg_raw = base.select(
        "did", "is_train", F.explode(pair).alias("p")
    ).select("did", "is_train", "p.prev_raw", "p.cur_raw")
    vocab = (
        base.where("is_train")
        .select(F.explode("toks").alias("tok"))
        .distinct()
    )
    vs = vocab.agg((F.count(F.lit(1)) + 1).alias("V"))
    known = F.broadcast(vocab.withColumn("__known", F.lit(True)))
    bg = (
        bg_raw.join(known.withColumnRenamed("tok", "cur_raw"), "cur_raw", "left")
        .withColumn(
            "w",
            F.when(F.col("__known"), F.col("cur_raw")).otherwise(F.lit("<unk>")),
        )
        .drop("__known")
        .join(known.withColumnRenamed("tok", "prev_raw"), "prev_raw", "left")
        .withColumn(
            "prev",
            F.when(F.col("prev_raw") == "<s>", F.lit("<s>"))
            .when(F.col("__known"), F.col("prev_raw"))
            .otherwise(F.lit("<unk>")),
        )
        .select("did", "is_train", "prev", "w")
        # bg fans out (train counts + full-corpus scoring): pin it so the
        # tokenize+zip+unk-map chain runs once, not once per consumer —
        # at 100 TB the dominant scan must not multiply
        .localCheckpoint(eager=True)
    )
    cb = bg.where("is_train").groupBy("prev", "w").agg(
        F.count(F.lit(1)).alias("cb")
    )
    cx = cb.groupBy("prev").agg(F.sum("cb").alias("cx"))
    q = F.floor(
        F.lit(1e6)
        * F.log(
            (F.coalesce(F.col("cb"), F.lit(0)) + 1)
            / (F.coalesce(F.col("cx"), F.lit(0)) + F.col("V")).cast("double")
        )
    ).cast("bigint")
    scored = (
        bg.join(F.broadcast(cb), ["prev", "w"], "left")
        .join(F.broadcast(cx), "prev", "left")
        .crossJoin(F.broadcast(vs))
        .select("did", q.alias("q"))
    )
    doc = scored.groupBy("did").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (-F.sum("q")).cast("bigint").alias("nll_q"),
    ).withColumn(
        "avg_nll_micro",
        F.floor(F.col("nll_q") / F.col("n_tokens").cast("double")).cast("bigint"),
    ).localCheckpoint(eager=True)  # fans out to the census rank + N
    n_total = doc.agg(F.count(F.lit(1)).alias("N"))
    ranked = scalable_global_rank(doc, ["avg_nll_micro", "did"]).crossJoin(
        F.broadcast(n_total)
    )
    band_id = 1 + F.floor(
        (F.col("pos") - 1) * 3 / F.col("N").cast("double")
    ).cast("int")
    return ranked.select(
        F.col("did").alias(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "nll_q",
        "avg_nll_micro",
        F.when(band_id == 1, "head")
        .when(band_id == 2, "middle")
        .otherwise("tail")
        .alias("ppl_band"),
    )


def dsir_importance(
    df: DataFrame,
    target_pred: Column,
    num_buckets: int = 1024,
    keep_denom: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al. 2023):
    score every document by the log importance ratio of a TARGET-domain
    hashed n-gram model over the RAW-corpus model, then keep the top
    1/``keep_denom`` — the lightweight alternative to classifier-based
    quality filtering that steers a 100 TB crawl toward a target domain
    with two aggregate scans and a broadcast join.

    Features: word unigrams and adjacent-pair bigrams, hashed into
    ``num_buckets`` buckets via the first 8 hex chars of md5 (the
    engine-portable hash the md5-bucket samplers share).  Both the target
    and raw feature distributions are add-one smoothed over the bucket
    space; per-bucket log-weights are quantized
    floor(1e6·(ln p_target − ln p_raw)) so document scores are
    integer-exact across engines.

    Returns (id, n_features, dsir_q, keep): ``dsir_q`` = Σ per-feature
    quantized log-ratio (higher = more target-like), ``keep`` = document
    ranks in the top floor(N/keep_denom) by (dsir_q DESC, id).

    Scale: the bucket-weight table is ≤ num_buckets rows (broadcast);
    feature arrays (unigrams ++ zipped bigrams) explode linearly in
    corpus tokens with no lag window and no doc-id shuffle before the
    per-doc groupBy; selection uses scalable_global_rank — no
    single-partition window, no driver collect."""
    base = df.select(
        F.col(id_col).alias("did"),
        target_pred.alias("is_target"),
        tokens(F.col(text_col)).alias("toks"),
    ).where(F.size("toks") > 0)
    # adjacent-pair bigram strings as one array expression (tokens zipped
    # against their shift) — no posexplode+lag window, no doc-id shuffle
    bigrams = F.zip_with(
        F.slice(F.col("toks"), 1, F.size("toks") - 1),
        F.slice(F.col("toks"), 2, F.size("toks") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    feats = base.select(
        "did",
        "is_target",
        F.explode(F.concat(F.col("toks"), bigrams)).alias("feat"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("feat")), 1, 8), 16, 10).cast("bigint")
        % num_buckets
    )
    # fb fans out three ways (raw counts, target counts, doc scoring) —
    # eagerly pin it so tokenize+hash run once, not three times
    fb = feats.select("did", "is_target", bucket.alias("b")).localCheckpoint(
        eager=True
    )
    raw = fb.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = fb.where("is_target").groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    # totals via two tiny aggs (bucket tables are <= num_buckets rows)
    nr = raw.agg(F.sum("cr").alias("Nr"))
    nt = tgt.agg(F.sum("ct").alias("Nt"))
    weights = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nt))
        .select(
            "b",
            F.floor(
                F.lit(1e6)
                * (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                        / (F.col("Nt") + num_buckets).cast("double")
                    )
                    - F.log(
                        (F.col("cr") + 1)
                        / (F.col("Nr") + num_buckets).cast("double")
                    )
                )
            )
            .cast("bigint")
            .alias("lw"),
        )
    )
    doc = (
        fb.join(F.broadcast(weights), "b")
        .groupBy("did")
        .agg(
            F.count(F.lit(1)).alias("n_features"),
            F.sum("lw").cast("bigint").alias("dsir_q"),
        )
    )
    n_total = doc.agg(F.count(F.lit(1)).alias("N"))
    ranked = scalable_global_rank(
        doc.withColumn("neg_q", -F.col("dsir_q")), ["neg_q", "did"]
    ).crossJoin(F.broadcast(n_total))
    return ranked.select(
        F.col("did").alias(id_col),
        F.col("n_features").cast("bigint").alias("n_features"),
        "dsir_q",
        (F.col("pos") <= F.floor(F.col("N") / keep_denom)).alias("keep"),
    )


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    trigger_mod: int = 20,
    span_len: int = 3,
) -> DataFrame:
    """T5-style span-corruption preprocessing (Raffel et al. 2020): mask
    ~15% of each document's tokens in short spans, emit the corrupted
    INPUT stream (each masked span collapsed to one ``<extra_id_k>``
    sentinel) and the TARGET stream (sentinels followed by the masked
    tokens) — the last transform before a denoising-objective training
    run.

    The "randomness" is a deterministic hash: position i starts a span
    iff md5(id:i) mod ``trigger_mod`` = 0 (≈5% of positions), and a span
    covers ``span_len`` tokens, so ~15% of tokens mask; overlapping
    spans merge into maximal runs numbered in document order.  Because
    the noise is a pure function of (id, position), the exact corrupted
    pair is replayable by any engine — reproducible training data, no
    RNG state to ship.

    Returns (id, n_tokens, n_masked, n_spans, inputs_md5, targets_md5)
    for documents with ≥1 token; the md5s pin both streams end to end.

    Scale: tokenize/explode is linear; masking/run-numbering are three
    frames over one window partitioned by doc id (ONE shuffle); the md5
    roll-up reuses the same partitioning."""
    base = df.select(
        F.col(id_col).alias("did"), tokens(F.col(text_col)).alias("toks")
    ).where(F.size("toks") > 0)
    tok = base.select("did", F.posexplode("toks").alias("pos", "tok"))
    trigger = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("did"), F.col("pos"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % trigger_mod
        == 0
    )
    seq = Window.partitionBy("did").orderBy("pos")
    back = seq.rowsBetween(-(span_len - 1), 0)
    run = seq.rowsBetween(Window.unboundedPreceding, 0)
    t = tok.withColumn("trig", trigger.cast("int"))
    m = t.withColumn("masked", F.max("trig").over(back) == 1)
    r = m.withColumn(
        "run_start",
        F.col("masked")
        & ~F.coalesce(F.lag("masked").over(seq), F.lit(False)),
    ).withColumn("run_id", F.sum(F.col("run_start").cast("int")).over(run))
    sentinel = F.concat(
        F.lit("<extra_id_"),
        (F.col("run_id") - 1).cast("string"),
        F.lit(">"),
    )
    in_piece = F.when(~F.col("masked"), F.col("tok")).when(
        F.col("run_start"), sentinel
    )  # masked non-start rows yield NULL → dropped from the input stream
    tgt_piece = F.when(
        F.col("masked") & F.col("run_start"),
        F.concat(sentinel, F.lit(" "), F.col("tok")),
    ).when(F.col("masked"), F.col("tok"))
    stream = lambda piece: F.array_join(  # noqa: E731
        F.transform(
            F.filter(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("pos"), piece.alias("p"))
                    )
                ),
                lambda s: s["p"].isNotNull(),
            ),
            lambda s: s["p"],
        ),
        " ",
    )
    per_doc = r.groupBy("did").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.col("masked").cast("bigint")).alias("n_masked"),
        F.sum(F.col("run_start").cast("bigint")).alias("n_spans"),
        F.md5(stream(in_piece)).alias("inputs_md5"),
        F.md5(stream(tgt_piece)).alias("targets_md5"),
    )
    return per_doc.select(
        F.col("did").alias(id_col),
        "n_tokens",
        "n_masked",
        "n_spans",
        "inputs_md5",
        "targets_md5",
    )
