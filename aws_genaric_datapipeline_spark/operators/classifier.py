"""Trained quality classifier: distributed logistic regression inside
DataFrame aggregates.

The model-in-the-loop curation step (FineWeb-Edu style) the heuristic
gates in operators/text.py (gopher rules, entropy, unigram-LM) lead up
to: train a linear classifier over hashed bag-of-token features with
batch gradient descent, then apply it as a scoring operator over the
corpus.  The entire computation is DataFrame-shaped:

- features: one explode + groupBy builds sparse (doc, bucket, count)
  counts of md5-hashed whitespace tokens (md5, not xxhash64,
  deliberately: it is ENGINE-PORTABLE, same choice as
  operators/dedup.simhash, so an oracle replays feature hashing
  bit-exactly); counts are then mean-CENTERED per bucket and rescaled —
  raw counts leave GD badly conditioned (the intercept starves; round-9
  prototyping diverged at every eta), centered features hit 97%+
  training accuracy in 5 rounds;
- per GD iteration: ONE join-aggregate computes every margin, ONE
  join-aggregate computes the full gradient vector.  Only the
  (num_buckets+1)-row gradient ever reaches the driver — the same
  bounded scalar-per-round discipline as graph.py's convergence checks;
- weights broadcast back each round (a frame of num_buckets+1 rows).

EXACTNESS: everything is integer fixed-point (scale ``FP_SCALE``).  The
sigmoid is the rational approximation

    sigma(x) = 0.5 + x / (2 * (1 + |x|))        (in (0, 1), monotone)

whose fixed-point form  (S*(S + |m| + m)) div (2*(S + |m|))  has a
non-negative numerator and positive denominator, so integer division is
floor division in BOTH Spark (`div`) and DuckDB (`//`).  Centered
features are integers by construction (truncate-toward-zero of
FEAT_SCALE*(N*cnt - total) / N — bounded by FEAT_SCALE*max_count
regardless of corpus size, so no overflow at scale), gradients are
integer sums (order-independent, exact across any shuffle), and weight
updates use the same explicit truncate-toward-zero division.
Consequence: training is BIT-DETERMINISTIC — a DuckDB oracle unrolling
the same iterations reproduces weights, margins, and scores exactly,
with no float-summation-noise caveat (contrast _pq_oracle_sql's round-4
band).

Scale: per iteration the 100 TB corpus is scanned once for margins and
once for gradients (both partial-aggregate map-side); driver state is
the weight vector (KBs).  Iterations are FIXED (no data-dependent
convergence test), so the job graph is static and replayable.  The
dense doc x bucket grid multiplies rows by (num_buckets+1) — keep
num_buckets modest (the default 32 is plenty for quality signals) or
swap the grid for the sparse counts + per-bucket offset rewrite when
the feature space grows.

Reference: kaleshkk/aws-genaric-datapipeline has no model training; this
extends the curation surface beyond the reference per the build brief.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from aws_genaric_datapipeline_spark.operators.partitioning import ensure_parallelism
from aws_genaric_datapipeline_spark.operators.text import tokens

# Fixed-point scale for weights, sigmoid outputs, and residuals.
FP_SCALE = 1_000_000
# Scale of centered feature values (and of the constant bias feature).
FEAT_SCALE = 1_000


def _bucket(tok: Column, num_buckets: int) -> Column:
    """Engine-portable feature hash: first 8 md5 hex digits as a 32-bit
    integer, mod num_buckets (non-negative, so % == pmod)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint") % num_buckets
    )


@dataclass(frozen=True)
class CenteringStats:
    """Frozen feature-centering statistics: corpus size and per-bucket
    token totals captured at TRAINING time.  Scoring a new batch (an
    ingest stream, a later snapshot) must center with the TRAINING
    corpus's means — re-deriving means from the batch would shift every
    feature and silently change scores.  Pair with LogRegModel the way
    any production model ships its preprocessing statistics."""

    n: int
    totals: tuple[int, ...]  # per bucket 0..D-1


def centering_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
) -> CenteringStats:
    """Capture CenteringStats from a training corpus (one explode+agg)."""
    counts = (
        df.select(
            F.col(id_col).alias("did"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .groupBy(_bucket(F.col("tok"), num_buckets).alias("j"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("total"))
        .collect()
    )
    by_j = {r["j"]: r["total"] for r in counts}
    return CenteringStats(
        n=df.count(), totals=tuple(by_j.get(j, 0) for j in range(num_buckets))
    )


def centered_token_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 32,
    stats: CenteringStats | None = None,
) -> DataFrame:
    """(did, j, x) integer feature grid for logistic regression.

    Buckets 0..D-1 carry the mean-centered hashed-token count

        x_j = (FEAT_SCALE * (N*cnt_j - total_j)) div N        (trunc)

    — i.e. ~FEAT_SCALE*(cnt_j - mean_j), exact integers, emitted for
    EVERY (doc, bucket) cell (centering makes zero counts informative).
    Bucket D is the constant bias feature x = FEAT_SCALE.  The value is
    bounded by FEAT_SCALE*max_count independent of N, so margins and
    gradients stay far from BIGINT range at any corpus size.

    With ``stats`` (CenteringStats from the TRAINING corpus), centering
    uses the frozen training means — the production ingest-scoring form,
    where a new batch must not re-derive its own means (see
    CenteringStats).  Without it, means come from ``df`` itself (the
    training pass).

    One explode+groupBy for counts, one D-row broadcast of totals, one
    broadcast cross join to densify — the corpus shuffles once."""
    d = F.lit(num_buckets)
    counts = (
        df.select(
            F.col(id_col).alias("did"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .groupBy("did", _bucket(F.col("tok"), num_buckets).alias("j"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    spark_ = df.sparkSession
    if stats is not None:
        n = stats.n
        totals = spark_.createDataFrame(
            list(enumerate(stats.totals)), "j bigint, total bigint"
        )
    else:
        n = df.count()
        totals = counts.groupBy("j").agg(
            F.sum("cnt").cast("bigint").alias("total")
        )
    spark = df.sparkSession
    grid = spark.range(num_buckets).select(F.col("id").cast("bigint").alias("j"))
    dense = (
        df.select(F.col(id_col).alias("did"))
        .crossJoin(F.broadcast(grid))
        .join(counts, ["did", "j"], "left")
        .join(F.broadcast(totals), "j", "left")
        .select(
            "did",
            "j",
            F.expr(
                f"CAST(({FEAT_SCALE} * ({n} * coalesce(cnt, 0) - coalesce(total, 0)))"
                f" div {n} AS BIGINT)"
            ).alias("x"),
        )
    )
    bias = df.select(
        F.col(id_col).alias("did"),
        d.cast("bigint").alias("j"),
        F.lit(FEAT_SCALE).cast("bigint").alias("x"),
    )
    return dense.unionByName(bias)


def sig_fp_expr(m_col: str) -> str:
    """SQL fragment (Spark dialect) for the fixed-point sigmoid; the
    numerator is non-negative so `div` (trunc) == floor, matching the
    DuckDB `//` replay."""
    S = FP_SCALE
    return (
        f"CAST(({S} * ({S} + abs({m_col}) + {m_col})) "
        f"div (2 * ({S} + abs({m_col}))) AS BIGINT)"
    )


def _trunc_div(a: int, b: int) -> int:
    """Truncate-toward-zero integer division for positive b — matches
    the CASE-wrapped floor division the oracle SQL uses."""
    return -((-a) // b) if a < 0 else a // b


@dataclass(frozen=True)
class LogRegModel:
    """Trained fixed-point weights: w_fp[j] for j in 0..D (D = bias)."""

    num_buckets: int
    weights_fp: tuple[int, ...]
    iters: int
    eta_num: int
    eta_den: int
    l2_num: int = 0
    l2_den: int = 1


def train_logreg(
    spark: SparkSession,
    feat: DataFrame,
    labels: DataFrame,
    num_buckets: int = 32,
    iters: int = 5,
    eta_num: int = 1,
    eta_den: int = 2**20,
    l2_num: int = 0,
    l2_den: int = 1,
    init_weights: tuple[int, ...] | None = None,
) -> LogRegModel:
    """Batch GD for logistic regression over an integer feature frame.

    feat: (did, j, x) from centered_token_features; labels: (did, y)
    with y in {0,1}.  Learning rate eta_num/eta_den, optional L2 with
    strength l2_num/l2_den (the penalty term enters the gradient as
    trunc(l2 * w * N), keeping the update integer-exact).  Per
    iteration: margins (one join-agg), residuals, gradient (one
    join-agg, D+1 rows collected), driver-side integer weight update.
    Deterministic: same inputs => same weights, bit-for-bit, regardless
    of partitioning.  ``init_weights`` WARM-STARTS from a prior model
    (periodic re-training on a drifted corpus), and determinism composes:
    train(k) then warm-start train(m) == train(k+m) exactly — asserted in
    tests — so checkpoint/resume of training is a pure refactor of the
    job graph, never a numeric change."""
    S = FP_SCALE
    n = labels.count()
    if n == 0:
        raise ValueError("empty training set")
    # Feature and label frames are re-joined every round — cut lineage
    # once so the per-iteration plans stay shallow (same discipline as
    # graph.py rounds); blocks free with the frames.
    feat = ensure_parallelism(feat).localCheckpoint(eager=True)
    labels = labels.select(
        "did", F.col("y").cast("bigint").alias("y")
    ).localCheckpoint(eager=True)

    if init_weights is not None and len(init_weights) != num_buckets + 1:
        raise ValueError(
            f"init_weights needs {num_buckets + 1} entries, got {len(init_weights)}"
        )
    w = list(init_weights) if init_weights is not None else [0] * (num_buckets + 1)
    for _ in range(iters):
        wdf = spark.createDataFrame(
            [(j, wj) for j, wj in enumerate(w)], "j bigint, w bigint"
        )
        margins = (
            feat.join(F.broadcast(wdf), "j")
            .groupBy("did")
            .agg(F.sum(F.col("x") * F.col("w")).cast("bigint").alias("m"))
        )
        resid = labels.join(margins, "did").select(
            "did",
            (
                F.expr(sig_fp_expr("m")) - F.col("y") * F.lit(S).cast("bigint")
            ).alias("r"),
        )
        grad_rows = (
            feat.join(resid, "did")
            .groupBy("j")
            .agg(F.sum(F.col("x") * F.col("r")).cast("bigint").alias("g"))
            .collect()
        )
        grad = {r["j"]: r["g"] for r in grad_rows}
        w = [
            wj
            - _trunc_div(
                eta_num * (grad.get(j, 0) + _trunc_div(l2_num * wj * n, l2_den)),
                eta_den * n,
            )
            for j, wj in enumerate(w)
        ]
    return LogRegModel(
        num_buckets=num_buckets,
        weights_fp=tuple(w),
        iters=iters,
        eta_num=eta_num,
        eta_den=eta_den,
        l2_num=l2_num,
        l2_den=l2_den,
    )


def score_documents(
    spark: SparkSession,
    feat: DataFrame,
    model: LogRegModel,
) -> DataFrame:
    """Apply a trained model: (did, margin_fp, score_fp, pred).

    score_fp is the fixed-point sigmoid of the margin (0..FP_SCALE);
    pred = 1 iff margin > 0.  One join-aggregate over the corpus — the
    weight frame broadcasts."""
    wdf = spark.createDataFrame(
        [(j, wj) for j, wj in enumerate(model.weights_fp)], "j bigint, w bigint"
    )
    margins = (
        feat.join(F.broadcast(wdf), "j")
        .groupBy("did")
        .agg(F.sum(F.col("x") * F.col("w")).cast("bigint").alias("margin_fp"))
    )
    return margins.select(
        "did",
        "margin_fp",
        F.expr(sig_fp_expr("margin_fp")).alias("score_fp"),
        F.when(F.col("margin_fp") > 0, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("pred"),
    )


def logistic_loss(margins_labels: DataFrame) -> float:
    """Mean logistic loss (float, diagnostics only — NOT part of the
    deterministic training path) over a frame with margin_fp and y."""
    S = float(FP_SCALE)
    row = margins_labels.select(
        F.avg(
            F.log1p(F.exp(-(F.col("y") * 2 - 1) * (F.col("margin_fp") / S)))
        ).alias("loss")
    ).first()
    return float(row["loss"])
