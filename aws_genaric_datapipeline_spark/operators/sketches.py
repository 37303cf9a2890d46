"""Mergeable frequency sketches: count-min (Cormode/Muthukrishnan 2005).

skew.heavy_hitters answers "which keys are frequent" (Misra-Gries +
exact recount); count-min answers POINT queries — "how often did THIS
key occur" — with a fixed-size state that merges by cell-wise addition,
which is what makes it the streaming/distributed standard: every
partition (or micro-batch, or day of logs) produces a depth×width
counter grid, and grids combine by `+` with zero information loss.

Estimates never undercount: est(k) = min_j grid[j][h_j(k)] ≥ true(k),
with P[est - true > εN] ≤ e^-depth at width = e/ε.  The hash rows are
consecutive 8-hex windows of md5(key) — the repo's engine-portable hash
idiom — so a DuckDB oracle rebuilds the identical grid and estimates,
collisions and all: the sketch's overcounts are part of the verified
contract, not slack.

Scale design: the build is one explode to (row, pos) pairs and a
groupBy over AT MOST depth×width distinct keys — partial map-side
aggregation collapses every partition to ≤ depth×width rows no matter
how many input rows or how skewed the keys, so the shuffle is constant-
size.  Estimation broadcasts the (tiny) grid to the key frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _cms_pos(key: Column, row: int, width: int) -> Column:
    """Row ``row``'s counter index for ``key`` (md5 window hash, portable)."""
    if not 0 <= row <= 3:
        raise ValueError("depth must be in 1..4 (md5 has 4 hex windows)")
    return (
        F.conv(F.substring(F.md5(key), 1 + 8 * row, 8), 16, 10).cast("bigint")
        % width
    )


def cms_sketch(
    df: DataFrame,
    key_col: Column | str,
    depth: int = 2,
    width: int = 256,
) -> DataFrame:
    """Build a count-min grid over ``key_col`` as a (row, pos, c) frame
    with at most depth×width rows.

    ``key_col`` may be any expression; it is cast to string before
    hashing (cast semantics for bigint/string agree across engines).
    Merging two sketches of the same shape is
    ``union → groupBy(row, pos) → sum(c)`` — cell-wise addition.
    """
    key = (F.col(key_col) if isinstance(key_col, str) else key_col).cast(
        "string"
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("row"), _cms_pos(key, j, width).alias("pos")
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("rp"))
        .groupBy(F.col("rp.row").alias("row"), F.col("rp.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: Column | str,
    out_col: str = "est_count",
    depth: int = 2,
    width: int = 256,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over rows of the counter
    at the key's position (missing cell = 0, so unseen keys estimate 0
    unless every row collides).  The grid joins broadcast; ``keys`` keeps
    all its columns plus ``out_col``."""
    key = (F.col(key_col) if isinstance(key_col, str) else key_col).cast(
        "string"
    )
    out = keys
    ests = []
    for j in range(depth):
        grid_j = sketch.where(F.col("row") == j).select(
            F.col("pos").alias(f"_pos{j}"), F.col("c").alias(f"_c{j}")
        )
        out = out.withColumn(f"_pos{j}", _cms_pos(key, j, width)).join(
            F.broadcast(grid_j), f"_pos{j}", "left"
        )
        ests.append(F.coalesce(F.col(f"_c{j}"), F.lit(0).cast("bigint")))
    est = F.least(*ests) if len(ests) > 1 else ests[0]
    drop = [c for j in range(depth) for c in (f"_pos{j}", f"_c{j}")]
    return out.withColumn(out_col, est).drop(*drop)


def cms_inner_product(
    sketch_a: DataFrame, sketch_b: DataFrame
) -> DataFrame:
    """Join-cardinality estimate from two count-min grids of the SAME
    shape: ``|A ⋈ B| = Σ_k f_A(k)·f_B(k)`` is upper-bounded by each
    row's counter dot-product, so the estimate is ``min over rows of
    Σ_pos a[row][pos]·b[row][pos]`` (Cormode/Muthukrishnan §4.3 — the
    classic sketch answer to "how big will this join be" that query
    planners use before running the join).

    Never undercounts; returns a 1-row frame ``(cms_join_estimate)``.
    Cost: the grids are ≤ depth×width rows each, so the whole estimate
    is a broadcast-sized join — no touch of either input relation.
    """
    a = sketch_a.select("row", "pos", F.col("c").alias("ca"))
    b = sketch_b.select("row", "pos", F.col("c").alias("cb"))
    dots = (
        a.join(b, ["row", "pos"])
        .groupBy("row")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    return dots.agg(F.min("dot").cast("bigint").alias("cms_join_estimate"))


def histogram_quantile_report(
    df: DataFrame,
    value_col: str,
    bins: int = 128,
    ps: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Mergeable equi-width-histogram quantile sketch with its error
    contract checked against the exact quantile.

    The one-pass scale path for quantiles over 100 TB: per partition,
    values fold into a ``bins``-cell histogram over the global [min,
    max] (a prior 1-row min/max pass); histograms merge by cell-wise
    addition (constant-size shuffle, like the count-min grid), and
    quantile p is answered by the first bin whose cumulative count
    reaches p·N — off by at most one bin width from the exact value.
    Returns one row: n_rows, bin_width, and per p the histogram
    estimate (upper bin edge), the exact quantile
    (percentile ≡ quantile_cont), and a ``pXX_within_bin`` boolean
    asserting the |estimate − exact| ≤ bin_width contract — the
    deterministic analog of agg_approx_distinct's sketch contract.
    """
    x = F.col(value_col)
    mm = df.agg(
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
        F.count(x).alias("n"),
    )
    w = (F.col("mx") - F.col("mn")) / bins
    bin_expr = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(F.lit(bins - 1), F.floor((x - F.col("mn")) / w))
    )
    hist = (
        df.crossJoin(F.broadcast(mm))
        .select(bin_expr.cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window

    cum = hist.select(
        "bin",
        F.sum("c")
        .over(
            Window.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        .alias("cum"),
    )
    picks = cum.crossJoin(F.broadcast(mm)).agg(
        *[
            F.min(
                F.when(F.col("cum") >= F.lit(p) * F.col("n"), F.col("bin"))
            ).alias(f"_bin_{i}")
            for i, p in enumerate(ps)
        ]
    )
    exacts = df.agg(
        *[
            F.expr(f"percentile({value_col}, {p})").alias(f"_ex_{i}")
            for i, p in enumerate(ps)
        ]
    )
    out = mm.crossJoin(F.broadcast(picks)).crossJoin(F.broadcast(exacts))
    w_out = (F.col("mx") - F.col("mn")) / bins
    cols = [
        F.col("n").cast("bigint").alias("n_rows"),
        F.round(w_out, 4).alias("bin_width"),
    ]
    for i, p in enumerate(ps):
        tag = str(int(p * 100))
        est = F.col("mn") + (F.col(f"_bin_{i}") + 1) * w_out
        cols += [
            F.round(F.col(f"_ex_{i}"), 4).alias(f"p{tag}_exact"),
            F.round(est, 4).alias(f"p{tag}_hist"),
            (F.abs(est - F.col(f"_ex_{i}")) <= w_out).alias(
                f"p{tag}_within_bin"
            ),
        ]
    return out.select(*cols)
