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
