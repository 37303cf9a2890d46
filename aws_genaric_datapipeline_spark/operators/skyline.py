"""Distributed 2-D skyline (Pareto frontier).

The skyline of a set under (minimize x, maximize y) is every row not
STRICTLY dominated by another (q dominates p iff q.x <= p.x, q.y >= p.y,
and at least one inequality is strict).  The classic distributed recipe:

1. **Local prune** (mapInPandas): each Arrow batch is reduced to its own
   Pareto frontier.  Sound because domination is transitive and batch-local
   domination implies global domination — so the union of local frontiers
   is a SUPERSET of the global skyline, of size O(min(distinct x, distinct
   y)) per batch, independent of batch row count.
2. **Global refine**: the surviving candidates are broadcast against
   themselves in a strict-domination LEFT ANTI join.  The nested-loop is
   confined to the pruned candidate set (KBs at any input scale), never
   the input.

Ties are preserved exactly: two rows with identical (x, y) do not strictly
dominate each other, so both survive — matching the NOT EXISTS oracle.

At 100 TB the input pass is a single scan with per-batch numpy reduction
(no shuffle at all until the candidate union), which is the property that
makes skylines viable where the naive NOT EXISTS self-join is O(N²).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _pareto_batch(pdf: pd.DataFrame, x: str, y: str) -> pd.DataFrame:
    """Exact Pareto frontier of one in-memory block under (min x, max y)."""
    if len(pdf) == 0:
        return pdf
    pdf = pdf.sort_values([x, y], ascending=[True, False], kind="mergesort")
    pdf = pdf.reset_index(drop=True)
    xs = pdf[x].to_numpy()
    ys = pdf[y].to_numpy(dtype="float64")
    cummax = np.maximum.accumulate(ys)
    prev_any = np.empty_like(cummax)
    prev_any[0] = -np.inf
    prev_any[1:] = cummax[:-1]
    # max y among rows with STRICTLY smaller x: index of the first row of
    # the current x-group, then the running max just before it.
    first = np.ones(len(pdf), dtype=bool)
    first[1:] = xs[1:] != xs[:-1]
    grp_start = np.maximum.accumulate(np.where(first, np.arange(len(pdf)), 0))
    prev_x_max = np.where(grp_start > 0, prev_any[grp_start], -np.inf)
    dominated = (prev_any > ys) | (prev_x_max >= ys)
    return pdf[~dominated]


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """Skyline of ``df`` under (minimize ``x``, maximize ``y``).

    Returns the input columns unchanged, one row per non-dominated input
    row (ties on (x, y) all survive).
    """
    schema = df.schema

    def local(prune_it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in prune_it:
            yield _pareto_batch(pdf, x, y)

    cand = df.mapInPandas(local, schema=schema)
    dom = cand.select(F.col(x).alias("_q_x"), F.col(y).alias("_q_y"))
    strict = (
        (F.col("_q_x") <= F.col(x))
        & (F.col("_q_y") >= F.col(y))
        & ((F.col("_q_x") < F.col(x)) | (F.col("_q_y") > F.col(y)))
    )
    return cand.join(F.broadcast(dom), strict, "left_anti")
