"""Retrieval composition operators: reciprocal-rank fusion of ranked legs.

Hybrid search — a lexical (BM25) leg and a semantic (embedding-cosine)
leg fused into one ranking — is the standard production retrieval shape
(Elasticsearch/OpenSearch "hybrid query", Vespa, Azure AI Search all ship
RRF as the default fusion).  RRF (Cormack/Clarke/Buettcher, SIGIR 2009)
needs only each leg's RANKS, not its scores, so legs with incomparable
score scales compose without calibration:

    rrf(d) = Σ_legs 1 / (k + rank_leg(d))        (k = 60 by convention)

Scale design: each leg is expected to arrive already truncated to its
top-K (TakeOrderedAndProject — never a global sort), so the fusion joins
driver-sized frames; documents missing from a leg contribute 0 exactly as
the published formula treats unranked documents.
"""

from __future__ import annotations

from functools import reduce
from operator import add

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def rank_leg(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    top: int = 50,
) -> DataFrame:
    """Truncate a scored leg to its top-``top`` rows and assign dense
    1-based ranks by (score DESC, id ASC).

    The truncation plans as TakeOrderedAndProject (sort+limit — a per-
    partition heap then a driver merge, no global sort), and the
    row_number window then runs on the K-row result, so the single-
    partition window every global ranking implies touches K rows, never
    the corpus.  Ties break by id, so ranks are deterministic for any
    score column that is already rounded (both engines see identical
    values).
    """
    topped = df.orderBy(F.desc(score_col), F.asc(id_col)).limit(top)
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return topped.select(
        F.col(id_col), F.row_number().over(w).cast("long").alias("rank")
    )


def rrf_fuse(
    legs: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top: int | None = None,
) -> DataFrame:
    """Fuse ranked legs by reciprocal-rank fusion.

    ``legs`` maps a leg name to a (id, rank) frame (see rank_leg); the
    output carries ``{name}_rank`` for each leg (NULL where the document
    is absent from that leg — absence contributes 0 to the score) and
    ``rrf_score`` rounded to 6 decimals.  With ``top`` set, returns the
    best ``top`` documents by (rrf_score DESC, id ASC) — again a
    TakeOrdered over leg-sized input.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    fused: DataFrame | None = None
    for name, leg in legs.items():
        one = leg.select(
            F.col(id_col), F.col(rank_col).cast("long").alias(f"{name}_rank")
        )
        fused = one if fused is None else fused.join(one, id_col, "full_outer")
    score = reduce(
        add,
        [
            F.coalesce(
                F.lit(1.0) / (F.lit(k) + F.col(f"{name}_rank")), F.lit(0.0)
            )
            for name in legs
        ],
    )
    out = fused.select(
        id_col,
        *[f"{name}_rank" for name in legs],
        F.round(score, 6).alias("rrf_score"),
    )
    if top is not None:
        out = out.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(top)
    return out
