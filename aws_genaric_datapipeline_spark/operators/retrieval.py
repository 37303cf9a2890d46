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


def build_inverted_index(
    documents: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
) -> None:
    """Build a PERSISTED inverted index: the build-once/query-many tier
    of full-text search, mirroring the ANN family's ivf_build_index.

    Layout under ``path``:

    * ``postings/`` — (term, did, tf) rows partitioned by
      ``bucket = pmod(xxhash64(term), num_buckets)``, so a query's scan
      prunes to the buckets its terms hash into (parquet partition
      filter — plan-gated in TestInvertedIndex);
    * ``doclen/`` — (did, dl) document lengths;
    * ``stats/`` — one row (n_docs, avgdl).

    Postings are bucketed by TERM hash, not doc, because queries select
    by term: at 100 TB the postings frame is token-count-sized and the
    per-term partition pruning is what keeps query cost proportional to
    the matched postings, not the corpus.  Document frequency (df) is
    derived at query time with one grouped count over the PRUNED
    postings (|terms| groups, broadcast back) — no separate term-stats
    table to keep consistent with the postings.
    """
    from aws_genaric_datapipeline_spark.operators.text import tokens

    toks = documents.select(
        F.col(id_col).alias("did"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    postings = (
        toks.groupBy("term", "did")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)))
    )
    postings.write.partitionBy("bucket").mode("overwrite").parquet(
        f"{path}/postings"
    )
    dl = toks.groupBy("did").agg(F.count(F.lit(1)).alias("dl"))
    dl.write.mode("overwrite").parquet(f"{path}/doclen")
    dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).write.mode("overwrite").parquet(f"{path}/stats")


def query_inverted_index(
    spark,
    path: str,
    terms: tuple[str, ...],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    num_buckets: int = 16,
) -> DataFrame:
    """Okapi BM25 top-``k`` against a PERSISTED inverted index (see
    build_inverted_index): reads ONLY the term-hash buckets the query
    terms live in (parquet partition pruning), scores the matched
    postings with the same Lucene-idf BM25 as operators/text.py
    bm25_scores, and returns ``(doc_id, bm25)`` for the best ``k``
    documents by (score DESC, id ASC) — a TakeOrdered over the match
    set, never a corpus scan.
    """
    terms_df = spark.createDataFrame(
        [(t,) for t in terms], "term string"
    ).withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)))
    buckets = sorted({r["bucket"] for r in terms_df.collect()})

    postings = (
        spark.read.parquet(f"{path}/postings")
        .where(F.col("bucket").isin(buckets))
        .where(F.col("term").isin(*terms))
    )
    dl = spark.read.parquet(f"{path}/doclen")
    stats = spark.read.parquet(f"{path}/stats")
    dft = postings.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1) / denom
    scored = (
        postings.join(F.broadcast(dft), "term")
        .join(dl, "did")
        .crossJoin(F.broadcast(stats))
        .groupBy("did")
        .agg(F.round(F.sum(contrib), 4).alias("bm25"))
    )
    return (
        scored.select(F.col("did").alias("doc_id"), "bm25")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )


# ---------------------------------------------- txn-backed streaming BM25
def bm25_txn_seed(
    spark,
    documents: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
):
    """Seed a TRANSACTIONAL inverted index: postings (term, did, tf,
    bucket) and doclen (did, dl) each in a TxnTable — the full-text twin
    of similarity.ivf_txn_seed.  The txn log is what upgrades index
    maintenance to EXACTLY-ONCE under Structured Streaming
    (bm25_txn_maintainer); postings files are range-repartitioned on the
    term-hash bucket with an EXPLICIT count (AQE cannot coalesce them
    into one mixed file), so each committed file covers a narrow bucket
    band and its footer [min, max] is the partition-pruning metadata a
    query probes with (bm25_query_txn).  Corpus stats (n_docs, avgdl)
    derive from doclen at query time — no third table to keep
    consistent.  Returns (postings_table, doclen_table)."""
    from aws_genaric_datapipeline_spark.operators.text import tokens
    from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable

    toks = documents.select(
        F.col(id_col).alias("did"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    postings = (
        toks.groupBy("term", "did")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)))
    )
    dl = toks.groupBy("did").agg(F.count(F.lit(1)).alias("dl"))
    pt = TxnTable(spark, f"{index_path}/postings_txn")
    pt.overwrite(
        postings.repartitionByRange(num_buckets, "bucket"),
        app_txn_id="bm25-seed",
    )
    dt = TxnTable(spark, f"{index_path}/doclen_txn")
    dt.overwrite(dl, app_txn_id="bm25-seed")
    return pt, dt


def bm25_txn_maintainer(
    postings_table,
    doclen_table,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 16,
    sink_id: str = "bm25",
):
    """foreachBatch handler keeping the txn-backed inverted index current
    from a DOCUMENT stream: each micro-batch contributes its own
    (term, did, tf) postings and (did, dl) lengths — new documents only,
    so both are pure appends, and the one-shot build over the union
    corpus equals the stream-fed state exactly (tf/df/dl/avgdl are all
    content functions; pinned in TestStreamingBm25Maintenance).

    Exactly-once: both appends carry ``app_txn_id=f"{sink_id}-{batch_id}"``,
    so a replayed batch re-commits as a no-op on each table independently
    — a crash between the two commits re-delivers the batch and only the
    missing half applies (idempotent convergence, the same two-table
    discipline a production format uses for index + stats).

    Scale: per trigger, one tokenize + two batch-sized aggregations and
    two put-if-absent commits; the standing postings are untouched."""

    def _handle(batch_df, batch_id: int) -> None:
        from aws_genaric_datapipeline_spark.operators.text import tokens

        toks = batch_df.select(
            F.col(id_col).alias("did"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        ).localCheckpoint(eager=True)
        postings = (
            toks.groupBy("term", "did")
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn(
                "bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets))
            )
        )
        dl = toks.groupBy("did").agg(F.count(F.lit(1)).alias("dl"))
        # doclen commits FIRST: a reader between the two commits then sees
        # n_docs grown but postings stale, which only biases idf UPWARD a
        # touch (dft ≤ old n_docs ≤ new n_docs keeps every log argument
        # positive, and the new docs are simply absent).  Postings-first
        # would let dft exceed n_docs and flip idf negative — corrupting
        # every score in the window, not just the new docs'.
        doclen_table.append(dl, app_txn_id=f"{sink_id}-{batch_id}")
        postings_table.append(
            postings.repartitionByRange(num_buckets, "bucket"),
            app_txn_id=f"{sink_id}-{batch_id}",
        )

    return _handle


def bm25_query_txn(
    spark,
    postings_table,
    doclen_table,
    terms: tuple[str, ...],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    num_buckets: int = 16,
) -> DataFrame:
    """Okapi BM25 top-``k`` against the txn-backed index: the query
    terms' hash buckets prune the postings FILES by their committed
    bucket [min, max] stats (bucket-banded files ⇒ the prune is the
    txn-log analog of parquet partition pruning), then the same
    Lucene-idf scoring as query_inverted_index."""
    terms_df = spark.createDataFrame(
        [(t,) for t in terms], "term string"
    ).withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)))
    buckets = sorted({r["bucket"] for r in terms_df.collect()})
    # shared txn helpers: membership prune on the committed bucket bands +
    # the era/DV-aware read that returns a schema-correct EMPTY frame when
    # every file prunes away (terms hashing outside all live bands)
    chosen = postings_table.prune_files_values("bucket", buckets)
    postings = (
        postings_table.read_files(chosen)
        .where(F.col("bucket").isin(buckets))
        .where(F.col("term").isin(*terms))
    )
    dl = doclen_table.read()
    stats_df = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dft = postings.groupBy("term").agg(F.count(F.lit(1)).alias("dft"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1) / denom
    scored = (
        postings.join(F.broadcast(dft), "term")
        .join(dl, "did")
        .crossJoin(F.broadcast(stats_df))
        .groupBy("did")
        .agg(F.round(F.sum(contrib), 4).alias("bm25"))
    )
    return (
        scored.select(F.col("did").alias("doc_id"), "bm25")
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(k)
    )
