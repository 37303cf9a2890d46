"""Corpus-curation queries for training-data pipelines: benchmark
decontamination, incremental batch-vs-corpus dedup, BM25 keyword relevance
and repetition (boilerplate) signals.

These complement the north_star module: where north_star covers the
sketch/similarity machinery, this module covers the hygiene passes a
large-scale pretraining pipeline runs per ingest batch — all exact and
oracle-checked (no seeded hashes in this file; md5 is engine-portable).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.operators import dedup as D
from aws_genaric_datapipeline_spark.operators import text as X
from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load

_DUCK_TOKS = "string_split_regex(trim(text), '\\s+')"
_DUCK_TRIGRAMS = (
    "list_transform(range(1, len({w}) - 1), "
    "i -> array_to_string(list_slice({w}, i, i + 2), ' '))"
).format(w=_DUCK_TOKS)
_DUCK_BIGRAMS = (
    "list_transform(range(1, len({w})), "
    "i -> array_to_string(list_slice({w}, i, i + 1), ' '))"
).format(w=_DUCK_TOKS)


@query(
    "decontaminate_ngram_overlap",
    oracle=f"""
        WITH sh AS (
            SELECT DISTINCT doc_id AS did, s.tok
            FROM documents, UNNEST({_DUCK_TRIGRAMS}) AS s(tok)
        ),
        bench AS (SELECT DISTINCT tok FROM sh WHERE did % 20 = 0),
        corpus AS (SELECT * FROM sh WHERE did % 20 <> 0),
        tot AS (SELECT did, count(*) AS n_grams FROM corpus GROUP BY did),
        hit AS (
            SELECT did, count(*) AS n_contaminated
            FROM corpus JOIN bench USING (tok)
            GROUP BY did
        )
        SELECT hit.did AS doc_id, n_contaminated, n_grams,
               round(n_contaminated / CAST(n_grams AS DOUBLE), 4)
                   AS contamination_ratio
        FROM hit JOIN tot ON hit.did = tot.did
    """,
    tags=("north-star", "curation", "dedup"),
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set leakage detection: flag corpus documents sharing word
    trigrams with a held-out benchmark slice (doc_id % 20 = 0 stands in for
    the benchmark set).  The benchmark n-gram table is broadcast; the
    corpus half streams through a map-side semi join."""
    (documents,) = load(spark, sf_dir, "documents")
    bench = documents.where(F.col("doc_id") % 20 == 0)
    corpus = documents.where(F.col("doc_id") % 20 != 0)
    return D.contamination_overlap(corpus, bench, n=3)


@query(
    "dedup_incremental_batch",
    oracle="""
        WITH fp AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
            FROM documents
        ),
        corpus AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 5 <> 0),
        batch AS (SELECT * FROM fp WHERE doc_id % 5 = 0)
        SELECT fp, min(doc_id) AS doc_id, count(*) AS dup_count
        FROM batch
        WHERE fp NOT IN (SELECT fp FROM corpus)
        GROUP BY fp
    """,
    tags=("north-star", "curation", "dedup"),
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch dedup against the existing corpus: an incoming slice
    (doc_id % 5 = 0) keeps only docs whose content fingerprint is unseen in
    the corpus, then min-id dedups within the batch — the idempotent ingest
    hygiene pass (anti join on 128-bit fingerprints, never text)."""
    (documents,) = load(spark, sf_dir, "documents")
    batch = documents.where(F.col("doc_id") % 5 == 0)
    corpus = documents.where(F.col("doc_id") % 5 != 0)
    return D.dedup_incremental(batch, corpus)


@query(
    "search_bm25",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id AS did, t.tok
            FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
            WHERE length(trim(text)) > 0
        ),
        dl AS (SELECT did, count(*) AS dl FROM toks GROUP BY did),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        tf AS (
            SELECT did, tok, count(*) AS tf
            FROM toks WHERE tok IN ('spark', 'vector', 'merge')
            GROUP BY did, tok
        ),
        dft AS (SELECT tok, count(*) AS dft FROM tf GROUP BY tok)
        SELECT tf.did AS doc_id,
               round(sum(
                   ln(1 + (n_docs - dft + 0.5) / (dft + 0.5))
                   * tf * (1.2 + 1)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 4) AS bm25
        FROM tf
        JOIN dft ON tf.tok = dft.tok
        JOIN dl ON tf.did = dl.did
        CROSS JOIN stats
        GROUP BY tf.did
    """,
    tags=("north-star", "text", "search"),
)
def search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 keyword relevance over the corpus for a 3-term query —
    the scoring half of full-text search, with corpus stats (N, avgdl, df)
    computed in-engine and broadcast."""
    (documents,) = load(spark, sf_dir, "documents")
    return X.bm25_scores(documents, terms=("spark", "vector", "merge"))


@query(
    "text_repetition_stats",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id AS did, t.tok
            FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
            WHERE length(trim(text)) > 0
        ),
        uni AS (
            SELECT did, count(*) AS n_tokens, count(DISTINCT tok) AS n_distinct
            FROM toks GROUP BY did
        ),
        bg AS (
            SELECT doc_id AS did, b.bg
            FROM documents, UNNEST({_DUCK_BIGRAMS}) AS b(bg)
            WHERE length(trim(text)) > 0
        ),
        bstats AS (
            SELECT did, max(c) AS top_c, sum(c) AS n_bg
            FROM (SELECT did, bg, count(*) AS c FROM bg GROUP BY did, bg)
            GROUP BY did
        )
        SELECT uni.did AS doc_id,
               n_tokens,
               round(1.0 - n_distinct / CAST(n_tokens AS DOUBLE), 4)
                   AS dup_token_ratio,
               round(coalesce(top_c / CAST(n_bg AS DOUBLE), 0.0), 4)
                   AS top_bigram_frac
        FROM uni LEFT JOIN bstats ON uni.did = bstats.did
    """,
    tags=("north-star", "text", "curation"),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (duplicate-token ratio, top-bigram
    share) — integer-derived, bit-reproducible quality gates for boilerplate
    removal."""
    (documents,) = load(spark, sf_dir, "documents")
    return X.repetition_stats(documents)
