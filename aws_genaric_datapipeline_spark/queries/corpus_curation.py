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
from pyspark.sql import DataFrame, SparkSession, Window

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


def _duck_bloom_cte(probe_pred: str) -> str:
    """CTE chunk replaying the Bloom screen: benchmark (doc_id % 20 = 0)
    trigram positions → ``bloomr`` (did, n_flagged, n_grams,
    flagged_ratio) for every probed doc matching ``probe_pred`` (zero-flag
    docs included — query-level selects apply their own HAVING).  Shared
    verbatim by decontaminate_bloom / decontaminate_incremental_bloom /
    the v2 funnel."""
    return f"""
        sh AS (
            SELECT DISTINCT doc_id AS did, s.tok
            FROM documents, UNNEST({_DUCK_TRIGRAMS}) AS s(tok)
        ),
        bench AS (SELECT DISTINCT tok FROM sh WHERE did % 20 = 0),
        bits AS (
            SELECT DISTINCT ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1048576
                AS p FROM bench
            UNION
            SELECT DISTINCT ('0x' || substr(md5(tok), 9, 8))::BIGINT % 1048576
                FROM bench
        ),
        mem AS (
            SELECT did,
                   (('0x' || substr(md5(tok), 1, 8))::BIGINT % 1048576
                        IN (SELECT p FROM bits)
                    AND ('0x' || substr(md5(tok), 9, 8))::BIGINT % 1048576
                        IN (SELECT p FROM bits)) AS hit
            FROM sh WHERE {probe_pred}
        ),
        bloomr AS (
            SELECT did,
                   count(*) FILTER (hit) AS n_flagged,
                   count(*) AS n_grams,
                   round(count(*) FILTER (hit) / CAST(count(*) AS DOUBLE), 4)
                       AS flagged_ratio
            FROM mem GROUP BY did
        )"""


@query(
    "decontaminate_bloom",
    oracle=f"""
        WITH {_duck_bloom_cte("did % 20 <> 0")}
        SELECT did AS doc_id, n_flagged, n_grams, flagged_ratio
        FROM bloomr WHERE n_flagged > 0
    """,
    tags=("north-star", "curation", "dedup"),
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination screen: the benchmark slice's trigrams
    are folded into a 2^20-bit / 2-hash bitset (128 KB broadcast, CONSTANT
    in benchmark size) and every corpus trigram is flagged iff both of its
    md5-derived bit positions are set — contamination_overlap's scale form,
    where executors hold a fixed bitset instead of the gram-string table.
    The oracle replays Bloom semantics exactly (semi-join on the distinct
    inserted positions), so the engine's false-positive set IS the checked
    contract, not slack."""
    (documents,) = load(spark, sf_dir, "documents")
    bench = documents.where(F.col("doc_id") % 20 == 0)
    corpus = documents.where(F.col("doc_id") % 20 != 0)
    return D.bloom_decontaminate(
        corpus, bench, n=3, num_bits=1 << 20, num_hashes=2
    )


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
    "search_hybrid_rrf",
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
        dft AS (SELECT tok, count(*) AS dft FROM tf GROUP BY tok),
        bm AS (
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
        ),
        lex AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
            FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50)
        ),
        base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        scored AS (
            SELECT b.vec_id AS doc_id,
                   round(list_cosine_similarity(
                       (SELECT v FROM base WHERE vec_id = 0), b.v), 4) AS cos
            FROM base b WHERE b.vec_id <> 0
        ),
        sem AS (
            SELECT doc_id,
                   row_number() OVER (ORDER BY cos DESC, doc_id) AS sem_rank
            FROM (SELECT * FROM scored ORDER BY cos DESC, doc_id LIMIT 50)
        ),
        fused AS (
            SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
                   lex_rank, sem_rank,
                   round(coalesce((1.0::DOUBLE) / (60 + lex_rank), 0.0)
                       + coalesce((1.0::DOUBLE) / (60 + sem_rank), 0.0), 6)
                       AS rrf_score
            FROM lex FULL JOIN sem ON lex.doc_id = sem.doc_id
        )
        SELECT doc_id, lex_rank, sem_rank, rrf_score
        FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 20
    """,
    tags=("north-star", "text", "search", "similarity"),
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: a BM25 lexical leg ('spark vector merge') and an
    embedding-cosine semantic leg (query = vec 0's embedding, vec_id ≡
    doc_id in the driver corpus) each truncated to top-50 via TakeOrdered,
    then fused by reciprocal-rank fusion (k=60) — the production hybrid-
    search shape where neither leg's score scale has to be calibrated.
    Ranks ride on ROUNDED scores with id tie-breaks, so both engines rank
    identically and the fused top-20 is deterministic."""
    from aws_genaric_datapipeline_spark.operators import retrieval as R
    from aws_genaric_datapipeline_spark.operators import similarity as S

    documents, embeddings = load(spark, sf_dir, "documents", "embeddings")
    lex = R.rank_leg(
        X.bm25_scores(documents, terms=("spark", "vector", "merge")),
        score_col="bm25",
        top=50,
    )
    sem = R.rank_leg(
        S.cosine_topk(embeddings, query_ids=[0], k=50)
        .select(F.col("neighbor_id").alias("doc_id"), "cosine_sim"),
        score_col="cosine_sim",
        top=50,
    )
    return R.rrf_fuse({"lex": lex, "sem": sem}, k=60, top=20)


@query(
    "decontaminate_incremental_bloom",
    oracle=f"""
        WITH {_duck_bloom_cte("did % 5 = 0 AND did % 20 <> 0")}
        SELECT did AS doc_id, n_flagged, n_grams, flagged_ratio
        FROM bloomr WHERE n_flagged > 0
    """,
    tags=("north-star", "curation", "dedup"),
)
def decontaminate_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch decontamination against a PERSISTED Bloom position index
    (built here in-query for the honest cold composite — production builds
    once at eval-set registration): the benchmark slice's positions land
    in a broadcast-sized catalog table, and the incoming batch (doc_id %
    5 = 0, benchmark rows excluded) is screened against it with the same
    broadcast-probe plan as decontaminate_bloom.  Completes the
    build-once/screen-per-batch index family: exact fp, MinHash, SimHash,
    embedding-LSH, and now the decontamination screen."""
    (documents,) = load(spark, sf_dir, "documents")
    bench = documents.where(F.col("doc_id") % 20 == 0)
    batch = documents.where(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 20 != 0)
    )
    D.bloom_build_index(bench, "bloom_positions_idx")
    return D.bloom_screen_indexed(spark, batch, "bloom_positions_idx")


def _bpe_round_sql(r: int) -> str:
    """One BPE training round as DuckDB CTEs: pair counts over syms{r-1},
    deterministic arg-max (count DESC, pair ASC), and the left-to-right
    non-overlapping merge replayed as a RECURSIVE index walk (each word row
    advances i by 2 over a matched pair, else by 1, appending to acc)."""
    prev = f"syms{r - 1}"
    top = f"top{r}"
    return f"""
        pairs{r} AS (
            SELECT freq, u.p.a AS a, u.p.b AS b
            FROM {prev}, UNNEST(list_transform(range(1, len(syms)),
                 i -> struct_pack(a := syms[i], b := syms[i + 1]))) AS u(p)
        ),
        {top} AS (
            SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
            FROM pairs{r} GROUP BY a, b
            ORDER BY cnt DESC, a, b LIMIT 1
        ),
        walk{r} AS (
            SELECT word, freq, syms, 1 AS i, []::VARCHAR[] AS acc FROM {prev}
            UNION ALL
            SELECT word, freq, syms,
                   CASE WHEN i < len(syms)
                             AND syms[i] = (SELECT a FROM {top})
                             AND syms[i + 1] = (SELECT b FROM {top})
                        THEN i + 2 ELSE i + 1 END,
                   CASE WHEN i < len(syms)
                             AND syms[i] = (SELECT a FROM {top})
                             AND syms[i + 1] = (SELECT b FROM {top})
                        THEN list_append(acc, syms[i] || syms[i + 1])
                        ELSE list_append(acc, syms[i]) END
            FROM walk{r} WHERE i <= len(syms)
        ),
        syms{r} AS MATERIALIZED (
            SELECT word, freq, acc AS syms FROM walk{r}
            WHERE i = len(syms) + 1
        )"""


_BPE_MERGES = 3
# Shared training CTE prefix: word histogram, char split, and _BPE_MERGES
# fully-replayed merge rounds — ends with the per-word-type final
# segmentation ``syms{_BPE_MERGES}`` and per-round winners ``top{r}``.
_BPE_TRAIN_CTES = (
    f"""
    WITH RECURSIVE wt AS (
        SELECT tok AS word, count(*) AS freq
        FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
        WHERE length(trim(text)) > 0
        GROUP BY tok
    ),
    syms0 AS (
        SELECT word, freq,
               list_transform(range(1, length(word) + 1), i -> word[i]) AS syms
        FROM wt
    ),
    """
    + ",\n".join(_bpe_round_sql(r) for r in range(1, _BPE_MERGES + 1))
)
def _bpe_learn_oracle(train_ctes: str) -> str:
    """Merge-table projection over a train-replay CTE chain (char- and
    byte-level training share every round CTE; only syms0 differs)."""
    return (
        train_ctes
        + "\n    "
        + "\n    UNION ALL ".join(
            f"SELECT CAST({r} AS INT) AS merge_rank, a AS left_sym,"
            f" b AS right_sym, cnt AS pair_count FROM top{r}"
            for r in range(1, _BPE_MERGES + 1)
        )
    )


_BPE_ORACLE = _bpe_learn_oracle(_BPE_TRAIN_CTES)

# Byte-level (GPT-2-style) twin: identical replay rounds, but syms0 splits
# each word into its UTF-8 BYTES spelled as two-hex-digit symbols —
# hex(encode(word)) sliced into pairs, the same spelling
# operators/text.py byte_syms produces, so the merge walk and arg-max
# replay verbatim over the byte alphabet.  ``train_where`` restricts the
# TRAINING histogram (held-out splits train on a slice); the encode-side
# toks CTE in _bpe_apply_oracle always covers the whole corpus.
def _bytebpe_train_ctes(train_where: str = "") -> str:
    return (
        f"""
    WITH RECURSIVE wt AS (
        SELECT tok AS word, count(*) AS freq
        FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
        WHERE length(trim(text)) > 0{train_where}
        GROUP BY tok
    ),
    syms0 AS (
        SELECT word, freq,
               list_transform(
                   range(1, length(hex(encode(word))) // 2 + 1),
                   i -> hex(encode(word))[2 * i - 1 : 2 * i]) AS syms
        FROM wt
    ),
    """
        + ",\n".join(_bpe_round_sql(r) for r in range(1, _BPE_MERGES + 1))
    )


_BYTEBPE_TRAIN_CTES = _bytebpe_train_ctes()


def _bytebpe_apply_walk_sql(r: int) -> str:
    """One slice-trained merge applied to the FULL corpus's word types —
    the held-out encode walk: same recursive index walk as
    _bpe_round_sql but over ``asyms{{r-1}}`` (all word types, no freq),
    consuming the slice-trained winner ``top{{r}}``."""
    prev = f"asyms{r - 1}"
    top = f"top{r}"
    return f"""
        awalk{r} AS (
            SELECT word, syms, 1 AS i, []::VARCHAR[] AS acc FROM {prev}
            UNION ALL
            SELECT word, syms,
                   CASE WHEN i < len(syms)
                             AND syms[i] = (SELECT a FROM {top})
                             AND syms[i + 1] = (SELECT b FROM {top})
                        THEN i + 2 ELSE i + 1 END,
                   CASE WHEN i < len(syms)
                             AND syms[i] = (SELECT a FROM {top})
                             AND syms[i + 1] = (SELECT b FROM {top})
                        THEN list_append(acc, syms[i] || syms[i + 1])
                        ELSE list_append(acc, syms[i]) END
            FROM awalk{r} WHERE i <= len(syms)
        ),
        asyms{r} AS MATERIALIZED (
            SELECT word, acc AS syms FROM awalk{r}
            WHERE i = len(syms) + 1
        )"""


_BYTEBPE_HELDOUT_CTES = (
    _bytebpe_train_ctes(" AND doc_id % 2 = 0")
    + f""",
    awt AS (
        SELECT DISTINCT tok AS word
        FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
        WHERE length(trim(text)) > 0
    ),
    asyms0 AS (
        SELECT word,
               list_transform(
                   range(1, length(hex(encode(word))) // 2 + 1),
                   i -> hex(encode(word))[2 * i - 1 : 2 * i]) AS syms
        FROM awt
    ),
    """
    + ",\n".join(
        _bytebpe_apply_walk_sql(r) for r in range(1, _BPE_MERGES + 1)
    )
)


def _bpe_apply_oracle(
    train_ctes: str, base_sym_len: int, seg_src: str | None = None
) -> str:
    """Train→encode replay: per-word-type final segmentation joined back
    to token positions, per-doc coverage aggregation.  ``base_sym_len``
    is the unmerged symbol spelling length (1 char-level, 2 hex-pair
    byte-level) — the merged-subword filter's threshold.  ``seg_src``
    overrides the segmentation CTE (held-out splits segment ALL word
    types through slice-trained merges — asyms{{k}} — instead of the
    training types' syms{{k}})."""
    seg_src = seg_src or f"syms{_BPE_MERGES}"
    return (
        train_ctes
        + f""",
    toks AS (
        SELECT doc_id, CAST(u.i AS INT) AS pos, ({_DUCK_TOKS})[u.i] AS word
        FROM documents, UNNEST(range(1, len({_DUCK_TOKS}) + 1)) AS u(i)
        WHERE length(trim(text)) > 0
    ),
    seg AS (
        SELECT t.doc_id, t.pos, s.syms
        FROM toks t JOIN {seg_src} s ON t.word = s.word
    ),
    agg AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(len(syms)) AS BIGINT) AS n_subwords,
               CAST(sum(len(list_filter(syms,
                        x -> length(x) > {base_sym_len})))
                    AS BIGINT) AS n_merged_subwords,
               md5(string_agg(array_to_string(syms, ' '), ' ' ORDER BY pos))
                   AS stream_md5
        FROM seg GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_words, 0) AS n_words,
           coalesce(a.n_subwords, 0) AS n_subwords,
           coalesce(a.n_merged_subwords, 0) AS n_merged_subwords,
           coalesce(a.stream_md5, md5('')) AS stream_md5
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """
    )


@query(
    "tokenizer_bpe_learn",
    oracle=_BPE_ORACLE,
    tags=("north-star", "text", "tokenizer"),
)
def tokenizer_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary training (Sennrich et al. 2016): the first 3 learned
    merges over the corpus — most frequent adjacent symbol pair per round,
    frequency-weighted by word type, merged non-overlapping left-to-right.
    The oracle replays every round in full: pair histogram, deterministic
    arg-max, and the sequential merge as a recursive index walk — so the
    learned merge table is value-checked end to end, not spot-checked."""
    (documents,) = load(spark, sf_dir, "documents")
    return X.bpe_learn(documents, num_merges=_BPE_MERGES)


@query(
    "tokenizer_bpe_apply",
    oracle=_bpe_apply_oracle(_BPE_TRAIN_CTES, 1),
    tags=("north-star", "text", "tokenizer"),
)
def tokenizer_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end tokenizer chain: TRAIN the BPE merge table on the corpus
    (bpe_learn, the same 3 merges tokenizer_bpe_learn verifies), then
    ENCODE every document with it (bpe_apply) and report per-doc coverage
    — word/subword/merged-subword counts plus the md5 of the complete
    in-order subword stream.  The oracle replays the full train→apply
    pipeline: every training round's histogram/arg-max/merge walk AND the
    per-word-type final segmentation joined back to token positions, so
    the trained-vocab application is value-checked end to end.

    Driver data is exactly the merge table (_BPE_MERGES rows); the encode
    pass itself folds over distinct word types only (see bpe_apply)."""
    (documents,) = load(spark, sf_dir, "documents")
    trained = (
        X.bpe_learn(documents, num_merges=_BPE_MERGES)
        .orderBy("merge_rank")
        .collect()
    )
    merges = [(r["left_sym"], r["right_sym"]) for r in trained]
    return X.bpe_apply(documents, merges)


@query(
    "tokenizer_bytebpe_learn",
    oracle=_bpe_learn_oracle(_BYTEBPE_TRAIN_CTES),
    tags=("north-star", "text", "tokenizer"),
)
def tokenizer_bytebpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level (GPT-2-style) BPE vocabulary training: words split into
    UTF-8 byte symbols (two-hex-digit spelling, operators/text.py
    byte_syms) so rare unicode degrades to byte pieces instead of <unk> —
    every possible input is representable from a 256-symbol base
    alphabet.  Same histogram / pair-count / arg-max / fold machinery as
    tokenizer_bpe_learn (ONE corpus explode+count shuffle, vocab-sized
    rounds); the oracle replays every round over the byte alphabet."""
    (documents,) = load(spark, sf_dir, "documents")
    return X.bpe_learn(documents, num_merges=_BPE_MERGES, byte_level=True)


@query(
    "tokenizer_bytebpe_apply",
    oracle=_bpe_apply_oracle(_BYTEBPE_TRAIN_CTES, 2),
    tags=("north-star", "text", "tokenizer"),
)
def tokenizer_bytebpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level train→encode chain: learn the byte-BPE merge table
    (tokenizer_bytebpe_learn's 3 merges), encode every document with it,
    and report per-doc coverage — word/subword/merged-subword counts plus
    the md5 of the in-order subword stream.  A merged subword is any
    symbol longer than one byte's hex pair (length > 2).  The oracle
    replays train AND encode end to end; driver data is exactly the
    merge table."""
    (documents,) = load(spark, sf_dir, "documents")
    trained = (
        X.bpe_learn(documents, num_merges=_BPE_MERGES, byte_level=True)
        .orderBy("merge_rank")
        .collect()
    )
    merges = [(r["left_sym"], r["right_sym"]) for r in trained]
    return X.bpe_apply(documents, merges, byte_level=True)


# ------------------------------------------------- unigram-LM tokenizer oracle
# Full-replay DuckDB mirror of operators/text.py unigram_learn/apply:
# seed substring counts, hard-EM rounds (Viterbi DP as a recursive index
# walk carrying best/backpointer lists, then frequency-weighted piece
# counts), char-preserving keep sets, add-one-smoothed integer-quantized
# costs, and the final prune — the same replay-everything posture as the
# BPE oracle above.
_UNI_L = 4
_UNI_SEED_MULTI = 48
_UNI_EM_ITERS = 2
_UNI_KEEP_MULTI = 24
_UNI_INF = X.UNIGRAM_OOV_COST  # single source of truth with the operator


def _unigram_quant_sql(src: str) -> str:
    """cost = -floor(1e6·ln((cnt+1)/(tot+K))) over kept-set CTE ``src``."""
    return (
        f"CAST(-floor(1e6 * ln((cnt + 1.0) / ((SELECT sum(cnt) FROM {src})"
        f" + (SELECT count(*) FROM {src})))) AS BIGINT)"
    )


def _unigram_vit_sql(tag: str, scores_src: str, words_src: str = "wt") -> str:
    """Viterbi segmentation of every word type under ``scores_src``
    (piece, cost): the DP carries best-cost and piece-length backpointer
    lists, each candidate encoding as (best[j]+cost)·64 + (64-piece_len)
    so list_min picks (min cost, LONGEST piece) — bit-identical to
    text.viterbi_pieces, relative-offset encoding so any word length is
    exact — then a second walk unwinds the piece lengths."""
    return f"""
        usm{tag} AS MATERIALIZED (
            SELECT map(list(piece ORDER BY piece),
                       list(cost ORDER BY piece)) AS m
            FROM {scores_src}
        ),
        uvit{tag} AS (
            SELECT word, freq, 0 AS i, [CAST(0 AS BIGINT)] AS best,
                   []::INT[] AS back
            FROM {words_src}
            UNION ALL
            SELECT word, freq, i + 1,
                   list_append(best, enc // 64),
                   list_append(back, CAST(64 - (enc % 64) AS INT))
            FROM (
                SELECT word, freq, i, best, back,
                       list_min(list_transform(
                           range(greatest(0, i + 1 - {_UNI_L}), i + 1),
                           j -> (best[j + 1]
                                 + coalesce(m[word[j + 1 : i + 1]][1],
                                            CAST({_UNI_INF} AS BIGINT)))
                                * 64 + (64 - (i + 1 - j)))) AS enc
                FROM uvit{tag}, usm{tag} WHERE i < length(word)
            )
        ),
        ubt{tag} AS (
            SELECT word, freq, length(word) AS i, back,
                   []::VARCHAR[] AS pieces
            FROM uvit{tag} WHERE i = length(word)
            UNION ALL
            SELECT word, freq, i - back[i], back,
                   list_prepend(word[i - back[i] + 1 : i], pieces)
            FROM ubt{tag} WHERE i > 0
        )"""


def _unigram_round_sql(r: int) -> str:
    """One hard-EM round: Viterbi under scores{r-1}, piece counts, the
    char-preserving keep set, and re-quantized scores."""
    return (
        _unigram_vit_sql(str(r), f"uscores{r - 1}")
        + f""",
        ucnt{r} AS MATERIALIZED (
            SELECT u.piece, CAST(sum(freq) AS BIGINT) AS cnt
            FROM (SELECT freq, pieces FROM ubt{r} WHERE i = 0) s,
                 UNNEST(s.pieces) AS u(piece)
            GROUP BY u.piece
        ),
        ukept{r} AS MATERIALIZED (
            SELECT piece, cnt FROM ucnt{r}
            UNION ALL
            SELECT c.piece, CAST(0 AS BIGINT) FROM uchars0 c
            WHERE c.piece NOT IN (SELECT piece FROM ucnt{r})
        ),
        uscores{r} AS MATERIALIZED (
            SELECT piece, {_unigram_quant_sql(f"ukept{r}")} AS cost
            FROM ukept{r}
        )"""
    )


def _unigram_train_ctes(train_where: str = "") -> str:
    """The full training-replay CTE chain, parameterized by an extra
    document predicate (held-out splits train on a slice)."""
    return (
        f"""
    WITH RECURSIVE wt AS MATERIALIZED (
        SELECT tok AS word, count(*) AS freq
        FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
        WHERE length(trim(text)) > 0{train_where}
        GROUP BY tok
    ),
    usubs0 AS MATERIALIZED (
        SELECT u.piece, CAST(sum(freq) AS BIGINT) AS cnt
        FROM wt, UNNEST(flatten(list_transform(range(1, length(word) + 1),
             s -> list_transform(
                 range(1, least({_UNI_L}, length(word) - s + 1) + 1),
                 l -> word[s : s + l - 1])))) AS u(piece)
        GROUP BY u.piece
    ),
    uchars0 AS MATERIALIZED (SELECT piece, cnt FROM usubs0 WHERE length(piece) = 1),
    umulti0 AS MATERIALIZED (
        SELECT piece, cnt FROM usubs0 WHERE length(piece) > 1
        ORDER BY cnt DESC, piece LIMIT {_UNI_SEED_MULTI}
    ),
    ukept0 AS MATERIALIZED (SELECT * FROM uchars0 UNION ALL SELECT * FROM umulti0),
    uscores0 AS MATERIALIZED (
        SELECT piece, {_unigram_quant_sql("ukept0")} AS cost FROM ukept0
    ),
    """
        + ",\n".join(
            _unigram_round_sql(r) for r in range(1, _UNI_EM_ITERS + 1)
        )
    )


_UNI_TRAIN_CTES = _unigram_train_ctes()

_UNI_FINAL_CTES = f""",
    uprun AS MATERIALIZED (
        SELECT piece, cnt FROM ukept{_UNI_EM_ITERS} WHERE length(piece) = 1
        UNION ALL
        SELECT piece, cnt FROM (
            SELECT piece, cnt FROM ukept{_UNI_EM_ITERS}
            WHERE length(piece) > 1
            ORDER BY cnt DESC, piece LIMIT {_UNI_KEEP_MULTI})
    ),
    ufinal AS MATERIALIZED (
        SELECT piece, CAST(length(piece) AS INT) AS piece_len,
               cnt AS vit_count,
               CAST(floor(1e6 * ln((cnt + 1.0) /
                    ((SELECT sum(cnt) FROM uprun)
                     + (SELECT count(*) FROM uprun)))) AS BIGINT) AS logprob_q
        FROM uprun
    )"""


@query(
    "tokenizer_unigram_learn",
    oracle=_UNI_TRAIN_CTES
    + _UNI_FINAL_CTES
    + "\n    SELECT piece, piece_len, vit_count, logprob_q FROM ufinal",
    tags=("north-star", "text", "tokenizer"),
)
def tokenizer_unigram_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-family) tokenizer TRAINING (Kudo 2018),
    hard-EM form: seed vocabulary from frequency-weighted substrings, two
    Viterbi-EM rounds with integer-quantized costs, char-preserving
    pruning, and the final add-one-smoothed quantized log-probs.  The
    oracle replays every stage — the seed histogram, each EM round's
    Viterbi DP (as a recursive best/backpointer walk), the piece counts,
    the keep sets, and the final prune — so the trained artifact is
    value-checked end to end, completing the production tokenizer pair
    next to tokenizer_bpe_learn."""
    (documents,) = load(spark, sf_dir, "documents")
    return X.unigram_learn(
        documents,
        max_piece_len=_UNI_L,
        seed_multi=_UNI_SEED_MULTI,
        em_iters=_UNI_EM_ITERS,
        keep_multi=_UNI_KEEP_MULTI,
    )


@query(
    "tokenizer_unigram_apply",
    oracle=_UNI_TRAIN_CTES
    + _UNI_FINAL_CTES
    + f""",
    uscoresF AS MATERIALIZED (SELECT piece, -logprob_q AS cost FROM ufinal),
    {_unigram_vit_sql("F", "uscoresF")},
    utoks AS MATERIALIZED (
        SELECT doc_id, CAST(u.i AS INT) AS pos, ({_DUCK_TOKS})[u.i] AS word
        FROM documents, UNNEST(range(1, len({_DUCK_TOKS}) + 1)) AS u(i)
        WHERE length(trim(text)) > 0
    ),
    useg AS MATERIALIZED (
        SELECT t.doc_id, t.pos, s.pieces
        FROM utoks t JOIN (SELECT word, pieces FROM ubtF WHERE i = 0) s
          ON t.word = s.word
    ),
    uagg AS MATERIALIZED (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(len(pieces)) AS BIGINT) AS n_pieces,
               CAST(sum(len(list_filter(pieces, x -> length(x) > 1)))
                    AS BIGINT) AS n_multi_pieces,
               md5(string_agg(array_to_string(pieces, ' '), ' ' ORDER BY pos))
                   AS stream_md5
        FROM useg GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_words, 0) AS n_words,
           coalesce(a.n_pieces, 0) AS n_pieces,
           coalesce(a.n_multi_pieces, 0) AS n_multi_pieces,
           coalesce(a.stream_md5, md5('')) AS stream_md5
    FROM documents d LEFT JOIN uagg a USING (doc_id)
    """,
    tags=("north-star", "text", "tokenizer"),
)
def tokenizer_unigram_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end unigram tokenizer chain: TRAIN the vocabulary on the
    corpus (unigram_learn — the same artifact tokenizer_unigram_learn
    verifies), then Viterbi-ENCODE every document with it and report
    per-doc coverage — word/piece/multi-char-piece counts plus the md5 of
    the complete in-order piece stream, the twin of tokenizer_bpe_apply.
    The oracle replays the full train→apply pipeline including the final
    pruned-vocab Viterbi segmentation joined back to token positions.

    Driver data is exactly the pruned vocabulary (chars + {keep} rows);
    the encode pass folds over distinct word types only (unigram_apply).
    """.format(keep=_UNI_KEEP_MULTI)
    (documents,) = load(spark, sf_dir, "documents")
    art = X.unigram_learn(
        documents,
        max_piece_len=_UNI_L,
        seed_multi=_UNI_SEED_MULTI,
        em_iters=_UNI_EM_ITERS,
        keep_multi=_UNI_KEEP_MULTI,
    ).collect()
    costs = {r["piece"]: -int(r["logprob_q"]) for r in art}
    return X.unigram_apply(
        documents, costs, max_piece_len=_UNI_L
    )


@query(
    "tokenizer_unigram_heldout",
    oracle=_unigram_train_ctes(" AND doc_id % 2 = 0")
    + _UNI_FINAL_CTES
    + f""",
    uscoresF AS MATERIALIZED (SELECT piece, -logprob_q AS cost FROM ufinal),
    hwt AS MATERIALIZED (
        SELECT tok AS word, count(*) AS freq
        FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
        WHERE length(trim(text)) > 0 AND doc_id % 2 = 1
        GROUP BY tok
    ),
    {_unigram_vit_sql("F", "uscoresF", "hwt")},
    utoks AS MATERIALIZED (
        SELECT doc_id, CAST(u.i AS INT) AS pos, ({_DUCK_TOKS})[u.i] AS word
        FROM documents, UNNEST(range(1, len({_DUCK_TOKS}) + 1)) AS u(i)
        WHERE length(trim(text)) > 0 AND doc_id % 2 = 1
    ),
    useg AS MATERIALIZED (
        SELECT t.doc_id, t.pos, s.pieces
        FROM utoks t JOIN (SELECT word, pieces FROM ubtF WHERE i = 0) s
          ON t.word = s.word
    ),
    uagg AS MATERIALIZED (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(len(pieces)) AS BIGINT) AS n_pieces,
               CAST(sum(len(list_filter(pieces, x -> length(x) > 1)))
                    AS BIGINT) AS n_multi_pieces,
               md5(string_agg(array_to_string(pieces, ' '), ' ' ORDER BY pos))
                   AS stream_md5
        FROM useg GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_words, 0) AS n_words,
           coalesce(a.n_pieces, 0) AS n_pieces,
           coalesce(a.n_multi_pieces, 0) AS n_multi_pieces,
           coalesce(a.stream_md5, md5('')) AS stream_md5
    FROM documents d LEFT JOIN uagg a USING (doc_id)
    WHERE d.doc_id % 2 = 1
    """,
    tags=("north-star", "text", "tokenizer"),
)
def tokenizer_unigram_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION tokenizer split: TRAIN the unigram-LM vocabulary on
    half the corpus (doc_id % 2 = 0), Viterbi-ENCODE the HELD-OUT half —
    documents (and word types) the trainer never saw.  Unseen words
    segment through the retained single characters; the artifact
    generalizes exactly as SentencePiece's does.  The oracle replays the
    slice-trained EM end to end AND the final segmentation over the
    held-out word types, so train/apply leakage (training on the full
    corpus by accident) flips the hash immediately."""
    (documents,) = load(spark, sf_dir, "documents")
    train = documents.where(F.col("doc_id") % 2 == 0)
    held = documents.where(F.col("doc_id") % 2 == 1)
    art = X.unigram_learn(
        train,
        max_piece_len=_UNI_L,
        seed_multi=_UNI_SEED_MULTI,
        em_iters=_UNI_EM_ITERS,
        keep_multi=_UNI_KEEP_MULTI,
    ).collect()
    costs = {r["piece"]: -int(r["logprob_q"]) for r in art}
    return X.unigram_apply(held, costs, max_piece_len=_UNI_L)


def _duck_entropy_cte(src: str, prefix: str = "ent") -> str:
    """CTE chunk computing (doc_id, n, char_entropy) from ``src`` —
    shared verbatim by text_char_entropy and the v2 funnel so the two
    oracles can never drift apart."""
    return f"""
        {prefix}_base AS (
            SELECT doc_id, length(trim(text)) AS n,
                   string_split(trim(text), '') AS chars
            FROM {src}
        ),
        {prefix}_cnt AS (
            SELECT doc_id, n,
                   list_sort(list_transform(list_distinct(chars),
                       c -> len(list_filter(chars, x -> x = c)))) AS counts
            FROM {prefix}_base
        ),
        {prefix} AS (
            SELECT doc_id, n,
                   CASE WHEN n = 0 THEN 0.0 ELSE round(
                       ln(CAST(n AS DOUBLE))
                       - list_aggregate(list_transform(counts,
                             c -> CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))),
                         'sum') / CAST(n AS DOUBLE), 4) END AS char_entropy
            FROM {prefix}_cnt
        )"""


@query(
    "text_char_entropy",
    oracle=f"""
        WITH {_duck_entropy_cte("documents")}
        SELECT doc_id, CAST(n AS BIGINT) AS n_chars, char_entropy FROM ent
    """,
    tags=("north-star", "text"),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon character entropy (nats, 4dp) — the classic
    gibberish/boilerplate quality signal.  Both engines fold c·ln(c) over
    the SORTED count multiset, so the float sum is order-identical and the
    rounding can never flip cross-engine."""
    (documents,) = load(spark, sf_dir, "documents")
    return documents.select(
        "doc_id",
        F.length(F.trim("text")).cast("bigint").alias("n_chars"),
        X.char_entropy(F.col("text")).alias("char_entropy"),
    )


def _duck_gopher_cte(src: str) -> str:
    """CTE chunk computing per-doc Gopher rule flags (``gflags``) from
    ``src`` — shared verbatim by text_gopher_rules and the v2 funnel."""
    return f"""
        gbase AS (
            SELECT doc_id,
                   trim(text) AS t,
                   {_DUCK_TOKS} AS toks,
                   string_split(trim(text), chr(10)) AS lines
            FROM {src}
        ),
        gsig AS (
            SELECT doc_id,
                   len(toks) AS n,
                   coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
                       AS sum_len,
                   len(list_intersect(list_transform(toks, x -> lower(x)),
                       ['the', 'a', 'and', 'of', 'to', 'in', 'is'])) AS n_stop,
                   coalesce(list_max(list_transform(list_distinct(toks),
                       d -> len(list_filter(toks, x -> x = d)))), 0) AS top_freq,
                   length(t) - length(replace(t, '#', '')) AS n_hash,
                   (length(t) - length(replace(t, '...', ''))) // 3 AS n_ell,
                   len(lines) AS n_lines,
                   len(list_filter(lines, l -> ltrim(l) LIKE '-%'
                       OR ltrim(l) LIKE '*%')) AS n_bullet,
                   len(list_filter(lines, l -> rtrim(l) LIKE '%...'))
                       AS n_ell_lines,
                   len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                       AS n_alpha_words
            FROM gbase
        ),
        gflags AS (
            SELECT doc_id,
                   n >= 20 AND n <= 80 AS words_in_range,
                   n > 0 AND 3 * n <= sum_len AND sum_len <= 10 * n
                       AS mean_word_len_ok,
                   n_stop >= 2 AS stopwords_ok,
                   n > 0 AND 10 * top_freq <= n AS top_token_ok,
                   10 * (n_hash + n_ell) <= n AS symbol_ratio_ok,
                   10 * n_bullet <= 9 * n_lines AS bullet_lines_ok,
                   10 * n_ell_lines <= 3 * n_lines AS ellipsis_lines_ok,
                   n > 0 AND 5 * n_alpha_words >= 4 * n AS alpha_words_ok
            FROM gsig
        )"""


_DUCK_GOPHER_NFAILED = """
    CAST(  (CASE WHEN words_in_range THEN 0 ELSE 1 END)
         + (CASE WHEN mean_word_len_ok THEN 0 ELSE 1 END)
         + (CASE WHEN stopwords_ok THEN 0 ELSE 1 END)
         + (CASE WHEN top_token_ok THEN 0 ELSE 1 END)
         + (CASE WHEN symbol_ratio_ok THEN 0 ELSE 1 END)
         + (CASE WHEN bullet_lines_ok THEN 0 ELSE 1 END)
         + (CASE WHEN ellipsis_lines_ok THEN 0 ELSE 1 END)
         + (CASE WHEN alpha_words_ok THEN 0 ELSE 1 END) AS INT)
"""


@query(
    "text_gopher_rules",
    oracle=f"""
        WITH {_duck_gopher_cte("documents")}
        SELECT *, CAST(
                   (CASE WHEN words_in_range THEN 0 ELSE 1 END)
                 + (CASE WHEN mean_word_len_ok THEN 0 ELSE 1 END)
                 + (CASE WHEN stopwords_ok THEN 0 ELSE 1 END)
                 + (CASE WHEN top_token_ok THEN 0 ELSE 1 END)
                 + (CASE WHEN symbol_ratio_ok THEN 0 ELSE 1 END)
                 + (CASE WHEN bullet_lines_ok THEN 0 ELSE 1 END)
                 + (CASE WHEN ellipsis_lines_ok THEN 0 ELSE 1 END)
                 + (CASE WHEN alpha_words_ok THEN 0 ELSE 1 END) AS INT)
                   AS n_failed,
               words_in_range AND mean_word_len_ok AND stopwords_ok
                 AND top_token_ok AND symbol_ratio_ok AND bullet_lines_ok
                 AND ellipsis_lines_ok AND alpha_words_ok AS passed
        FROM gflags
    """,
    tags=("north-star", "text", "curation"),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style (Rae et al. 2021) quality rule bundle: eight published
    surface heuristics as bit-reproducible integer-arithmetic flags, plus
    n_failed and an overall passed verdict — the rule-based pre-filter a
    pretraining pipeline runs before any shuffle-bearing pass.  Pure
    row-parallel column expressions: ZERO shuffles at any corpus size."""
    (documents,) = load(spark, sf_dir, "documents")
    return X.gopher_rules(documents)


@query(
    "text_repeated_span_fraction",
    oracle="""
        WITH g AS (
            SELECT doc_id AS did, u.gram
            FROM documents, UNNEST(list_transform(
                 range(1, length(trim(text)) - 20 + 2),
                 i -> substr(trim(text), i, 20))) AS u(gram)
            WHERE length(trim(text)) >= 20
        ),
        df AS (SELECT gram, count(DISTINCT did) AS nd FROM g GROUP BY gram),
        m AS (SELECT did, (nd >= 2) AS hit FROM g JOIN df USING (gram))
        SELECT did AS doc_id,
               count(*) AS n_pos,
               count(*) FILTER (hit) AS n_shared,
               round(count(*) FILTER (hit) / CAST(count(*) AS DOUBLE), 4)
                   AS shared_frac
        FROM m GROUP BY did
    """,
    tags=("north-star", "text", "dedup"),
)
def text_repeated_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication metric (Lee et al. 2022): the fraction
    of each document's char-20-gram positions whose gram recurs in another
    document — every repeated span of length ≥ 20 contains such a gram, so
    df ≥ 2 on fixed-k grams is the distributed stand-in for suffix-array
    repeated-substring mining.  Exact, fully replayed by the oracle."""
    (documents,) = load(spark, sf_dir, "documents")
    return X.repeated_span_stats(documents, k=20)


def _duck_span_ctes(src: str, p: str = "sr") -> str:
    """CTE chunk replaying remove_repeated_spans over ``src`` (needs
    doc_id + text): ends with ``{p}(doc_id, n_spans, n_removed_chars,
    cleaned)`` — shared by text_span_removal and curate_end_to_end."""
    return f"""
        {p}_d AS (SELECT doc_id, trim(text) AS t FROM {src}),
        {p}_g AS (
            SELECT doc_id, CAST(u.i AS BIGINT) - 1 AS p,
                   substr(t, CAST(u.i AS INT), 20) AS gram
            FROM {p}_d, UNNEST(range(1, length(t) - 20 + 2)) AS u(i)
            WHERE length(t) >= 20
        ),
        {p}_dup AS (
            SELECT gram FROM (
                SELECT gram, count(DISTINCT doc_id) AS nd
                FROM {p}_g GROUP BY gram
            ) WHERE nd >= 2
        ),
        {p}_h AS (
            SELECT doc_id, p FROM {p}_g
            WHERE gram IN (SELECT gram FROM {p}_dup)
        ),
        {p}_i1 AS (
            SELECT doc_id, p,
                   CASE WHEN p - lag(p) OVER (PARTITION BY doc_id ORDER BY p)
                             > 20 THEN 1 ELSE 0 END AS brk
            FROM {p}_h
        ),
        {p}_i2 AS (
            SELECT doc_id, p,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY p) AS isl
            FROM {p}_i1
        ),
        {p}_sp AS (
            SELECT doc_id, min(p) AS s, max(p) + 20 AS e
            FROM {p}_i2 GROUP BY doc_id, isl
        ),
        {p}_sp2 AS (
            SELECT doc_id, s, e,
                   coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0)
                       AS pe
            FROM {p}_sp
        ),
        {p}_agg AS (
            SELECT {p}_sp2.doc_id,
                   string_agg(substr(d.t, CAST(pe + 1 AS INT),
                                     CAST(s - pe AS INT)), '' ORDER BY s)
                       AS head,
                   max(e) AS laste,
                   CAST(count(*) AS INT) AS n_spans,
                   CAST(sum(e - s) AS BIGINT) AS n_removed_chars
            FROM {p}_sp2 JOIN {p}_d d ON {p}_sp2.doc_id = d.doc_id
            GROUP BY {p}_sp2.doc_id
        ),
        {p} AS (
            SELECT d.doc_id,
                   coalesce(a.n_spans, 0) AS n_spans,
                   coalesce(a.n_removed_chars, 0) AS n_removed_chars,
                   CASE WHEN a.doc_id IS NULL THEN d.t
                        ELSE coalesce(a.head, '')
                             || substr(d.t, CAST(a.laste + 1 AS INT))
                   END AS cleaned
            FROM {p}_d d LEFT JOIN {p}_agg a ON d.doc_id = a.doc_id
        )"""


@query(
    "text_span_removal",
    oracle=f"""
        WITH {_duck_span_ctes("documents")}
        SELECT doc_id, n_spans, n_removed_chars, md5(cleaned) AS cleaned_md5
        FROM sr
    """,
    tags=("north-star", "text", "dedup", "curation"),
)
def text_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span REMOVAL (Lee et al. 2022) — the destructive
    counterpart of text_repeated_span_fraction: every char position
    covered by a df≥2 char-20-gram is excised (overlapping/adjacent gram
    hits merged into maximal spans), and the md5 of each reassembled
    document pins the entire explode → df → islands → cut → reassemble
    machinery against the full DuckDB replay, exactly as
    text_segment_dedup does for line-level dedup."""
    (documents,) = load(spark, sf_dir, "documents")
    out = X.remove_repeated_spans(documents, k=20)
    return out.select(
        "doc_id",
        "n_spans",
        F.col("n_removed_chars").cast("bigint").alias("n_removed_chars"),
        F.md5("cleaned").alias("cleaned_md5"),
    )


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


# Quality score in integer basis points (same arithmetic as
# operators/text.py quality_score_bp; mirrors north_star._DUCK_QUALITY_BP).
_DUCK_QUALITY_BP = """
    CAST(4 * least(n_chars * 20, 10000)
       + 3 * (CASE WHEN n_toks > 0
                   AND n_chars - (n_toks - 1) >= 2 * n_toks
                   AND n_chars - (n_toks - 1) <= 12 * n_toks
              THEN 10000 ELSE 0 END)
       + 3 * (CASE WHEN n_chars = 0 THEN 0
              ELSE (n_alpha * 10000) // n_chars END) AS BIGINT)
"""


@query(
    "curate_funnel_report",
    oracle=f"""
        WITH corpus AS (SELECT * FROM documents WHERE doc_id % 20 <> 0),
        k1 AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                    ORDER BY doc_id) AS rn
                FROM corpus)
            WHERE rn = 1
        ),
        sh AS (
            SELECT DISTINCT doc_id AS did, s.tok
            FROM k1, UNNEST({_DUCK_TRIGRAMS}) AS s(tok)
        ),
        bsh AS (
            SELECT DISTINCT s.tok
            FROM documents, UNNEST({_DUCK_TRIGRAMS}) AS s(tok)
            WHERE doc_id % 20 = 0
        ),
        tot AS (SELECT did, count(*) AS n FROM sh GROUP BY did),
        hit AS (SELECT did, count(*) AS h
                FROM sh JOIN bsh USING (tok) GROUP BY did),
        contam AS (
            SELECT hit.did FROM hit JOIN tot ON hit.did = tot.did
            WHERE round(h / CAST(n AS DOUBLE), 4) >= 0.02
        ),
        k2 AS (SELECT * FROM k1
               WHERE doc_id NOT IN (SELECT did FROM contam)),
        scored AS (
            SELECT doc_id, text,
                   length(trim(text)) AS n_chars,
                   len({_DUCK_TOKS}) AS n_toks,
                   length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g')) AS n_alpha
            FROM k2
        ),
        k3 AS (SELECT doc_id, text FROM scored
               WHERE {_DUCK_QUALITY_BP} >= 70000),
        k4 AS (
            SELECT doc_id FROM (
                SELECT doc_id,
                       round(1.0 - len(list_distinct({_DUCK_TOKS}))
                             / CAST(len({_DUCK_TOKS}) AS DOUBLE), 4) AS dup_ratio
                FROM k3 WHERE len({_DUCK_TOKS}) > 0)
            WHERE dup_ratio <= 0.65
        )
        SELECT 'input' AS stage, count(*) AS n_kept FROM corpus
        UNION ALL SELECT 'exact_dedup', count(*) FROM k1
        UNION ALL SELECT 'decontaminate', count(*) FROM k2
        UNION ALL SELECT 'quality', count(*) FROM k3
        UNION ALL SELECT 'repetition', count(*) FROM k4
    """,
    tags=("north-star", "curation"),
)
def curate_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation pipeline as one funnel: exact dedup (min-id per
    fingerprint) → benchmark decontamination (trigram overlap ≥ 2%) →
    quality gate (≥ 70000 bp) → repetition gate (dup-token ratio ≤ 0.65),
    reporting surviving-document counts per stage.

    This is the composition a pretraining ingest runs per batch — every
    stage is the exact operator verified individually by its own query.

    SINGLE-PASS shape: instead of materializing survivor frames per stage
    (five counting actions + persisted intermediates), every gate becomes a
    per-document boolean — dedup survivor (fingerprint window), trigram
    contamination (per-doc ratio, identical whichever superset it is
    computed on), quality score (pure expression), repetition ratio — and
    the five funnel counts are ONE conditional aggregation over the flag
    frame.  One action, no caching, exchange reuse handles the shared
    subtrees; per-doc signal frames join on doc_id ahead of the count.
    At 100 TB this is the observe()-style pattern: counts ride the pass
    that computes the flags, nothing is re-scanned per stage.
    """
    from pyspark.sql import Window

    from aws_genaric_datapipeline_spark.operators.text import fingerprint

    (documents,) = load(spark, sf_dir, "documents")
    bench = documents.where(F.col("doc_id") % 20 == 0)
    corpus = documents.where(F.col("doc_id") % 20 != 0)

    fp_w = Window.partitionBy(fingerprint(F.col("text"))).orderBy("doc_id")
    flagged = corpus.select(
        "doc_id",
        "text",
        (F.row_number().over(fp_w) == 1).alias("is_k1"),
    )

    contam = (
        D.contamination_overlap(corpus, bench, n=3)
        .where(F.col("contamination_ratio") >= 0.02)
        .select("doc_id", F.lit(True).alias("is_contam"))
    )
    rep = X.repetition_stats(corpus).select(
        "doc_id", (F.col("dup_token_ratio") <= 0.65).alias("rep_ok")
    )

    flags = (
        flagged.join(contam, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .select(
            F.col("is_k1"),
            (F.col("is_k1") & ~F.coalesce("is_contam", F.lit(False))).alias("k2"),
            "rep_ok",
            (X.quality_score_bp(F.col("text")) >= 70000).alias("q_ok"),
        )
        .select(
            "is_k1",
            "k2",
            (F.col("k2") & F.col("q_ok")).alias("k3"),
            (F.col("k2") & F.col("q_ok") & F.coalesce("rep_ok", F.lit(False))).alias("k4"),
        )
    )
    totals = flags.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.sum(F.col("is_k1").cast("long")).alias("n_k1"),
        F.sum(F.col("k2").cast("long")).alias("n_k2"),
        F.sum(F.col("k3").cast("long")).alias("n_k3"),
        F.sum(F.col("k4").cast("long")).alias("n_k4"),
    )
    return totals.selectExpr(
        "stack(5, 'input', n_input, 'exact_dedup', n_k1, "
        "'decontaminate', n_k2, 'quality', n_k3, 'repetition', n_k4) "
        "AS (stage, n_kept)"
    )


@query(
    "search_phrase_positions",
    oracle=f"""
        SELECT doc_id,
               CAST(len(list_filter({_DUCK_BIGRAMS}, g -> g = 'spark join'))
                    AS BIGINT) AS n_hits
        FROM documents
        WHERE len(list_filter({_DUCK_BIGRAMS}, g -> g = 'spark join')) > 0
    """,
    tags=("north-star", "text", "search"),
)
def search_phrase_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("spark join") via a positional postings join:
    posexplode token positions, then self-join term-A postings to term-B
    postings at pos+1 — the inverted-index phrase-match shape, where work
    scales with the two terms' posting lists, not the corpus.  The oracle
    recomputes the same matches declaratively by counting bigram hits."""
    from aws_genaric_datapipeline_spark.operators.text import tokens

    (documents,) = load(spark, sf_dir, "documents")
    toks = documents.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    )
    a = toks.where(F.col("tok") == "spark").select("doc_id", F.col("pos").alias("pa"))
    b = toks.where(F.col("tok") == "join").select(
        F.col("doc_id").alias("did_b"), F.col("pos").alias("pb")
    )
    return (
        a.join(b, (F.col("doc_id") == F.col("did_b")) & (F.col("pb") == F.col("pa") + 1))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


# Dense-tier thresholds for sim_tfidf_cosine_pairs (module-level so the
# tier-equivalence test can force the sparse tier on a small corpus).
# These are the HARD CEILINGS; the effective caps are the min of these and
# a spark.driver.memory-derived budget (see _tfidf_dense_caps), overridable
# per-session via spark conf.  Sizing rule documented in SCALING.md.
_TFIDF_DENSE_VOCAB_CAP = 4096
_TFIDF_DENSE_CELLS_CAP = 200_000_000  # docs × vocab broadcast budget
_TFIDF_DENSE_NNZ_CAP = 25_000_000  # Arrow-fetched (did, tok, w) rows


def _parse_jvm_mem(s: str) -> int:
    """Parse a JVM memory string ('2g', '512m', '1024k', '12345') to bytes."""
    s = s.strip().lower()
    mult = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] in mult:
        return int(float(s[:-1]) * mult[s[-1]])
    return int(s)


def _tfidf_dense_caps(spark: SparkSession) -> tuple[int, int, int]:
    """Effective (vocab_cap, cells_cap, nnz_cap) for the dense tf-idf tier.

    The doc×vocab float64 matrix costs cells×8 bytes on the driver and is
    broadcast once; we budget it at 1/16 of spark.driver.memory, so
    cells_cap = mem/128 (matrix + its broadcast pickle + headroom).  The
    Arrow nnz fetch costs ~40 bytes/row in pandas; nnz_cap = mem/160.
    Each is clamped by the module ceiling (so tests monkeypatching the
    module constants still force tiers) and overridable via spark conf:
      spark.genaric.tfidf.denseVocabCap / denseCellsCap / denseNnzCap.
    """
    # Prefer the JVM's ACTUAL max heap (Runtime.maxMemory) — Spark's
    # default driver heap is 1g, so a "2g" fallback would double the
    # intended 1/16-of-heap budget on default-configured drivers.
    mem = None
    try:
        jvm = spark.sparkContext._jvm
        if jvm is not None:
            mem = int(jvm.java.lang.Runtime.getRuntime().maxMemory())
    except Exception:
        mem = None
    if not mem or mem <= 0:
        try:
            mem = _parse_jvm_mem(spark.conf.get("spark.driver.memory", "1g"))
        except ValueError:
            mem = 1 << 30
    caps = []
    for key, ceiling, derived in (
        ("spark.genaric.tfidf.denseVocabCap", _TFIDF_DENSE_VOCAB_CAP, None),
        ("spark.genaric.tfidf.denseCellsCap", _TFIDF_DENSE_CELLS_CAP, mem // 128),
        ("spark.genaric.tfidf.denseNnzCap", _TFIDF_DENSE_NNZ_CAP, mem // 160),
    ):
        conf_val = spark.conf.get(key, None)
        if conf_val is not None:
            caps.append(int(conf_val))
        elif derived is not None:
            caps.append(min(ceiling, derived))
        else:
            caps.append(ceiling)
    return caps[0], caps[1], caps[2]


@query(
    "sim_tfidf_cosine_pairs",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id AS did, t.tok
            FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
            WHERE length(trim(text)) > 0
        ),
        tf AS (SELECT did, tok, count(*) AS tf FROM toks GROUP BY did, tok),
        df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT count(DISTINCT did) AS n FROM tf),
        w AS (
            SELECT did, tf.tok, tf * ln(n / CAST(df AS DOUBLE)) AS w
            FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
            WHERE df < n
        ),
        norms AS (SELECT did, sqrt(sum(w * w)) AS nr FROM w GROUP BY did),
        dots AS (
            SELECT a.did AS id_a, b.did AS id_b, sum(a.w * b.w) AS dot
            FROM w a JOIN w b ON a.tok = b.tok AND a.did < b.did
            GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(dot / (na.nr * nb.nr), 4) AS tfidf_cosine
        FROM dots
        JOIN norms na ON id_a = na.did
        JOIN norms nb ON id_b = nb.did
        WHERE round(dot / (na.nr * nb.nr), 4) >= 0.85
    """,
    tags=("north-star", "similarity", "text"),
)
def sim_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-IDF cosine similarity pairs (≥ 0.85) — the lexical
    complement to the dense-embedding cosine path (sim_cosine_near_pairs),
    with TWO execution tiers picked by corpus shape:

    - DENSE tier (vocabulary ≤ 4096 distinct terms AND the doc×vocab
      matrix fits a broadcast): materialize each document's tf-idf vector
      over the indexed vocabulary and compute all-pairs cosine as a
      BLOCKED MATRIX PRODUCT (mapInPandas blocks × broadcast matrix, BLAS
      dgemm).  Small-vocab/template corpora (this fixture: 31 terms,
      every doc pair collides) are DENSE problems — an inverted-index
      join degenerates to Σ df² ≈ N² rows of shuffle (round-9 shape:
      118 s at sf0.1), while the matmul is sub-second arithmetic.
    - SPARSE tier (real Zipf vocabularies): Bayardo-style PREFIX-FILTERED
      inverted self-join.  Per doc, order terms rarest-first over the
      unit-normalized vector and index only the prefix whose running tail
      norm ≥ t_cand; a pair sharing no term in either prefix has (by
      Cauchy-Schwarz over the shared terms, all in both tails)
      cos < t_cand² < t, so candidates = prefix⋈full is EXACT, and
      ubiquitous stopwords land in tails — their join buckets shrink from
      df² to (dominated-docs)×df.

    Both tiers are exact all-pairs: this query is the oracle anchor of
    the similarity family; the 100 TB path for unbounded corpora is the
    LSH/SemDeDup tier (sim_lsh_near_pairs, dedup_semantic_embeddings)."""
    from aws_genaric_datapipeline_spark.operators.text import tokens

    from pyspark.sql import Window

    T_OUT = 0.85
    T_CAND = 0.80
    DENSE_VOCAB_CAP, DENSE_CELLS_CAP, DENSE_NNZ_CAP = _tfidf_dense_caps(spark)
    (documents,) = load(spark, sf_dir, "documents")
    toks = documents.select(
        F.col("doc_id").alias("did"), F.explode(tokens(F.col("text"))).alias("tok")
    )
    # tf feeds THREE subtrees of the w checkpoint job (the stream side,
    # the df_t broadcast build, and the n broadcast build): persist it so
    # the corpus explode+count runs once, not three times, inside that
    # job; the cache is released as soon as w is pinned.
    tf = toks.groupBy("did", "tok").agg(F.count(F.lit(1)).alias("tf")).persist()
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = tf.agg(F.countDistinct("did").alias("n"))
    w = (
        tf.join(F.broadcast(df_t), "tok")
        .crossJoin(F.broadcast(n))
        .where(F.col("df") < F.col("n"))
        .select(
            "did",
            "tok",
            "df",
            (F.col("tf") * F.log(F.col("n") / F.col("df").cast("double"))).alias("w"),
        )
        .localCheckpoint(eager=True)  # reused by every tier; cut the explode
    )

    # tier decision from BOUNDED driver data only: a ≤ CAP+1-row vocab
    # fetch plus one distributed agg — ALL caps (vocab, docs×vocab cells,
    # AND nnz row count) are checked BEFORE any corpus-sized fetch, so an
    # oversized matrix or a dense-ish nnz set falls through to the sparse
    # tier without the driver ever materializing it.  The nnz fetch itself
    # is Arrow-batched (toPandas), never a collect() of Python Row objects.
    # tf stays cached through this fetch — df_t derives from it — and is
    # released only once every tf consumer (w AND the vocab probe) has run.
    vocab_rows = df_t.limit(DENSE_VOCAB_CAP + 1).collect()
    tf.unpersist()
    if len(vocab_rows) <= DENSE_VOCAB_CAP:
        sizes = w.agg(
            F.countDistinct("did").alias("nd"), F.count(F.lit(1)).alias("nnz")
        ).collect()[0]
        if (
            sizes["nd"] * len(vocab_rows) <= DENSE_CELLS_CAP
            and sizes["nnz"] <= DENSE_NNZ_CAP
        ):
            vocab = sorted(r["tok"] for r in vocab_rows)
            vidx = {t: i for i, t in enumerate(vocab)}
            nnz_pdf = w.select("did", "tok", "w").toPandas()
            return _tfidf_dense_pairs(spark, nnz_pdf, vidx, T_OUT)
        # fall through to the sparse tier if the matrix or nnz is too large

    norms = w.groupBy("did").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nr"))
    tail = (
        Window.partitionBy("did")
        .orderBy(F.asc("df"), F.asc("tok"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prefix = (
        w.join(norms.withColumnRenamed("did", "ndid"), F.col("did") == F.col("ndid"))
        .select("did", "tok", "df", ((F.col("w") / F.col("nr")) ** 2).alias("nw2"))
        .withColumn("tail2", F.sum("nw2").over(tail))
        .where(F.col("tail2") >= F.lit(T_CAND * T_CAND))
        .select("did", "tok")
    )
    cand = (
        prefix.select(F.col("did").alias("id_a"), "tok")
        .join(w.select(F.col("did").alias("id_b"), "tok"), "tok")
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .distinct()
    )
    dots = (
        cand.join(
            w.select(F.col("did").alias("id_a"), "tok", F.col("w").alias("wa")),
            "id_a",
        )
        .join(
            w.select(F.col("did").alias("id_b"), "tok", F.col("w").alias("wb")),
            ["id_b", "tok"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = F.round(
        F.col("dot") / (F.col("na.nr") * F.col("nb.nr")), 4
    ).alias("tfidf_cosine")
    return (
        dots.join(norms.alias("na"), F.col("id_a") == F.col("na.did"))
        .join(norms.alias("nb"), F.col("id_b") == F.col("nb.did"))
        .select("id_a", "id_b", cos)
        .where(F.col("tfidf_cosine") >= F.lit(T_OUT))
    )


def _tfidf_dense_pairs(spark, nnz_pdf, vidx: dict, t_out: float) -> DataFrame:
    """Dense tier of sim_tfidf_cosine_pairs: doc×vocab tf-idf matrix is
    broadcast; executors each take a BLOCK of documents (mapInPandas) and
    emit that block's qualifying pairs from one BLAS matrix product —
    O(N²V) flops but zero shuffled candidate rows, the same blocked-brute
    shape as the embedding exact tier (operators/similarity.py
    cosine_near_pairs(exact=True), minus its crossJoin row explosion).

    ``nnz_pdf`` is the Arrow-fetched (did, tok, w) pandas frame — bounded
    by the caller's nnz cap — and the matrix is filled with one vectorized
    fancy-index assignment, never a per-Row python loop."""
    import numpy as np
    import pandas as pd

    ids = np.sort(nnz_pdf["did"].unique()).astype(np.int64)
    pos = pd.Series(np.arange(len(ids)), index=ids)
    mat = np.zeros((len(ids), len(vidx)), dtype=np.float64)
    mat[
        pos[nnz_pdf["did"].to_numpy()].to_numpy(),
        nnz_pdf["tok"].map(vidx).to_numpy(),
    ] = nnz_pdf["w"].to_numpy()
    nr = np.sqrt((mat * mat).sum(axis=1))
    id_arr = ids
    bc = spark.sparkContext.broadcast((id_arr, mat, nr))

    def gen(batches):
        import numpy as np

        ids_all, m_all, nr_all = bc.value
        for pdf in batches:
            block = pdf["i"].to_numpy()
            dots = m_all[block] @ m_all.T  # BLAS: block × corpus
            # HALF_UP to 4 dp (values non-negative: tf-idf weights ≥ 0),
            # matching Spark F.round and the DuckDB oracle's round() —
            # np.round is half-to-even and can disagree on threshold ties.
            cos = (
                np.floor(dots / np.outer(nr_all[block], nr_all) * 1e4 + 0.5)
                / 1e4
            )
            bi, bj = np.nonzero(
                (cos >= t_out) & (ids_all[block][:, None] < ids_all[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": ids_all[block][bi],
                    "id_b": ids_all[bj],
                    "tfidf_cosine": cos[bi, bj],
                }
            )

    # Block ids come from spark.range — JVM-side, already split into
    # contiguous partitions — instead of createDataFrame(N driver rows)
    # + a keyless repartition, which cost a driver-side row conversion
    # AND a full exchange (with its mandatory pre-sort) just to deal
    # blocks (measured 1.3 s -> 0.4 s for the block job at sf0.1).
    nparts = max(2, len(ids) // 512)
    blocks = spark.range(0, len(ids), 1, numPartitions=nparts).select(
        F.col("id").cast("int").alias("i")
    )
    return blocks.mapInPandas(
        gen, schema="id_a bigint, id_b bigint, tfidf_cosine double"
    )


@query(
    "curate_sequence_packing",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, len({_DUCK_TOKS}) AS n
            FROM documents WHERE length(trim(text)) > 0
        ),
        c AS (
            SELECT doc_id, n,
                   coalesce(sum(n) OVER (ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS cum_before
            FROM t
        )
        SELECT CAST(cum_before // 2048 AS BIGINT) AS bin_id,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n) AS BIGINT) AS total_tokens,
               CAST(sum(n) * 10000 // 2048 AS BIGINT) AS fill_bp
        FROM c GROUP BY 1
    """,
    tags=("north-star", "curation", "packing"),
)
def curate_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training SEQUENCE PACKING at corpus scale: pack documents into
    fixed-token-budget bins (2048) by contiguous greedy assignment —
    each doc's bin is floor(tokens-before-it / budget) in deterministic
    doc_id order, the streaming packing rule a tokenizer-side batcher
    applies (a doc that straddles a boundary overflows its bin by < one
    doc, the standard trade against re-ordering).  Emits per-bin
    occupancy: doc count, token total, and fill rate in basis points
    (the padding-waste signal that decides whether the budget or the
    ordering needs tuning).

    Relation to pack_token_bins (training_prep.py): that query emits the
    per-document assignment via a single per-language window — fine when
    every stratum fits one task; THIS query is the whale-safe form (the
    running count is two-level, no stratum-sized window state) and the
    occupancy REPORT consumed by batch-size planning.

    Scale: the global running token count is inherently sequential, so
    it is computed TWO-LEVEL exactly like events_late_arrival_profile —
    per-1000-doc-bucket sums first (ordinary aggregation), the running
    offset over the TINY bucket frame, broadcast back and added to the
    within-bucket cumulative sum.  Identical arithmetic to a single
    global window (offsets telescope), which is what the oracle runs —
    but no single-partition global sort ever touches corpus-sized data."""
    from pyspark.sql import Window

    BUDGET = 2048
    (documents,) = load(spark, sf_dir, "documents")
    toks = documents.where(F.length(F.trim("text")) > 0).select(
        "doc_id",
        F.expr("doc_id div 1000").alias("bkt"),
        F.size(X.tokens(F.col("text"))).cast("bigint").alias("n_toks"),
    )
    btot = toks.groupBy("bkt").agg(F.sum("n_toks").alias("btoks"))
    off_w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = btot.select(
        "bkt", F.coalesce(F.sum("btoks").over(off_w), F.lit(0)).alias("offset")
    )
    in_w = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = (
        toks.join(F.broadcast(offs), "bkt")
        .withColumn(
            "cum_before",
            F.col("offset") + F.coalesce(F.sum("n_toks").over(in_w), F.lit(0)),
        )
        .withColumn("bin_id", F.expr(f"cum_before div {BUDGET}").cast("bigint"))
    )
    return packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        F.expr(f"sum(n_toks) * 10000 div {BUDGET}").cast("bigint").alias("fill_bp"),
    )


@query(
    "curate_top_quality_approx",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, lang,
                   length(trim(text)) AS n_chars,
                   len({_DUCK_TOKS}) AS n_toks,
                   length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g')) AS n_alpha
            FROM documents
        ),
        scored AS (
            SELECT doc_id, lang, {_DUCK_QUALITY_BP} AS quality_bp FROM base
        )
        SELECT doc_id, lang, quality_bp FROM scored s
        WHERE quality_bp >= (SELECT quantile_disc(quality_bp, 0.5)
                             FROM scored t WHERE t.lang = s.lang)
    """,
    tags=("north-star", "curation"),
)
def curate_top_quality_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path of per-language quality curation: instead of
    percent_rank (a full sort within every language partition), compute ONE
    approx_percentile threshold per language (tiny aggregate, mergeable
    sketches) and keep docs at or above it — no per-language global sort
    anywhere in the plan.

    Oracle-checkable at driver scale: approx_percentile's GK sketch with
    accuracy 10000 is EXACT while each language group holds fewer than
    10000 rows (it buffers every value), and Spark's discrete percentile
    picks the same element as DuckDB quantile_disc — verified equal at
    sf0.001 and sf0.01.  Beyond sketch capacity the selection is
    approximate; the containment property vs the exact percent_rank query
    (a near-superset of the exact top half, within the sketch's rank
    error) is asserted in tests/test_operators.py::TestCuration."""
    (documents,) = load(spark, sf_dir, "documents")
    scored = documents.select(
        "doc_id", "lang", X.quality_score_bp(F.col("text")).alias("quality_bp")
    )
    thresholds = scored.groupBy("lang").agg(
        F.expr("approx_percentile(quality_bp, 0.5, 10000)").alias("thr")
    )
    return (
        scored.join(F.broadcast(thresholds), "lang")
        .where(F.col("quality_bp") >= F.col("thr"))
        .select("doc_id", "lang", "quality_bp")
    )


@query(
    "text_pii_redact",
    oracle="""
        WITH seeded AS (
            SELECT doc_id,
                   coalesce(text, '') || ' Contact user' || doc_id ||
                   '@example.com or 192.168.' || (doc_id % 256) ||
                   '.42 call 555-867-530' || (doc_id % 10) ||
                   ' ssn 219-09-900' || (doc_id % 10) ||
                   ' card 4111-1111-1111-111' || (doc_id % 10) || '.' AS t0
            FROM documents
        ),
        s1 AS (
            SELECT doc_id,
                   len(regexp_extract_all(t0,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS c1,
                   regexp_replace(t0,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g') AS t1
            FROM seeded
        ),
        s2 AS (
            SELECT doc_id, c1,
                   len(regexp_extract_all(t1,
                       '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS c2,
                   regexp_replace(t1,
                       '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                       '<IP>', 'g') AS t2
            FROM s1
        ),
        s3 AS (
            SELECT doc_id, c1, c2,
                   len(regexp_extract_all(t2,
                       '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS c3,
                   regexp_replace(t2,
                       '\\b\\d{3}-\\d{2}-\\d{4}\\b',
                       '<SSN>', 'g') AS t3
            FROM s2
        ),
        s4 AS (
            SELECT doc_id, c1, c2, c3,
                   len(regexp_extract_all(t3,
                       '\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b')) AS c4,
                   regexp_replace(t3,
                       '\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b',
                       '<CARD>', 'g') AS t4
            FROM s3
        ),
        s5 AS (
            SELECT doc_id, c1, c2, c3, c4,
                   len(regexp_extract_all(t4,
                       '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b')) AS c5,
                   regexp_replace(t4,
                       '\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b',
                       '<PHONE>', 'g') AS t5
            FROM s4
        )
        SELECT doc_id,
               CAST(c1 + c2 + c3 + c4 + c5 AS BIGINT) AS n_redactions,
               md5(t5) AS redacted_md5
        FROM s5
    """,
    tags=("north-star", "curation", "text"),
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data hygiene: typed PII redaction (emails, IPv4, phone
    numbers → placeholder tokens) as pure JVM regexp expressions —
    whole-stage codegen, narrow map, no shuffle, no Python.

    The synthetic corpus carries no organic PII, so the query first seeds
    each document with deterministic doc_id-derived PII (an email, an IP,
    a phone number), then redacts; the oracle replays the exact same
    seeding and pattern sequence in RE2 (the patterns stay inside the
    Java-regex ∩ RE2 syntax subset — no backrefs/lookaround — precisely so
    both engines substitute identically).  Output compares the redaction
    COUNT and the md5 of the fully redacted text, so a single divergent
    substitution anywhere in the corpus turns the row red."""
    (documents,) = load(spark, sf_dir, "documents")
    seeded = documents.select(
        "doc_id",
        # coalesce: a NULL text must still seed-and-redact (the oracle's ||
        # would otherwise propagate NULL while the engine counts 0 — a
        # driver mismatch on any future NULL-text corpus row)
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" Contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 192.168."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".42 call 555-867-530"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit(" ssn 219-09-900"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit(" card 4111-1111-1111-111"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit("."),
        ).alias("t0"),
    )
    red, n = X.redact_pii(F.col("t0"))
    return seeded.select(
        "doc_id",
        n.alias("n_redactions"),
        F.md5(red).alias("redacted_md5"),
    )


_BLOCKLIST = ("src0", "src7", "src14")


@query(
    "curate_source_blocklist",
    oracle=f"""
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(len({_DUCK_TOKS})) AS BIGINT) AS n_tokens
        FROM documents
        WHERE source NOT IN {_BLOCKLIST!r}
        GROUP BY source
    """,
    tags=("north-star", "curation"),
)
def curate_source_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/domain blocklist filtering — the standard web-corpus hygiene
    pass (robots exclusions, spam domains, takedown lists) expressed the
    way it scales: the blocklist is a TABLE (here a 3-row literal frame
    standing in for an external list of millions of domains) applied as a
    broadcast LEFT ANTI join, never an IN-list compiled into the plan.
    Survivor accounting (docs + tokens per source) feeds the mix report."""
    (documents,) = load(spark, sf_dir, "documents")
    blocklist = spark.createDataFrame([(s,) for s in _BLOCKLIST], "source string")
    return (
        documents.join(F.broadcast(blocklist), "source", "left_anti")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(X.token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
        )
    )


_TOKEN_BUDGET = 800


@query(
    "curate_token_budget_per_source",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, source,
                   length(trim(text)) AS n_chars,
                   len({_DUCK_TOKS}) AS n_toks,
                   length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g')) AS n_alpha
            FROM documents
        ),
        scored AS (
            SELECT doc_id, source, CAST(n_toks AS BIGINT) AS n_toks,
                   {_DUCK_QUALITY_BP} AS quality_bp
            FROM base
        ),
        filled AS (
            SELECT *,
                   coalesce(sum(n_toks) OVER (PARTITION BY source
                       ORDER BY quality_bp DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS cum_before
            FROM scored
        )
        SELECT source,
               CAST(count(*) FILTER (cum_before < {_TOKEN_BUDGET}) AS BIGINT) AS n_kept,
               CAST(count(*) FILTER (cum_before >= {_TOKEN_BUDGET}) AS BIGINT) AS n_dropped,
               CAST(coalesce(sum(n_toks) FILTER (cum_before < {_TOKEN_BUDGET}), 0) AS BIGINT)
                   AS tokens_kept
        FROM filled
        GROUP BY source
    """,
    tags=("north-star", "curation"),
)
def curate_token_budget_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing under a per-source token budget: fill each source's
    quota greedily with its highest-quality documents (integer quality_bp,
    doc_id tie-break) until the budget is exhausted — the canonical "cap
    low-quality bulk sources, keep all of scarce good ones" mixing rule of
    pretraining recipes.  A document is admitted iff the tokens of
    strictly-better documents haven't already reached the budget (the last
    admitted doc may overflow it — greedy fill, not bin packing; exact
    packing is pack_token_bins).

    Deterministic and bit-reproducible: integer scores + unique tie-break
    mean re-runs and engine changes keep the identical document set.

    Scale: one shuffle on source for the running-sum window; per-source
    ordering is the same work a per-source top-k does.  If one source
    dwarfs the rest (web crawl vs curated sets), the window sort is
    per-partition-key and AQE splits skewed partitions; the admitted
    prefix could also be found with an approx-quantile cutoff on
    quality_bp to avoid the full per-source sort at 100 TB."""
    from pyspark.sql import Window

    (documents,) = load(spark, sf_dir, "documents")
    scored = documents.select(
        "doc_id",
        "source",
        X.token_count(F.col("text")).cast("bigint").alias("n_toks"),
        X.quality_score_bp(F.col("text")).alias("quality_bp"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality_bp"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    filled = scored.withColumn(
        "cum_before", F.coalesce(F.sum("n_toks").over(w), F.lit(0))
    )
    kept = F.col("cum_before") < _TOKEN_BUDGET
    return filled.groupBy("source").agg(
        F.count_if(kept).alias("n_kept"),
        F.count_if(~kept).alias("n_dropped"),
        F.coalesce(F.sum(F.when(kept, F.col("n_toks"))), F.lit(0))
        .cast("bigint")
        .alias("tokens_kept"),
    )


@query(
    "report_cross_source_dup_rates",
    oracle=f"""
        WITH sh AS (
            SELECT DISTINCT doc_id AS did, s.tok
            FROM documents, UNNEST({_DUCK_TRIGRAMS}) AS s(tok)
        ),
        sizes AS (SELECT did, count(*) AS ss FROM sh GROUP BY did),
        inter AS (
            SELECT a.did AS id_a, b.did AS id_b, count(*) AS n_inter
            FROM sh a JOIN sh b ON a.tok = b.tok AND a.did < b.did
            GROUP BY 1, 2
        ),
        pairs AS (
            SELECT id_a, id_b,
                   round(n_inter / CAST(sa.ss + sb.ss - n_inter AS DOUBLE), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON inter.id_a = sa.did
            JOIN sizes sb ON inter.id_b = sb.did
            WHERE round(n_inter / CAST(sa.ss + sb.ss - n_inter AS DOUBLE), 4) >= 0.5
        )
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(avg(jaccard), 4) AS avg_jaccard
        FROM pairs
        JOIN documents da ON da.doc_id = pairs.id_a
        JOIN documents db ON db.doc_id = pairs.id_b
        GROUP BY 1, 2
    """,
    tags=("north-star", "curation", "dedup"),
)
def report_cross_source_dup_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health diagnostic: where do near-duplicates COME FROM?
    Near-dup pairs (exact trigram-Jaccard >= 0.5) attributed to their
    source pair — mirrored crawls and syndicated content show up as hot
    cross-source cells, while a hot diagonal cell means a source
    re-crawls its own pages.  This report is how a pipeline decides
    WHICH source to blocklist or down-weight, upstream of the doc-level
    dedup that merely removes the symptoms.

    Scale: the pair frame carries only (id, id, jaccard); the two source
    lookups are joins against the slim (doc_id, source) projection —
    at web scale that projection is broadcast-size per shuffle partition
    and the group-by key space is |sources|^2, tiny."""
    (documents,) = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(documents, n=3, threshold=0.5, hash_tokens=True)
    src = documents.select("doc_id", "source")
    return (
        pairs.join(src.withColumnsRenamed({"doc_id": "id_a", "source": "sa"}), "id_a")
        .join(src.withColumnsRenamed({"doc_id": "id_b", "source": "sb"}), "id_b")
        .groupBy(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("jaccard"), 4).alias("avg_jaccard"),
        )
    )


_PRIORITY_K = 50


@query(
    "sample_weighted_priority",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, source,
                   length(trim(text)) AS n_chars,
                   len({_DUCK_TOKS}) AS n_toks,
                   length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g')) AS n_alpha
            FROM documents
        ),
        pri AS (
            SELECT doc_id, source,
                   CAST({_DUCK_QUALITY_BP} + 1 AS BIGINT) AS w,
                   CAST({_DUCK_QUALITY_BP} + 1 AS DOUBLE)
                       / CAST((doc_id * 2654435761) % 4294967296 + 1 AS DOUBLE)
                       AS priority
            FROM base
        ),
        ranked AS (
            SELECT *, row_number() OVER (ORDER BY priority DESC, doc_id) AS rn
            FROM pri
        ),
        tau AS (SELECT priority AS t FROM ranked WHERE rn = {_PRIORITY_K + 1})
        SELECT doc_id, source, w, priority,
               greatest(CAST(w AS DOUBLE), coalesce((SELECT t FROM tau), 0))
                   AS w_hat
        FROM ranked WHERE rn <= {_PRIORITY_K}
    """,
    tags=("north-star", "curation", "sampling"),
)
def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted PRIORITY SAMPLING (Duffield/Lund/Thorup,
    JACM'07): draw a size-k sample where a document's inclusion odds are
    proportional to its weight (here quality_bp + 1), with the
    Horvitz-Thompson estimator weight w_hat = max(w, tau) attached so any
    downstream sum over the sample is unbiased for the corpus sum.

    priority = w / u with u the content-addressed Knuth hash of doc_id
    (operators/sampling.py scheme) — NO RNG, so the sample is identical
    across runs, partitionings and engines.  Cross-engine exactness is by
    construction: the key is ONE IEEE-754 division of two integers (both
    exactly representable as doubles), which is correctly rounded on every
    conforming engine — no libm transcendentals, so Spark's and DuckDB's
    key bits are identical and the top-k boundary cannot flip.

    Scale: the top-(k+1) runs as TakeOrdered (distributed partial top-k,
    no global sort, no single-partition window); tau is derived from the
    driver-scale (k+1)-row frame and joined back as a 1-row broadcast."""
    from pyspark.sql import Window

    from aws_genaric_datapipeline_spark.operators.sampling import HASH_MOD, KNUTH_A

    k = _PRIORITY_K
    (documents,) = load(spark, sf_dir, "documents")
    w_col = (X.quality_score_bp(F.col("text")) + 1).cast("bigint")
    h1 = F.pmod(F.col("doc_id").cast("bigint") * F.lit(KNUTH_A), F.lit(HASH_MOD)) + 1
    pri = documents.select(
        "doc_id",
        "source",
        w_col.alias("w"),
        (w_col.cast("double") / h1.cast("double")).alias("priority"),
    )
    # distributed top-(k+1); the window below ranks only these k+1 rows
    topk1 = pri.orderBy(F.desc("priority"), "doc_id").limit(k + 1)
    ranked = topk1.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("priority"), "doc_id"))
    )
    tau = ranked.where(F.col("rn") == k + 1).select(F.col("priority").alias("t"))
    return (
        ranked.where(F.col("rn") <= k)
        .join(tau, F.lit(True), "left")
        .select(
            "doc_id",
            "source",
            "w",
            "priority",
            F.greatest(F.col("w").cast("double"), F.coalesce("t", F.lit(0.0))).alias("w_hat"),
        )
    )


_SEG_WORDS = 10
_SEG_MAX_DF = 1  # keep segments appearing in <= this many distinct docs


@query(
    "text_segment_dedup",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
        ),
        segs AS (
            SELECT doc_id, CAST(g.i AS INT) AS idx,
                   array_to_string(
                       list_slice(toks, (g.i - 1) * {_SEG_WORDS} + 1,
                                  g.i * {_SEG_WORDS}), ' ') AS seg
            FROM t, UNNEST(range(1,
                CAST(ceil(len(toks) / {_SEG_WORDS}.0) AS INT) + 1)) AS g(i)
        ),
        freq AS (SELECT seg, count(DISTINCT doc_id) AS df FROM segs GROUP BY seg)
        SELECT s.doc_id,
               CAST(count(*) AS BIGINT) AS n_segments,
               CAST(count(*) FILTER (f.df > {_SEG_MAX_DF}) AS BIGINT) AS n_dropped,
               md5(coalesce(
                   string_agg(s.seg, ' ' ORDER BY s.idx)
                       FILTER (f.df <= {_SEG_MAX_DF}), '')) AS cleaned_md5
        FROM segs s JOIN freq f ON f.seg = s.seg
        GROUP BY s.doc_id
    """,
    tags=("north-star", "text", "curation", "dedup"),
)
def text_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level (CCNet-style line-level) dedup: split every document
    into aligned 10-word segments, count each distinct segment's
    document frequency across the corpus, drop segments appearing in more
    than one document (boilerplate: headers, footers, licence blocks,
    syndicated fragments), and reassemble the surviving text in order.
    This removes REPEATED PASSAGES from otherwise-unique documents — the
    complement of document-level dedup, and the pass (per CCNet/RefinedWeb)
    that removes more tokens than whole-doc dedup on web corpora.

    The md5 of each reassembled document verifies the entire
    split -> frequency -> filter -> ordered-reassembly machinery, not just
    the counts.

    Scale: two shuffles — segment-frequency groupBy (segment strings;
    hash them to 64-bit first at 100 TB) and the per-doc reassembly
    groupBy.  The in-order rebuild is collect_list of (idx, seg) structs +
    array_sort, so no window and no per-doc sort pass; segment-frequency
    skew (a boilerplate segment in millions of docs) is bounded because
    the JOIN carries only (seg, df) — the hot key fans out rows but each
    carries an 8-byte count, and the df > cap verdict could equally ride a
    broadcast of the (tiny) over-cap segment list."""
    (documents,) = load(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    n_seg = F.ceil(F.size(toks) / F.lit(_SEG_WORDS)).cast("int")
    # guard: sequence(1, 0) ramps DOWN in Spark, so a token-less document
    # must map to an empty index array, not posexplode of [1, 0]
    idx_arr = F.when(n_seg >= 1, F.sequence(F.lit(1), n_seg)).otherwise(
        F.array().cast("array<int>")
    )
    segs = documents.select(
        "doc_id",
        F.posexplode(
            F.transform(
                idx_arr,
                lambda i: F.array_join(
                    F.slice(toks, (i - 1) * _SEG_WORDS + 1, _SEG_WORDS), " "
                ),
            )
        ).alias("pos", "seg"),
    ).select("doc_id", (F.col("pos") + 1).alias("idx"), "seg")
    freq = segs.groupBy("seg").agg(F.count_distinct("doc_id").alias("df"))
    marked = segs.join(freq, "seg")
    keep = F.col("df") <= _SEG_MAX_DF
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.count_if(~keep).alias("n_dropped"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("idx", "seg")))
                    ),
                    lambda s: s.seg,
                ),
                " ",
            )
        ).alias("cleaned_md5"),
    )


@query(
    "decontaminate_semantic",
    oracle="""
        WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        unit AS (
            SELECT vec_id,
                   CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v
                        ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                   END AS u
            FROM base
        ),
        bench AS (SELECT vec_id AS bid, u AS bu FROM unit WHERE vec_id % 20 = 0),
        corpus AS (SELECT vec_id, u FROM unit WHERE vec_id % 20 <> 0),
        scored AS (
            SELECT c.vec_id, b.bid,
                   round(list_dot_product(c.u, b.bu), 4) AS sim
            FROM corpus c CROSS JOIN bench b
        ),
        best AS (
            SELECT vec_id, bid AS nearest_benchmark_id, sim AS max_sim
            FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                        ORDER BY sim DESC, bid) AS rn FROM scored)
            WHERE rn = 1
        )
        SELECT vec_id, nearest_benchmark_id, max_sim
        FROM best WHERE max_sim >= 0.45
    """,
    tags=("north-star", "curation", "similarity"),
)
def decontaminate_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC eval-set leakage detection — the embedding-side complement
    of decontaminate_ngram_overlap: n-gram overlap misses paraphrased or
    re-encoded benchmark text, but a contaminated document still sits next
    to its benchmark source in embedding space.  Flags corpus vectors
    whose max cosine against the held-out benchmark slice (vec_id % 20 = 0
    stands in for the benchmark set) reaches 0.45, with the argmax
    benchmark id (ties to the lower id).

    Scale shape: the benchmark side is SMALL BY DEFINITION (eval sets are
    thousands of rows, the corpus is billions), so this is a broadcast
    crossJoin — the corpus streams through one map pass of |bench| dot
    products per row and the only shuffle is the per-document argmax.
    Exact, no sketch: at 100 TB the benchmark matrix rides into the
    executors whole, which is the same posture as the n-gram variant's
    broadcast gram set."""
    from aws_genaric_datapipeline_spark.operators.similarity import dot, with_unit_vectors
    from pyspark.sql import Window

    (embeddings,) = load(spark, sf_dir, "embeddings")
    unit = with_unit_vectors(embeddings, "embedding")
    bench = unit.where(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("bid"), F.col("unit_vec").alias("bu")
    )
    corpus = unit.where(F.col("vec_id") % 20 != 0).select(
        "vec_id", F.col("unit_vec").alias("cu")
    )
    scored = corpus.crossJoin(F.broadcast(bench)).select(
        "vec_id", "bid", F.round(dot(F.col("cu"), F.col("bu")), 4).alias("sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("bid"))
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("bid").alias("nearest_benchmark_id"),
            F.col("sim").alias("max_sim"),
        )
    )
    return best.where(F.col("max_sim") >= 0.45)


_FUNNEL_V2_SRC = "(SELECT * FROM documents WHERE doc_id % 20 <> 0)"


@query(
    "curate_funnel_v2",
    oracle=f"""
        WITH {_duck_gopher_cte(_FUNNEL_V2_SRC)},
        {_duck_entropy_cte(_FUNNEL_V2_SRC)},
        {_duck_bloom_cte("did % 20 <> 0")},
        fp AS (
            SELECT doc_id,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                       AS fp
            FROM documents WHERE doc_id % 20 <> 0
        ),
        fl AS (
            SELECT fp.doc_id, fp.fp,
                   ({_DUCK_GOPHER_NFAILED}) <= 2 AS g,
                   coalesce(bloomr.flagged_ratio, 0.0) < 0.02 AS b,
                   ent.char_entropy >= 2.80 AS e
            FROM fp
            JOIN gflags USING (doc_id)
            JOIN ent ON ent.doc_id = fp.doc_id
            LEFT JOIN bloomr ON bloomr.did = fp.doc_id
        ),
        rk AS (
            SELECT *, row_number() OVER (PARTITION BY fp
                ORDER BY CASE WHEN g THEN 0 ELSE 1 END, doc_id) AS rn
            FROM fl
        )
        SELECT 'ingest' AS stage, count(*) AS n_docs FROM rk
        UNION ALL SELECT 'quality_rules', count(*) FILTER (g) FROM rk
        UNION ALL SELECT 'dedup', count(*) FILTER (g AND rn = 1) FROM rk
        UNION ALL SELECT 'decontaminate',
                         count(*) FILTER (g AND rn = 1 AND b) FROM rk
        UNION ALL SELECT 'entropy',
                         count(*) FILTER (g AND rn = 1 AND b AND e) FROM rk
    """,
    tags=("north-star", "curation"),
)
def curate_funnel_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-7 curation funnel: Gopher rule gate (n_failed ≤ 2) →
    exact dedup within rule-survivors (min-id per content fingerprint) →
    Bloom decontamination screen (flagged-gram ratio < 2%) → character-
    entropy gate (≥ 2.80 nats), reporting survivor counts per stage.

    Same single-pass shape as curate_funnel_report: every gate is a
    per-document boolean on ONE flag frame (the dedup survivor flag is a
    fingerprint-window row_number that prefers rule-passing docs, so the
    canonical pick stays inside the funnel), and all five counts ride one
    conditional aggregation — nothing is re-scanned per stage.  Each gate
    reuses the exact operator its own query verifies (gopher_rules,
    fingerprint, bloom_decontaminate, char_entropy), and the oracle reuses
    the same CTE text as those queries, so funnel and unit oracles cannot
    drift apart."""
    from pyspark.sql import Window

    from aws_genaric_datapipeline_spark.operators.text import (
        char_entropy,
        fingerprint,
        gopher_rules,
    )

    (documents,) = load(spark, sf_dir, "documents")
    bench = documents.where(F.col("doc_id") % 20 == 0)
    corpus = documents.where(F.col("doc_id") % 20 != 0)

    rules = gopher_rules(corpus).select("doc_id", "n_failed")
    bloom = D.bloom_decontaminate(corpus, bench).select(
        "doc_id", "flagged_ratio"
    )
    per_doc = corpus.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        char_entropy(F.col("text")).alias("ent"),
    )
    flags = (
        per_doc.join(rules, "doc_id")
        .join(bloom, "doc_id", "left")
        .select(
            "doc_id",
            "fp",
            (F.col("n_failed") <= 2).alias("g"),
            (F.coalesce(F.col("flagged_ratio"), F.lit(0.0)) < 0.02).alias("b"),
            (F.col("ent") >= 2.80).alias("e"),
        )
    )
    w = Window.partitionBy("fp").orderBy(
        F.when(F.col("g"), 0).otherwise(1), "doc_id"
    )
    rk = flags.withColumn("rn", F.row_number().over(w))
    g = F.col("g")
    d = g & (F.col("rn") == 1)
    b = d & F.col("b")
    e = b & F.col("e")
    agg = rk.agg(
        F.count(F.lit(1)).alias("c0"),
        F.count_if(g).alias("c1"),
        F.count_if(d).alias("c2"),
        F.count_if(b).alias("c3"),
        F.count_if(e).alias("c4"),
    )
    return agg.select(
        F.expr(
            "stack(5, 'ingest', c0, 'quality_rules', c1, 'dedup', c2,"
            " 'decontaminate', c3, 'entropy', c4) AS (stage, n_docs)"
        )
    )


@query(
    "search_bm25_query_only",
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
        dft AS (SELECT tok, count(*) AS dft FROM tf GROUP BY tok),
        bm AS (
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
        )
        SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
    tags=("north-star", "text", "search"),
)
def search_bm25_query_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION full-text shape: BM25 top-10 answered from a
    PERSISTED inverted index (operators/retrieval.py
    build_inverted_index / query_inverted_index) — postings partitioned
    by term-hash bucket, so the scan prunes to the query terms' buckets
    (plan-gated in TestInvertedIndex) and query cost tracks matched
    postings, not corpus size.  Build cost is paid once per corpus at
    ingest (_ensure_corpus_index build-once cache, content-digest
    keyed); the oracle recomputes the same Lucene-idf BM25 from the raw
    documents, so a stale or corrupted index turns the row red."""
    from aws_genaric_datapipeline_spark.operators.retrieval import (
        build_inverted_index,
        query_inverted_index,
    )
    from aws_genaric_datapipeline_spark.queries.north_star import (
        _ensure_corpus_index,
    )

    (documents,) = load(spark, sf_dir, "documents")
    index_path = _ensure_corpus_index(
        sf_dir,
        "inv",
        "v1",
        "postings",
        lambda p: build_inverted_index(documents, p, num_buckets=16),
        src_name="documents.parquet",
    )
    return query_inverted_index(
        spark, index_path, terms=("spark", "vector", "merge"), k=10
    )


@query(
    "text_top_keywords",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id AS did, t.tok
            FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
            WHERE length(trim(text)) > 0
        ),
        tf AS (SELECT did, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
        dft AS (SELECT tok, count(*) AS dft FROM tf GROUP BY 1),
        n AS (SELECT count(DISTINCT did) AS n_docs FROM toks),
        scored AS (
            SELECT did, tok,
                   round(tf * ln(CAST(n_docs AS DOUBLE) / dft), 4) AS score
            FROM tf JOIN dft USING (tok) CROSS JOIN n
        ),
        ranked AS (
            SELECT did, tok, score,
                   row_number() OVER (
                       PARTITION BY did ORDER BY score DESC, tok
                   ) AS rn
            FROM scored
        )
        SELECT CAST(did AS BIGINT) AS doc_id, tok AS term,
               score, CAST(rn AS INT) AS rank
        FROM ranked WHERE rn <= 3
    """,
    tags=("north-star", "text", "search"),
)
def text_top_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the 3 highest TF-IDF terms of
    every document (idf = ln(N/df), ranked on the ROUNDED score with a
    term tiebreak so the cut is engine-deterministic) — the metadata
    tagging / retrieval-facet pass a curation pipeline runs after
    quality scoring.  One token explode, two bounded aggregates (per-doc
    tf, per-term df), a broadcast N, and a per-doc window — work is
    proportional to tokens, never pairs."""
    (documents,) = load(spark, sf_dir, "documents")
    from aws_genaric_datapipeline_spark.operators.text import tokens
    from pyspark.sql import Window

    toks = documents.select(
        F.col("doc_id").alias("did"),
        F.explode(tokens(F.col("text"))).alias("tok"),
    )
    tf = toks.groupBy("did", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("dft"))
    n = toks.agg(F.countDistinct("did").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dft), "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "did",
            "tok",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("dft")),
                4,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("did").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.select(
            "did", "tok", "score", F.row_number().over(w).alias("rn")
        )
        .where(F.col("rn") <= 3)
        .select(
            F.col("did").cast("bigint").alias("doc_id"),
            F.col("tok").alias("term"),
            "score",
            F.col("rn").cast("int").alias("rank"),
        )
    )


@query(
    "report_corpus_delta",
    oracle="""
        WITH v1 AS (
            SELECT doc_id, source, md5(text) AS fp
            FROM documents WHERE doc_id % 7 <> 0
        ),
        v2 AS (
            SELECT doc_id, source,
                   md5(CASE WHEN doc_id % 13 = 0 THEN text || ' [v2]' ELSE text END) AS fp
            FROM documents WHERE doc_id % 11 <> 0
        ),
        d AS (
            SELECT COALESCE(v1.source, v2.source) AS source,
                   CASE WHEN v1.doc_id IS NULL THEN 'added'
                        WHEN v2.doc_id IS NULL THEN 'removed'
                        WHEN v1.fp <> v2.fp THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
        )
        SELECT source, status, CAST(count(*) AS BIGINT) AS n_docs
        FROM d GROUP BY source, status
    """,
    tags=("curation", "report", "incremental"),
)
def report_corpus_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot corpus delta: per (source, status) counts of
    added / removed / changed / unchanged documents between two dataset
    versions, compared by content fingerprint (md5), never by text — the
    release-note report every versioned training-data pipeline publishes,
    and the precondition check for incremental reprocessing (only
    added+changed re-enter the pipeline).  v1 = doc_id % 7 != 0; v2 =
    doc_id % 11 != 0 with docs % 13 == 0 'edited' (suffix-stamped) to
    exercise the changed class.

    Scale: both sides reduce to (doc_id, source, 128-bit fp) BEFORE the
    full outer join — the 100 TB text never moves, only key-plus-
    fingerprint rows shuffle, and the join key is the snapshot's natural
    primary key (AQE handles the residual skew)."""
    (documents,) = load(spark, sf_dir, "documents")
    v1 = documents.where(F.col("doc_id") % 7 != 0).select(
        "doc_id", "source", F.md5("text").alias("fp")
    )
    v2 = documents.where(F.col("doc_id") % 11 != 0).select(
        "doc_id",
        "source",
        F.md5(
            F.when(
                F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" [v2]"))
            ).otherwise(F.col("text"))
        ).alias("fp"),
    )
    joined = v1.alias("a").join(
        v2.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("a.doc_id").isNull(), F.lit("added"))
        .when(F.col("b.doc_id").isNull(), F.lit("removed"))
        .when(F.col("a.fp") != F.col("b.fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
            status.alias("status"),
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "text_collocations_pmi",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
            FROM documents WHERE length(trim(text)) > 0
        ),
        bg AS (
            SELECT toks[CAST(u.i AS INT)] AS w1,
                   toks[CAST(u.i AS INT) + 1] AS w2
            FROM t, UNNEST(range(1, len(toks))) AS u(i)
        ),
        uni AS (
            SELECT tok, count(*) AS n_t
            FROM (SELECT unnest(toks) AS tok FROM t)
            GROUP BY tok
        ),
        tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS n FROM uni),
        pairs AS (
            SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY w1, w2
        ),
        scored AS (
            SELECT w1, w2,
                   CAST(n_ab AS BIGINT) AS n_ab,
                   round(ln(n_ab * CAST(n AS DOUBLE)
                            / (ua.n_t * CAST(ub.n_t AS DOUBLE))), 4) AS pmi
            FROM pairs
            JOIN uni ua ON ua.tok = pairs.w1
            JOIN uni ub ON ub.tok = pairs.w2
            CROSS JOIN tot
            WHERE n_ab >= 5
        )
        SELECT w1, w2, n_ab, pmi, CAST(rn AS INT) AS rank
        FROM (SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rn
              FROM scored)
        WHERE rn <= 20
    """,
    tags=("north-star", "text", "curation"),
)
def text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-20 adjacent-token bigrams by PMI with
    support ≥ 5 — the classic phrase-discovery pass (NLP tokenizer vocab
    seeding, boilerplate-phrase detection) over the whole corpus.  The
    log's argument is a ratio of exact integer counts (bigram count ×
    total tokens / unigram counts), so the score is deterministic to the
    rounded digit in both engines, and the top-20 cut breaks PMI ties on
    the words themselves.

    Scale: bigrams come from a zip of the token array with its tail —
    no self-join, work ∝ tokens; two count aggregations plus a broadcast
    of the |vocab|-sized marginals; the final top-20 is a TakeOrdered."""
    (documents,) = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = X.tokens(F.col("text"))
    t = documents.where(F.length(F.trim("text")) > 0).select(
        toks.alias("toks")
    )
    bg = t.select(
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, F.size("toks") - 1).alias("w1"),
                F.slice(F.col("toks"), 2, F.size("toks") - 1).alias("w2"),
            )
        ).alias("b")
    ).select(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    uni = t.select(F.explode("toks").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("n_t")
    )
    tot = uni.agg(F.sum("n_t").cast("bigint").alias("n"))
    pairs = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_ab"))
    scored = (
        pairs.where(F.col("n_ab") >= 5)
        .join(F.broadcast(uni.selectExpr("tok as w1", "n_t as na")), "w1")
        .join(F.broadcast(uni.selectExpr("tok as w2", "n_t as nb")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.log(
                    F.col("n_ab")
                    * F.col("n").cast("double")
                    / (F.col("na") * F.col("nb").cast("double"))
                ),
                4,
            ).alias("pmi"),
        )
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= 20)
    )


@query(
    "text_ngram_novelty",
    oracle="""
        WITH tok AS (
            SELECT doc_id AS did, s.tok
            FROM (
                SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
                FROM documents WHERE length(trim(text)) > 0
            ), UNNEST(list_distinct(list_transform(range(1, len(toks) - 1),
                      i -> toks[CAST(i AS INT)] || ' ' ||
                           toks[CAST(i AS INT) + 1] || ' ' ||
                           toks[CAST(i AS INT) + 2]))) AS s(tok)
        ),
        df AS (SELECT tok, count(*) AS n_docs FROM tok GROUP BY tok)
        SELECT did AS doc_id,
               CAST(count(*) AS BIGINT) AS n_grams,
               CAST(count(*) FILTER (n_docs = 1) AS BIGINT) AS n_unique,
               CAST(count(*) FILTER (n_docs = 1) * 10000 // count(*) AS BIGINT)
                   AS novelty_bp
        FROM tok JOIN df USING (tok)
        GROUP BY did
    """,
    tags=("north-star", "text", "curation"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram NOVELTY: the fraction of a document's distinct
    trigrams that appear in no other document (integer basis points) —
    the inverse of the boilerplate signal: low novelty means the text is
    assembled from corpus-common shingles even when no single near-dup
    partner exists, exactly the "templated but never duplicated" class
    the pairwise dedup family cannot see.

    Scale: one distinct-shingle explode (same frame the MinHash path
    sketches), one document-frequency aggregation, one join back keyed on
    the shingle — integer arithmetic end to end."""
    (documents,) = load(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    # ≥3-token docs only: sequence(0, size-3) would run DESCENDING for
    # shorter docs (Spark defaults step to -1 when stop < start) and the
    # element_at(toks, 0) it produces is an ANSI error, not an empty list.
    # Sub-trigram docs contribute no shingles in either engine, so the
    # filter matches the oracle's empty range() semantics exactly.
    t = documents.where(F.length(F.trim("text")) > 0).select(
        F.col("doc_id").alias("did"), toks.alias("toks")
    ).where(F.size("toks") >= 3)
    grams = t.select(
        "did",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 3),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("toks"), i + 1),
                        F.element_at(F.col("toks"), i + 2),
                        F.element_at(F.col("toks"), i + 3),
                    ),
                )
            )
        ).alias("tok"),
    )
    df_counts = grams.groupBy("tok").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        grams.join(df_counts, "tok")
        .groupBy(F.col("did").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("n_docs") == 1).alias("n_unique"),
            F.expr("count_if(n_docs = 1) * 10000 div count(1)").alias(
                "novelty_bp"
            ),
        )
    )


@query(
    "report_source_vocab_overlap",
    oracle="""
        WITH tok AS (
            SELECT DISTINCT source, s.tok
            FROM (
                SELECT source, string_split_regex(trim(text), '\\s+') AS toks
                FROM documents WHERE length(trim(text)) > 0
            ), UNNEST(toks) AS s(tok)
        ),
        sizes AS (SELECT source, count(*) AS n FROM tok GROUP BY source),
        inter AS (
            SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
            FROM tok a JOIN tok b ON a.tok = b.tok AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT src_a, src_b,
               CAST(n_inter AS BIGINT) AS n_shared,
               CAST(sa.n AS BIGINT) AS n_a,
               CAST(sb.n AS BIGINT) AS n_b,
               CAST(n_inter * 10000 // (sa.n + sb.n - n_inter) AS BIGINT)
                   AS jaccard_bp
        FROM inter
        JOIN sizes sa ON sa.source = inter.src_a
        JOIN sizes sb ON sb.source = inter.src_b
    """,
    tags=("curation", "report", "text"),
)
def report_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources (integer basis points):
    high overlap between nominally distinct sources flags shared scrapes,
    mirrored domains, or template contamination BEFORE the document-level
    dedup passes run — the corpus-composition counterpart of
    report_cross_source_dup_rates.

    Scale: the corpus reduces to distinct (source, token) pairs — one
    dedup shuffle — then the pair join keys on the token with
    |sources|²-bounded output; all arithmetic integer-exact."""
    (documents,) = load(spark, sf_dir, "documents")
    tok = (
        documents.where(F.length(F.trim("text")) > 0)
        .select("source", F.explode(X.tokens(F.col("text"))).alias("tok"))
        .distinct()
    )
    sizes = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = tok.select(F.col("source").alias("src_a"), "tok")
    b = tok.select(F.col("source").alias("src_b"), "tok")
    inter = (
        a.join(b, "tok")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            F.broadcast(sizes.selectExpr("source as src_a", "n as n_a")), "src_a"
        )
        .join(F.broadcast(sizes.selectExpr("source as src_b", "n as n_b")), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_inter").cast("bigint").alias("n_shared"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.expr("n_inter * 10000 div (n_a + n_b - n_inter)").alias(
                "jaccard_bp"
            ),
        )
    )


# ------------------------------------------------------- trained classifier
def _logreg_round_ctes(
    iters: int, eta_num: int, eta_den: int, sig: str, tdiv
) -> list[str]:
    """The unrolled GD round template shared by every full-replay
    training oracle (text_quality_classifier's hashed-feature model and
    search_rerank_linear's 3-feature ranking model): round k computes
    margins m{k} from w{k-1}, rational-sigmoid residuals r{k}, the
    gradient g{k}, and the trunc-div weight update w{k}.  Callers must
    define ``feat`` (did, j, x), ``lab`` (did, y), ``nn`` (n = training
    count) and ``w0`` upstream — the rounds are generic in the feature
    construction."""
    S = 1_000_000
    parts = []
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(f"""
        m{k} AS (
            SELECT f.did, CAST(sum(f.x * w.w) AS BIGINT) AS m
            FROM feat f JOIN w{p} w USING (j) GROUP BY 1
        ),
        r{k} AS (
            SELECT l.did,
                   CAST({sig.format(m='m.m')} - l.y * {S} AS BIGINT) AS r
            FROM lab l JOIN m{k} m USING (did)
        ),
        g{k} AS (
            SELECT f.j, CAST(sum(f.x * r.r) AS BIGINT) AS g
            FROM feat f JOIN r{k} r USING (did) GROUP BY 1
        ),
        w{k} AS (
            SELECT j, CAST(w - {tdiv('gg', 'den')} AS BIGINT) AS w
            FROM (
                SELECT w.j, w.w, {eta_num} * coalesce(g.g, 0) AS gg,
                       {eta_den} * nn.n AS den
                FROM w{p} w LEFT JOIN g{k} g USING (j) CROSS JOIN nn)
        )""")
    return parts


def _logreg_sig_tdiv() -> tuple[str, object]:
    """The fixed-point rational-sigmoid template and truncate-toward-zero
    division helper the GD replay CTEs use (DuckDB // floors; the
    operator truncates)."""
    S = 1_000_000

    def tdiv(num: str, den: str) -> str:
        return (
            f"(CASE WHEN {num} < 0 THEN -((-({num})) // ({den})) "
            f"ELSE ({num}) // ({den}) END)"
        )

    sig = (
        f"(({S} * ({S} + abs({{m}}) + {{m}})) // (2 * ({S} + abs({{m}}))))"
    )
    return sig, tdiv


def _logreg_cte_body(
    num_buckets: int = 32,
    iters: int = 5,
    eta_num: int = 1,
    eta_den: int = 2**20,
    label_sql: str = "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END",
) -> tuple[str, str]:
    """CTE body replaying the ENTIRE fixed-point logistic-regression
    training loop (operators/classifier.py) in DuckDB: md5 feature
    hashing, integer mean-centering, and ``iters`` unrolled GD rounds
    (margin -> rational-sigmoid residual -> gradient -> trunc-div weight
    update), ending at the final ``scored`` (did, margin_fp) and ``lab``
    CTEs for callers to wrap (text_quality_classifier,
    curate_classifier_budget).  All arithmetic is BIGINT — the replay is
    bit-exact, no float-noise caveat.  Truncate-toward-zero division is
    spelled CASE-wrapped floor division because DuckDB ``//`` floors
    while the operator truncates.  Returns (cte_body, sig_template)."""
    D, S, FS = num_buckets, 1_000_000, 1_000

    def tdiv(num: str, den: str) -> str:
        return (
            f"(CASE WHEN {num} < 0 THEN -((-({num})) // ({den})) "
            f"ELSE ({num}) // ({den}) END)"
        )

    sig = (
        f"(({S} * ({S} + abs({{m}}) + {{m}})) // (2 * ({S} + abs({{m}}))))"
    )
    parts = [
        f"""
        counts AS (
            SELECT doc_id AS did,
                   (('0x' || substr(md5(t.tok), 1, 8))::BIGINT % {D}) AS j,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
            GROUP BY 1, 2
        ),
        tot AS (SELECT j, CAST(sum(cnt) AS BIGINT) AS total FROM counts GROUP BY 1),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        feat AS (
            SELECT did, j,
                   CAST({tdiv('num', 'n')} AS BIGINT) AS x
            FROM (
                SELECT d.doc_id AS did, CAST(g.j AS BIGINT) AS j,
                       {FS} * (nn.n * coalesce(c.cnt, 0) - coalesce(t.total, 0)) AS num,
                       nn.n AS n
                FROM documents d
                CROSS JOIN UNNEST(range(0, {D})) AS g(j)
                CROSS JOIN nn
                LEFT JOIN counts c ON c.did = d.doc_id AND c.j = g.j
                LEFT JOIN tot t ON t.j = g.j)
            UNION ALL
            SELECT doc_id, {D}, {FS} FROM documents
        ),
        lab AS (
            SELECT doc_id AS did, CAST({label_sql} AS BIGINT) AS y
            FROM documents
        ),
        w0 AS (
            SELECT CAST(g.j AS BIGINT) AS j, CAST(0 AS BIGINT) AS w
            FROM UNNEST(range(0, {D + 1})) AS g(j)
        )"""
    ]
    parts.extend(_logreg_round_ctes(iters, eta_num, eta_den, sig, tdiv))
    parts.append(f"""
        scored AS (
            SELECT f.did, CAST(sum(f.x * w.w) AS BIGINT) AS margin_fp
            FROM feat f JOIN w{iters} w USING (j) GROUP BY 1
        )""")
    body = ",".join(parts)
    return body, sig


def _logreg_oracle_sql(
    num_buckets: int = 32,
    iters: int = 5,
    eta_num: int = 1,
    eta_den: int = 2**20,
    label_sql: str = "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END",
    probe_mod: int = 5,
) -> str:
    """Full replay oracle for text_quality_classifier (see
    _logreg_cte_body for the training-loop CTEs)."""
    body, sig = _logreg_cte_body(
        num_buckets, iters, eta_num, eta_den, label_sql
    )
    return f"""
        WITH {body}
        SELECT s.did AS doc_id, l.y, s.margin_fp,
               CAST({sig.format(m='s.margin_fp')} AS BIGINT) AS score_fp,
               CAST(CASE WHEN s.margin_fp > 0 THEN 1 ELSE 0 END AS BIGINT) AS pred
        FROM scored s JOIN lab l USING (did)
        WHERE s.did % {probe_mod} = 0
    """


@query(
    "text_quality_classifier",
    oracle=_logreg_oracle_sql(),
    tags=("north-star", "curation", "classifier"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-in-the-loop quality filtering (FineWeb-Edu style): train a
    logistic-regression classifier over mean-centered hashed bag-of-token
    features (operators/classifier.py) against a Gopher-style length
    label (n_chars >= 300), then score the corpus and emit the probe
    subset (doc_id % 5 = 0) with label, exact fixed-point margin, score,
    and prediction.  Training is 5 fixed GD rounds, integer arithmetic
    throughout — the oracle replays the ENTIRE training loop bit-exactly
    (weights, margins, scores), making this the strongest correctness
    class: a trained model whose parameters are oracle-pinned.

    At sf0.01 the trained model fits the label at ~97% training
    accuracy (vs 51% prior) — asserted in tests/test_operators.py.

    Scale: per GD round the corpus is scanned twice (margins, gradient),
    both partial-aggregate map-side folds; driver state is the 33-entry
    weight vector.  The label column here is a heuristic stand-in for
    LLM-graded labels; swapping it swaps nothing structural."""
    from aws_genaric_datapipeline_spark.operators import classifier as C

    (documents,) = load(spark, sf_dir, "documents")
    # SPARSE layout (round-10): bit-identical weights/scores to the dense
    # grid, but GD scans nnz-sized frames instead of the 33x-amplified
    # doc x bucket grid, and the corpus explode runs exactly once
    # (tests/test_operators.py::TestSparseLogReg pins dense==sparse).
    sp = C.sparse_token_features(documents, num_buckets=32)
    labels = documents.select(
        F.col("doc_id").alias("did"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).cast("bigint").alias("y"),
    )
    model = C.train_logreg_sparse(
        spark, sp, labels, iters=5, eta_num=1, eta_den=2**20
    )
    scored = C.score_documents_sparse(spark, sp, model)
    return (
        scored.join(labels, "did")
        .where(F.col("did") % 5 == 0)
        .select(
            F.col("did").alias("doc_id"),
            "y",
            "margin_fp",
            "score_fp",
            "pred",
        )
    )


# --------------------------------------------------------- HTML extraction
# Deterministic synthetic page wrapped around each document's text: shared
# chrome (nav/footer/legal) that the line-frequency pass must remove, a
# script/style/comment block the extractor must drop, entities it must
# decode, and two per-document lines (title, body) it must keep in order.
_HTML_PRE = (
    "<html><head><title>ignored</title>\n"
    "<style>body { color: #333; }</style>\n"
    "<script>var x = 1 < 2 && 3 > 2;</script>\n"
    "</head><body>\n"
    "<nav>Home | About | Contact</nav>\n"
    "<!-- tracking pixel -->\n"
    "<h1>Doc "
)
_HTML_MID = "</h1>\n<p>"
_HTML_POST = (
    "</p>\n<p>Terms &amp; conditions &lt;apply&gt;</p>\n"
    "<div>copyright 2026 example corp</div>\n</body></html>"
)


def _html_extract_oracle_sql() -> str:
    """DuckDB replay of the full HTML chain (operators/html.py): every
    regex is RE2-and-Java-compatible by construction, entity decode is
    plain replace(), and the boilerplate rule is integer-exact — so the
    md5 of the extracted text matches Spark bit-for-bit."""
    block = "p|div|h1|h2|h3|li|nav|tr|td|section|article|footer|header"
    ent = (
        "replace(replace(replace(replace(replace(replace({x},"
        " '&lt;', '<'), '&gt;', '>'), '&quot;', '\"'),"
        " '&#39;', chr(39)), '&nbsp;', ' '), '&amp;', '&')"
    )
    strip = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,"
        " '(?s)<(script|style)[^>]*>.*?</(script|style)>', '', 'g'),"
        " '(?s)<!--.*?-->', '', 'g'),"
        f" '</({block})>|<br */?>', chr(10), 'g'),"
        " '<[^>]*>', ' ', 'g')"
    )
    return f"""
        WITH h AS (
            SELECT doc_id,
                   '{_HTML_PRE}' || CAST(doc_id AS VARCHAR) || '{_HTML_MID}'
                       || coalesce(text, '') || '{_HTML_POST}' AS html
            FROM documents
        ),
        y AS (SELECT doc_id, {ent.format(x=strip)} AS txt FROM h),
        l0 AS (
            SELECT doc_id,
                   list_filter(list_transform(string_split(txt, chr(10)),
                       l -> trim(regexp_replace(l, '\\s+', ' ', 'g'))),
                       l -> l <> '') AS lines
            FROM y
        ),
        ex AS (
            SELECT doc_id, CAST(g.i AS INT) AS pos, lines[g.i] AS line
            FROM l0, UNNEST(range(1, len(lines) + 1)) AS g(i)
        ),
        nn AS (SELECT count(*) AS n FROM documents),
        boiler AS (
            SELECT line FROM ex GROUP BY line
            HAVING count(DISTINCT doc_id) * 10 >= (SELECT n FROM nn) * 1
        ),
        kept AS (SELECT * FROM ex WHERE line NOT IN (SELECT line FROM boiler)),
        agg AS (
            SELECT doc_id, count(*) AS n_kept,
                   string_agg(line, chr(10) ORDER BY pos) AS txt
            FROM kept GROUP BY doc_id
        )
        SELECT doc_id, CAST(n_kept AS BIGINT) AS n_kept, md5(txt) AS text_md5
        FROM agg
    """


@query(
    "text_html_extract",
    oracle=_html_extract_oracle_sql(),
    tags=("north-star", "curation", "html"),
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → clean text for a web corpus (operators/html.py): wrap each
    document's text in a deterministic synthetic page (shared nav/footer
    chrome, script/style/comment noise, HTML entities), extract visible
    text with the pure-Catalyst regex chain, then drop boilerplate by the
    CCNet-style line-frequency rule (a line in >= 10% of documents is
    chrome).  Output is (doc_id, n_kept, md5(text)) — the md5 pins the
    ENTIRE extraction bit-for-bit against the DuckDB replay: tag
    stripping, entity decode, whitespace policy, boilerplate set, and
    line order all have to match.

    Scale: extraction is whole-stage-codegen regex per row; the
    boilerplate pass is one (line, doc) shuffle + a broadcast anti-join
    (hash lines first at 100 TB — operators/html.py docstring)."""
    from aws_genaric_datapipeline_spark.operators import html as H

    (documents,) = load(spark, sf_dir, "documents")
    pages = documents.select(
        "doc_id",
        F.concat(
            F.lit(_HTML_PRE),
            F.col("doc_id").cast("string"),
            F.lit(_HTML_MID),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(_HTML_POST),
        ).alias("html"),
    )
    lines = pages.select("doc_id", H.html_text_lines(F.col("html")).alias("lines"))
    cleaned = H.drop_boilerplate_lines(lines, id_col="doc_id", lines_col="lines")
    return cleaned.select(
        "doc_id", "n_kept", F.md5(F.col("text")).alias("text_md5")
    )


def _classifier_budget_oracle_sql(budget_tokens: int = 150) -> str:
    """curate_classifier_budget replay: the shared GD training CTEs plus
    the greedy per-source budget fill — rank by (score DESC, doc_id),
    running token total, keep every document that STARTS within budget."""
    body, sig = _logreg_cte_body()
    return f"""
        WITH {body},
        meta AS (
            SELECT doc_id AS did, source,
                   CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_toks
            FROM documents
        ),
        ranked AS (
            SELECT m.did, m.source, m.n_toks,
                   CAST({sig.format(m='s.margin_fp')} AS BIGINT) AS score_fp,
                   sum(m.n_toks) OVER (
                       PARTITION BY m.source
                       ORDER BY {sig.format(m='s.margin_fp')} DESC, m.did
                       ROWS UNBOUNDED PRECEDING) AS cum_toks
            FROM scored s JOIN meta m USING (did)
        )
        SELECT did AS doc_id, source, score_fp, n_toks,
               CAST(cum_toks AS BIGINT) AS cum_toks
        FROM ranked
        WHERE cum_toks - n_toks < {budget_tokens}
    """


@query(
    "curate_classifier_budget",
    oracle=_classifier_budget_oracle_sql(),
    tags=("north-star", "curation", "classifier"),
)
def curate_classifier_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODEL-IN-THE-LOOP curation end to end: train the fixed-point
    quality classifier (operators/classifier.py — same 5-round GD as
    text_quality_classifier), then fill a per-source token budget
    GREEDILY BY CLASSIFIER SCORE: within each source, documents are
    ranked (score DESC, doc_id) and kept while the running token total
    still starts under 150 tokens (~2-3 winners per source at the
    fixture's document sizes — the budget BINDS, so selection order is
    exercised).  This is the FineWeb-Edu-shaped
    selection step — a trained model, not a heuristic, decides what
    survives — and the whole decision is integer-exact, so the oracle
    replays training AND selection bit-for-bit.

    Scale: scoring is one broadcast-join aggregate; the budget fill is
    one window per source (low-cardinality partition key — at heavy
    per-source skew, pre-aggregate candidates above a score floor before
    the window)."""
    from aws_genaric_datapipeline_spark.operators import classifier as C

    (documents,) = load(spark, sf_dir, "documents")
    # SPARSE layout — see text_quality_classifier (bit-identical, nnz scans)
    sp = C.sparse_token_features(documents, num_buckets=32)
    labels = documents.select(
        F.col("doc_id").alias("did"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).cast("bigint").alias("y"),
    )
    model = C.train_logreg_sparse(
        spark, sp, labels, iters=5, eta_num=1, eta_den=2**20
    )
    scored = C.score_documents_sparse(spark, sp, model)
    meta = documents.select(
        F.col("doc_id").alias("did"),
        "source",
        F.size(X.tokens(F.col("text"))).cast("bigint").alias("n_toks"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("score_fp"), F.asc("did"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = scored.join(meta, "did").select(
        "did",
        "source",
        "n_toks",
        "score_fp",
        F.sum("n_toks").over(w).cast("bigint").alias("cum_toks"),
    )
    return ranked.where(F.col("cum_toks") - F.col("n_toks") < 150).select(
        F.col("did").alias("doc_id"), "source", "score_fp", "n_toks", "cum_toks"
    )


_DUCK_QBP_CURR = """
    CAST(4 * least(length(trim(text)) * 20, 10000)
       + 3 * (CASE WHEN len({toks}) > 0
                   AND length(trim(text)) - (len({toks}) - 1) >= 2 * len({toks})
                   AND length(trim(text)) - (len({toks}) - 1) <= 12 * len({toks})
              THEN 10000 ELSE 0 END)
       + 3 * (CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE (length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g'))
                    * 10000) // length(trim(text)) END) AS BIGINT)
""".format(toks=_DUCK_TOKS)


@query(
    "curate_curriculum_schedule",
    oracle=f"""
        WITH scored AS (
            SELECT least({_DUCK_QBP_CURR} // 10000, 9) AS decile,
                   len({_DUCK_TOKS}) AS n_toks
            FROM documents
        ),
        buckets AS (
            SELECT decile, count(*) AS n_docs,
                   CAST(sum(n_toks) AS BIGINT) AS bucket_tokens
            FROM scored GROUP BY decile
        ),
        phases(phase, g) AS (VALUES ('warmup', 0), ('main', 1), ('polish', 3)),
        mass AS (
            SELECT phase, decile, n_docs, bucket_tokens,
                   CAST(CASE g WHEN 0 THEN 1
                               WHEN 1 THEN decile + 1
                               ELSE (decile + 1) * (decile + 1) * (decile + 1)
                        END AS BIGINT) * bucket_tokens AS m
            FROM buckets, phases
        )
        SELECT phase, CAST(decile AS BIGINT) AS decile,
               CAST(n_docs AS BIGINT) AS n_docs, bucket_tokens,
               round(m / CAST(sum(m) OVER (PARTITION BY phase) AS DOUBLE), 6)
                   AS sample_share,
               CAST((m * (SELECT CAST(sum(bucket_tokens) AS BIGINT) FROM buckets))
                    // sum(m) OVER (PARTITION BY phase) AS BIGINT)
                   AS planned_tokens
        FROM mass
    """,
    tags=("curation", "training"),
)
def curate_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum sampling schedule: given quality-score deciles
    (VALUE-bucketed on the exact integer score — no global sort, unlike
    ntile, so the bucketing needs no single-partition window at 100 TB)
    and a 3-phase curriculum (warmup samples uniformly, main
    proportional-to-quality, polish cubes the quality weight — the
    FineWeb-Edu/Phi-style "anneal on the best data" recipe), emit the
    per-(phase, decile) sampling share and a token plan for one epoch's
    budget per phase.

    All schedule arithmetic is INTEGER (weights (d+1)^γ with γ ∈ {0,1,3},
    masses and the token plan in bigint; only the reported share divides
    to double), so both engines agree bit-for-bit — no pow(), whose last-
    ulp differences between libm implementations could flip a floor().

    Scale: one pass scores documents (integer expression, map-side), the
    schedule itself lives on ≤ 10 bucket rows × 3 phases."""
    (documents,) = load(spark, sf_dir, "documents")
    from pyspark.sql import Window

    scored = documents.select(
        F.least(
            F.floor(X.quality_score_bp(F.col("text")) / 10000).cast("bigint"),
            F.lit(9),
        ).alias("decile"),
        F.size(X.tokens(F.trim(F.col("text")))).alias("n_toks"),
    )
    buckets = scored.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("bucket_tokens"),
    )
    phases = documents.sparkSession.createDataFrame(
        [("warmup", 0), ("main", 1), ("polish", 3)], "phase string, g int"
    )
    d1 = F.col("decile") + 1
    weight = (
        F.when(F.col("g") == 0, F.lit(1).cast("bigint"))
        .when(F.col("g") == 1, d1.cast("bigint"))
        .otherwise((d1 * d1 * d1).cast("bigint"))
    )
    mass = buckets.crossJoin(F.broadcast(phases)).select(
        "phase",
        "decile",
        "n_docs",
        "bucket_tokens",
        (weight * F.col("bucket_tokens")).alias("m"),
    )
    w = Window.partitionBy("phase")
    total = buckets.agg(F.sum("bucket_tokens").cast("bigint").alias("tot"))
    return (
        mass.crossJoin(F.broadcast(total))
        .withColumn("sum_m", F.sum("m").over(w))
        .select(
            "phase",
            F.col("decile").cast("bigint").alias("decile"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "bucket_tokens",
            F.round(F.col("m") / F.col("sum_m").cast("double"), 6).alias(
                "sample_share"
            ),
            # integral div, matching the oracle's `//`: double division +
            # floor() would lose exactness once m·tot exceeds 2^53
            F.expr("(m * tot) div sum_m").cast("bigint").alias("planned_tokens"),
        )
    )


_CALIB_ORACLE_BODY, _CALIB_SIG = _logreg_cte_body()


@query(
    "curate_classifier_calibration",
    oracle=f"""
        WITH {_CALIB_ORACLE_BODY},
        sc AS (
            SELECT s.did, l.y,
                   CAST({_CALIB_SIG.format(m='s.margin_fp')} AS BIGINT)
                       AS score_fp
            FROM scored s JOIN lab l USING (did)
        )
        SELECT CAST(least(score_fp // 100000, 9) AS BIGINT) AS score_decile,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(score_fp) // count(*) AS BIGINT) AS mean_score_fp,
               CAST(sum(y) AS BIGINT) AS n_positive,
               round(sum(y) / CAST(count(*) AS DOUBLE), 4) AS positive_rate
        FROM sc
        GROUP BY 1
    """,
    tags=("north-star", "curation", "classifier"),
)
def curate_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration (reliability) report for the trained quality
    classifier: corpus scored with the SAME bit-deterministic training
    loop as text_quality_classifier, then bucketed by score decile with
    the empirical positive rate per bucket — the diagram that tells a
    model-in-the-loop curation gate whether score 0.8 MEANS 80%
    (thresholds transfer) or the model is over/under-confident
    (thresholds must be re-tuned per corpus).  Mean scores stay in exact
    fixed-point integer division; only the empirical rate divides to
    double.

    Scale: training as in text_quality_classifier (two map-side folds
    per round); the calibration itself is one 10-bucket aggregation."""
    from aws_genaric_datapipeline_spark.operators import classifier as C

    (documents,) = load(spark, sf_dir, "documents")
    # SPARSE layout — see text_quality_classifier (bit-identical, nnz scans)
    sp = C.sparse_token_features(documents, num_buckets=32)
    labels = documents.select(
        F.col("doc_id").alias("did"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).cast("bigint").alias("y"),
    )
    model = C.train_logreg_sparse(
        spark, sp, labels, iters=5, eta_num=1, eta_den=2**20
    )
    scored = C.score_documents_sparse(spark, sp, model).join(labels, "did")
    decile = F.least(F.expr("score_fp div 100000"), F.lit(9)).cast("bigint")
    return scored.groupBy(decile.alias("score_decile")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr("sum(score_fp) div count(*)").cast("bigint").alias("mean_score_fp"),
        F.sum("y").cast("bigint").alias("n_positive"),
        F.round(F.sum("y") / F.count(F.lit(1)).cast("double"), 4).alias(
            "positive_rate"
        ),
    )


@query(
    "text_readability_scores",
    oracle=f"""
        WITH base AS (
            SELECT doc_id,
                   len({_DUCK_TOKS}) AS n_words,
                   greatest(len(regexp_split_to_array(trim(text), '[.!?]+'))
                            - CASE WHEN regexp_matches(trim(text), '[.!?]\\s*$')
                                   THEN 1 ELSE 0 END, 1) AS n_sentences,
                   greatest(len(regexp_split_to_array(lower(text), '[aeiouy]+'))
                            - 1, 1) AS n_syllables
            FROM documents WHERE length(trim(text)) > 0
        )
        SELECT doc_id,
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_sentences AS BIGINT) AS n_sentences,
               CAST(n_syllables AS BIGINT) AS n_syllables,
               CAST((206835 * n_sentences * n_words
                      - 1015 * n_words * n_words
                      - 84600 * n_syllables * n_sentences)
                     // (n_sentences * n_words) AS BIGINT) AS flesch_milli
        FROM base WHERE n_words > 0
    """,
    tags=("north-star", "text", "quality"),
)
def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document with a deterministic
    vowel-group syllable proxy — the classic readability feature
    text-quality stacks add next to length/entropy/stopword signals
    (dictionary syllabifiers disagree across versions; the vowel-group
    count is the reproducible engine-portable stand-in, biased but
    monotone with true syllables).  Sentence count = terminator-split
    segments (trailing terminator excluded), floored at 1 so
    fragment-only docs stay defined.

    All arithmetic is EXACT INTEGER: the Flesch combination is a single
    rational over the common denominator sentences*words, integral-
    divided (truncate-toward-zero in both engines) to milli-points — the double form is unfixable here because real
    corpora land scores exactly on .005 rounding boundaries (doc 493 at
    sf0.001 scores exactly 85.165), where last-ulp operation-order
    differences flip a 2-decimal round between engines.

    Scale: pure row-parallel JVM regex — zero shuffles at any corpus
    size, same class as the Gopher rule bundle."""
    (documents,) = load(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    n_words = F.size(X.tokens(t))
    n_sentences = F.greatest(
        F.size(F.split(t, r"[.!?]+"))
        - F.when(t.rlike(r"[.!?]\s*$"), 1).otherwise(0),
        F.lit(1),
    )
    n_syllables = F.greatest(
        F.size(F.split(F.lower(F.col("text")), r"[aeiouy]+")) - 1, F.lit(1)
    )
    base = documents.where(F.length(t) > 0).select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        n_sentences.cast("bigint").alias("n_sentences"),
        n_syllables.cast("bigint").alias("n_syllables"),
    )
    # integral div: both Spark's `div` and DuckDB's `//` truncate
    # toward zero, so negative scores agree too
    fm = F.expr(
        "(206835 * n_sentences * n_words - 1015 * n_words * n_words"
        " - 84600 * n_syllables * n_sentences)"
        " div (n_sentences * n_words)"
    )
    return base.where(F.col("n_words") > 0).select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        fm.cast("bigint").alias("flesch_milli"),
    )


def _duck_segment_ctes(src: str, text_expr: str, p: str = "sg") -> str:
    """CTE chunk replaying segment_dedup over ``src`` (doc_id +
    ``text_expr``): ends with ``{p}(doc_id, n_segments, n_dropped,
    cleaned)``.  Empty/whitespace text maps to ZERO segments (mirroring
    Spark tokens()'s empty-array guard), which matters mid-pipeline where
    an upstream pass can empty a document entirely."""
    toks = (
        f"CASE WHEN length(trim({text_expr})) = 0 THEN []::VARCHAR[] "
        f"ELSE string_split_regex(trim({text_expr}), '\\s+') END"
    )
    return f"""
        {p}_t AS (SELECT doc_id, {toks} AS toks FROM {src}),
        {p}_segs AS (
            SELECT doc_id, CAST(g.i AS INT) AS idx,
                   array_to_string(
                       list_slice(toks, (g.i - 1) * {_SEG_WORDS} + 1,
                                  g.i * {_SEG_WORDS}), ' ') AS seg
            FROM {p}_t, UNNEST(range(1,
                CAST(ceil(len(toks) / {_SEG_WORDS}.0) AS INT) + 1)) AS g(i)
        ),
        {p}_freq AS (
            SELECT seg, count(DISTINCT doc_id) AS df
            FROM {p}_segs GROUP BY seg
        ),
        {p}_agg AS (
            SELECT s.doc_id,
                   CAST(count(*) AS BIGINT) AS n_segments,
                   CAST(count(*) FILTER (f.df > {_SEG_MAX_DF}) AS BIGINT)
                       AS n_dropped,
                   coalesce(string_agg(s.seg, ' ' ORDER BY s.idx)
                            FILTER (f.df <= {_SEG_MAX_DF}), '') AS cleaned
            FROM {p}_segs s JOIN {p}_freq f ON f.seg = s.seg
            GROUP BY s.doc_id
        ),
        {p} AS (
            SELECT t.doc_id,
                   coalesce(a.n_segments, 0) AS n_segments,
                   coalesce(a.n_dropped, 0) AS n_dropped,
                   coalesce(a.cleaned, '') AS cleaned
            FROM {p}_t t LEFT JOIN {p}_agg a USING (doc_id)
        )"""


_GOPHER_PASSED = (
    "words_in_range AND mean_word_len_ok AND stopwords_ok AND top_token_ok "
    "AND symbol_ratio_ok AND bullet_lines_ok AND ellipsis_lines_ok "
    "AND alpha_words_ok"
)


@query(
    "curate_end_to_end",
    oracle=f"""
        WITH {_duck_gopher_cte("documents")},
        surv AS (
            SELECT d.doc_id, d.text
            FROM documents d JOIN gflags g USING (doc_id)
            WHERE {_GOPHER_PASSED}
        ),
        {_duck_span_ctes("surv", "sr")},
        {_duck_segment_ctes("sr", "cleaned", "sg")},
        fp AS (
            SELECT sr.doc_id, sr.n_removed_chars, sg.n_segments,
                   sg.n_dropped,
                   md5(trim(regexp_replace(lower(sg.cleaned), '\\s+', ' ',
                                           'g'))) AS final_md5
            FROM sr JOIN sg USING (doc_id)
        ),
        grp AS (
            SELECT final_md5, min(doc_id) AS keeper,
                   CAST(count(*) AS BIGINT) AS dup_count
            FROM fp GROUP BY 1
        )
        SELECT f.doc_id, f.n_removed_chars, f.n_segments, f.n_dropped,
               g.dup_count, f.final_md5
        FROM fp f
        JOIN grp g ON f.final_md5 = g.final_md5 AND f.doc_id = g.keeper
    """,
    tags=("north-star", "curation", "dedup", "text"),
)
def curate_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED curation pipeline, one query: Gopher rule pre-filter
    (row-parallel, zero shuffle) → ExactSubstr span removal (df≥2 char
    20-grams excised within the survivor set) → CCNet segment dedup over
    the span-cleaned text (empty-doc safe) → exact near-final dedup by
    normalized-content fingerprint (keep-min-id, dup_count).  Emits one
    row per finally-kept document with the per-stage loss accounting and
    the md5 of the final text — the full cleaning lineage a pretraining
    data pipeline runs before tokenization, and the oracle replays every
    stage end to end.

    Scale: stage costs are exactly the component operators' documented
    shapes (each stage consumes the previous frame without
    re-materializing the corpus); the composition adds no new shuffle
    beyond its parts."""
    from aws_genaric_datapipeline_spark.operators.text import normalize_text

    (documents,) = load(spark, sf_dir, "documents")
    passed = X.gopher_rules(documents).where(F.col("passed")).select("doc_id")
    # The two fan-out points each feed 2-3 downstream subtrees; without a
    # cut, Spark re-derives the whole upstream per reference (measured: 20
    # parquet scans of documents).  Eager localCheckpoints pin each stage
    # to ONE evaluation — same pattern as sim_tfidf_cosine_pairs' shared w.
    survivors = (
        documents.join(passed, "doc_id")
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    spans = X.remove_repeated_spans(survivors, k=20).localCheckpoint(
        eager=True
    )
    segd = X.segment_dedup(
        spans.select("doc_id", F.col("cleaned").alias("text"))
    )
    merged = spans.select("doc_id", "n_removed_chars").join(segd, "doc_id")
    staged = merged.select(
        "doc_id",
        "n_removed_chars",
        "n_segments",
        "n_dropped",
        F.md5(normalize_text(F.col("cleaned"))).alias("final_md5"),
    )
    w = Window.partitionBy("final_md5")
    ranked = staged.select(
        "*",
        F.min("doc_id").over(w).alias("keeper"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("dup_count"),
    )
    return ranked.where(F.col("doc_id") == F.col("keeper")).select(
        "doc_id",
        "n_removed_chars",
        "n_segments",
        "n_dropped",
        "dup_count",
        "final_md5",
    )


# ---------------------------------------------------- WordPiece tokenizer oracle
# Full-replay DuckDB mirror of operators/text.py wordpiece_learn/apply:
# '##'-marked char split, per-round pair + symbol histograms, the
# quantized likelihood-gain arg-max (floor(1e12·cnt/(ca·cb)) — one IEEE
# divide + multiply, no libm), the recursive merge walk, the final piece
# inventory (alphabet ∪ merge outputs), and greedy longest-match
# re-segmentation with whole-word <unk> — the same replay-everything
# posture as the BPE and unigram oracles above.
_WP_MERGES = 3


def _wp_round_sql(r: int) -> str:
    """One WordPiece training round as DuckDB CTEs: pair histogram AND
    symbol histogram over syms{r-1}, arg-max of the quantized score
    (score DESC, pair ASC), and the left-to-right non-overlapping merge
    as a recursive index walk appending a || substr(b, 3)."""
    prev = f"syms{r - 1}"
    top = f"top{r}"
    return f"""
        pairs{r} AS MATERIALIZED (
            SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
            FROM (
                SELECT freq, u.p.a AS a, u.p.b AS b
                FROM {prev}, UNNEST(list_transform(range(1, len(syms)),
                     i -> struct_pack(a := syms[i], b := syms[i + 1]))) AS u(p)
            ) GROUP BY a, b
        ),
        symc{r} AS MATERIALIZED (
            SELECT s.sym AS sym, CAST(sum(freq) AS BIGINT) AS c
            FROM {prev}, UNNEST(syms) AS s(sym) GROUP BY 1
        ),
        {top} AS MATERIALIZED (
            SELECT p.a, p.b, p.cnt,
                   CAST(floor(1e12 * (p.cnt
                        / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))))
                       AS BIGINT) AS score_e12
            FROM pairs{r} p
            JOIN symc{r} ca ON ca.sym = p.a
            JOIN symc{r} cb ON cb.sym = p.b
            ORDER BY score_e12 DESC, p.a, p.b LIMIT 1
        ),
        walk{r} AS (
            SELECT word, freq, syms, 1 AS i, []::VARCHAR[] AS acc FROM {prev}
            UNION ALL
            SELECT word, freq, syms,
                   CASE WHEN i < len(syms)
                             AND syms[i] = (SELECT a FROM {top})
                             AND syms[i + 1] = (SELECT b FROM {top})
                        THEN i + 2 ELSE i + 1 END,
                   CASE WHEN i < len(syms)
                             AND syms[i] = (SELECT a FROM {top})
                             AND syms[i + 1] = (SELECT b FROM {top})
                        THEN list_append(acc, syms[i] || substr(syms[i + 1], 3))
                        ELSE list_append(acc, syms[i]) END
            FROM walk{r} WHERE i <= len(syms)
        ),
        syms{r} AS MATERIALIZED (
            SELECT word, freq, acc AS syms FROM walk{r}
            WHERE i = len(syms) + 1
        )"""


def _wp_train_ctes(train_where: str = "") -> str:
    """The WITH-prefix replaying WordPiece training (word histogram, '##'
    split, _WP_MERGES merge rounds) over documents matching
    ``train_where`` (ANDed into the histogram scan) — parametrized so the
    held-out variant trains on a slice while encoding everything."""
    return (
        f"""
    WITH RECURSIVE wt AS MATERIALIZED (
        SELECT tok AS word, count(*) AS freq
        FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
        WHERE length(trim(text)) > 0 {train_where}
        GROUP BY tok
    ),
    syms0 AS MATERIALIZED (
        SELECT word, freq,
               list_transform(range(1, length(word) + 1),
                   i -> CASE WHEN i = 1 THEN word[i]
                             ELSE '##' || word[i] END) AS syms
        FROM wt
    ),
    """
        + ",\n".join(_wp_round_sql(r) for r in range(1, _WP_MERGES + 1))
    )


_WP_TRAIN_CTES = _wp_train_ctes()

_WP_LEARN_ORACLE = (
    _WP_TRAIN_CTES
    + "\n    "
    + "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS merge_rank, a AS left_sym,"
        f" b AS right_sym, cnt AS pair_count, score_e12 FROM top{r}"
        for r in range(1, _WP_MERGES + 1)
    )
)


@query(
    "tokenizer_wordpiece_learn",
    oracle=_WP_LEARN_ORACLE,
    tags=("north-star", "text", "tokenizer"),
)
def tokenizer_wordpiece_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece vocabulary training (Schuster & Nakajima 2012 — the BERT
    tokenizer): the first 3 learned merges, each round picking the pair
    maximizing the quantized likelihood gain count(ab)/(count(a)·count(b))
    — completing the trained-tokenizer family triple next to BPE
    (frequency objective) and unigram-LM (prune objective).  The oracle
    replays every round in full: pair AND symbol histograms, the
    quantized-score arg-max, and the sequential '##'-aware merge walk."""
    (documents,) = load(spark, sf_dir, "documents")
    return X.wordpiece_learn(documents, num_merges=_WP_MERGES)


def _wp_apply_oracle(train_where: str = "") -> str:
    """Full train→inventory→encode WordPiece replay: training over the
    ``train_where`` slice, the piece inventory, the per-(word, position)
    best-match table, the recursive maximal-munch walk with whole-word
    <unk>, and per-doc reassembly over the WHOLE corpus."""
    return _wp_train_ctes(train_where) + _WP_APPLY_SUFFIX


_WP_APPLY_SUFFIX = (
    f""",
    wpvocab AS MATERIALIZED (
        SELECT DISTINCT s.sym AS piece FROM syms0, UNNEST(syms) AS s(sym)
        """
    + " ".join(
        f"UNION SELECT a || substr(b, 3) FROM top{r}"
        for r in range(1, _WP_MERGES + 1)
    )
    + f"""
    ),
    toksw AS MATERIALIZED (
        SELECT doc_id, CAST(u.i AS INT) AS widx, ({_DUCK_TOKS})[u.i] AS word
        FROM documents, UNNEST(range(1, len({_DUCK_TOKS}) + 1)) AS u(i)
        WHERE length(trim(text)) > 0
    ),
    dwp AS MATERIALIZED (SELECT DISTINCT word FROM toksw),
    posw AS MATERIALIZED (
        SELECT word, CAST(t.i AS INT) AS p
        FROM dwp, UNNEST(range(1, length(word) + 1)) AS t(i)
    ),
    bmw AS MATERIALIZED (
        SELECT pw.word, pw.p,
               coalesce(max(CASE WHEN pw.p = 1 THEN length(v.piece)
                                 ELSE length(v.piece) - 2 END), 0) AS bl
        FROM posw pw LEFT JOIN wpvocab v
          ON (pw.p = 1 AND v.piece NOT LIKE '##%'
              AND length(v.piece) <= length(pw.word)
              AND substr(pw.word, 1, length(v.piece)) = v.piece)
          OR (pw.p > 1 AND v.piece LIKE '##%'
              AND length(v.piece) > 2
              AND length(v.piece) - 2 <= length(pw.word) - pw.p + 1
              AND substr(pw.word, pw.p, length(v.piece) - 2)
                  = substr(v.piece, 3))
        GROUP BY 1, 2
    ),
    segw AS (
        SELECT word, 1 AS p, '' AS toks, false AS failed FROM dwp
        UNION ALL
        SELECT s.word,
               s.p + CASE WHEN b.bl = 0 THEN length(s.word) ELSE b.bl END,
               s.toks || CASE WHEN s.toks = '' THEN '' ELSE ' ' END ||
                   CASE WHEN b.bl = 0 THEN '<unk>'
                        WHEN s.p = 1 THEN substr(s.word, 1, b.bl)
                        ELSE '##' || substr(s.word, s.p, b.bl) END,
               s.failed OR b.bl = 0
        FROM segw s JOIN bmw b ON b.word = s.word AND b.p = s.p
        WHERE s.p <= length(s.word)
    ),
    donew AS MATERIALIZED (
        SELECT word,
               CASE WHEN failed THEN '<unk>' ELSE toks END AS toks,
               CASE WHEN failed THEN 1
                    ELSE CAST(length(toks)
                         - length(replace(toks, ' ', '')) + 1 AS BIGINT)
               END AS ntoks,
               failed
        FROM segw WHERE p > length(word)
    ),
    per_docw AS (
        SELECT w.doc_id AS did,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(sum(d.ntoks) AS BIGINT) AS n_pieces,
               CAST(sum(CASE WHEN d.failed THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_unk_words,
               string_agg(d.toks, ' ' ORDER BY w.widx) AS stream
        FROM toksw w JOIN donew d USING (word)
        GROUP BY 1
    )
    SELECT d.doc_id,
           coalesce(p.n_words, 0) AS n_words,
           coalesce(p.n_pieces, 0) AS n_pieces,
           coalesce(p.n_unk_words, 0) AS n_unk_words,
           coalesce(md5(p.stream), md5('')) AS stream_md5
    FROM documents d LEFT JOIN per_docw p ON p.did = d.doc_id
    """
)


@query(
    "tokenizer_wordpiece_apply",
    oracle=_wp_apply_oracle(),
    tags=("north-star", "text", "tokenizer"),
)
def tokenizer_wordpiece_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end WordPiece chain: TRAIN the merge table (the same 3
    merges tokenizer_wordpiece_learn verifies), build the piece
    inventory (training alphabet ∪ merge outputs — merge ORDER is
    discarded, HF WordPiece semantics), then ENCODE every document by
    greedy longest-match with whole-word <unk> — the defining contrast
    with tokenizer_bpe_apply, which replays merges in rank order.  The
    oracle replays training, the piece inventory, the per-(word,
    position) best-match table, the recursive maximal-munch walk, and
    per-doc reassembly; md5 of the full piece stream pins the entire
    segmentation.

    Driver data is the merge table + the artifact-sized piece list; the
    greedy scan runs over DISTINCT WORD TYPES in one Arrow batch pass."""
    (documents,) = load(spark, sf_dir, "documents")
    # one corpus scan feeds training AND the alphabet (the encode pass
    # still scans for token positions — that one is irreducible)
    wt = X.wordpiece_word_types(documents).localCheckpoint(eager=True)
    trained = (
        X.wordpiece_learn(documents, num_merges=_WP_MERGES, word_types=wt)
        .orderBy("merge_rank")
        .collect()
    )
    merges = [(r["left_sym"], r["right_sym"]) for r in trained]
    pieces = X.wordpiece_vocab_pieces(documents, merges, word_types=wt)
    return X.wordpiece_apply(documents, pieces)


@query(
    "tokenizer_wordpiece_heldout",
    oracle=_wp_apply_oracle("AND doc_id % 2 = 0"),
    tags=("north-star", "text", "tokenizer"),
)
def tokenizer_wordpiece_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out WordPiece split (the twin of tokenizer_unigram_heldout):
    the merge table AND piece inventory train on the even-doc-id slice
    only, then greedy longest-match encodes the WHOLE corpus — held-out
    word types segment through slice-trained pieces (or collapse to
    whole-word <unk> when a character never appeared in the slice), so
    any train/apply leakage flips the stream hashes.  The oracle retrains
    on the same slice and replays the full encode."""
    (documents,) = load(spark, sf_dir, "documents")
    train = documents.where(F.col("doc_id") % 2 == 0)
    wt = X.wordpiece_word_types(train).localCheckpoint(eager=True)
    trained = (
        X.wordpiece_learn(train, num_merges=_WP_MERGES, word_types=wt)
        .orderBy("merge_rank")
        .collect()
    )
    merges = [(r["left_sym"], r["right_sym"]) for r in trained]
    pieces = X.wordpiece_vocab_pieces(train, merges, word_types=wt)
    return X.wordpiece_apply(documents, pieces)


@query(
    "tokenizer_incremental_refresh",
    oracle=_BPE_ORACLE.replace(
        "SELECT CAST(1 AS INT) AS merge_rank,",
        "SELECT CAST(2 AS BIGINT) AS state_versions,"
        " CAST(1 AS INT) AS merge_rank,",
    ).replace(
        "SELECT CAST(2 AS INT) AS merge_rank,",
        "SELECT CAST(2 AS BIGINT) AS state_versions,"
        " CAST(2 AS INT) AS merge_rank,",
    ).replace(
        "SELECT CAST(3 AS INT) AS merge_rank,",
        "SELECT CAST(2 AS BIGINT) AS state_versions,"
        " CAST(3 AS INT) AS merge_rank,",
    ),
    tags=("north-star", "text", "tokenizer", "incremental"),
)
def tokenizer_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL tokenizer re-train (the last operator family without
    an incremental path — VERDICT r12 item 3): the trained BPE artifact
    is a pure function of the (word, freq) histogram, so the standing
    state is that histogram in a TxnTable — seeded from the even-doc-id
    half of the corpus (v1), then REFRESHED by folding in the odd half's
    batch histogram (bpe_merge_histograms — a vocab-sized mergeable-state
    union, no corpus re-scan; v2) — and the merge table re-derives from
    the refreshed state (bpe_learn_from_histogram, vocab-sized work).

    Exactness mirrors ivf_append_batch's append≡union contract:
    hist(A) ⊎ hist(B) = hist(A ∪ B), so the re-derived merges equal the
    full rebuild bit for bit — which is what the oracle checks, by
    replaying full-corpus BPE training end to end.  ``state_versions``
    pins that the state really went through seed + refresh commits.

    Scale: a 100 TB standing corpus contributes its histogram ONCE;
    every ingest batch costs one batch-sized tokenize + one vocab-sized
    merge commit, and retraining reads only the vocab-sized state."""
    import shutil
    import tempfile
    from pathlib import Path

    from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable

    (documents,) = load(spark, sf_dir, "documents")
    seed = documents.where(F.col("doc_id") % 2 == 0)
    batch = documents.where(F.col("doc_id") % 2 != 0)
    root = (
        Path(tempfile.gettempdir())
        / f"aws_gdp_tok_state_{spark.sparkContext.applicationId}"
    )
    shutil.rmtree(root, ignore_errors=True)
    state = TxnTable(spark, str(root))
    state.overwrite(X.bpe_word_histogram(seed), app_txn_id="tok-seed")
    refreshed = X.bpe_merge_histograms(
        state.read(), X.bpe_word_histogram(batch)
    )
    state.overwrite(refreshed, app_txn_id="tok-refresh")
    merges = X.bpe_learn_from_histogram(state.read(), num_merges=_BPE_MERGES)
    return merges.select(
        F.lit(state.latest_version()).cast("bigint").alias("state_versions"),
        "merge_rank",
        "left_sym",
        "right_sym",
        "pair_count",
    )


@query(
    "tokenizer_bytebpe_heldout",
    oracle=_bpe_apply_oracle(
        _BYTEBPE_HELDOUT_CTES, 2, seg_src=f"asyms{_BPE_MERGES}"
    ),
    tags=("north-star", "text", "tokenizer"),
)
def tokenizer_bytebpe_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out byte-BPE split (completes the heldout family alongside
    WordPiece and unigram — and is where byte-level earns its keep): the
    merge table trains on the EVEN-doc-id slice only, then encodes the
    WHOLE corpus.  Held-out word types the slice never saw still encode
    exactly — worst case all byte symbols, never ``<unk>`` (WordPiece's
    held-out collapse) — so the stream hashes pin both the slice-trained
    merges and the byte fallback.  The oracle retrains on the slice and
    applies the winners to ALL word types via a second recursive walk
    chain."""
    (documents,) = load(spark, sf_dir, "documents")
    train = documents.where(F.col("doc_id") % 2 == 0)
    trained = (
        X.bpe_learn(train, num_merges=_BPE_MERGES, byte_level=True)
        .orderBy("merge_rank")
        .collect()
    )
    merges = [(r["left_sym"], r["right_sym"]) for r in trained]
    return X.bpe_apply(documents, merges, byte_level=True)


@query(
    "tokenizer_incremental_bytebpe",
    oracle=_bpe_learn_oracle(_BYTEBPE_TRAIN_CTES).replace(
        "SELECT CAST(1 AS INT) AS merge_rank,",
        "SELECT CAST(2 AS BIGINT) AS state_versions,"
        " CAST(1 AS INT) AS merge_rank,",
    ).replace(
        "SELECT CAST(2 AS INT) AS merge_rank,",
        "SELECT CAST(2 AS BIGINT) AS state_versions,"
        " CAST(2 AS INT) AS merge_rank,",
    ).replace(
        "SELECT CAST(3 AS INT) AS merge_rank,",
        "SELECT CAST(2 AS BIGINT) AS state_versions,"
        " CAST(3 AS INT) AS merge_rank,",
    ),
    tags=("north-star", "text", "tokenizer", "incremental"),
)
def tokenizer_incremental_bytebpe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Byte-level twin of tokenizer_incremental_refresh: the (word, freq)
    histogram state is SYMBOL-AGNOSTIC (words, not symbols), so the same
    TxnTable seed + vocab-sized fold re-derives the BYTE-level merge
    table with zero corpus re-scan — the incremental path the byte
    alphabet inherited for free.  The oracle replays full-corpus
    byte-BPE training end to end; ``state_versions`` pins the
    seed + refresh commits."""
    import shutil
    import tempfile
    from pathlib import Path

    from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable

    (documents,) = load(spark, sf_dir, "documents")
    seed = documents.where(F.col("doc_id") % 2 == 0)
    batch = documents.where(F.col("doc_id") % 2 != 0)
    root = (
        Path(tempfile.gettempdir())
        / f"aws_gdp_btok_state_{spark.sparkContext.applicationId}"
    )
    shutil.rmtree(root, ignore_errors=True)
    state = TxnTable(spark, str(root))
    state.overwrite(X.bpe_word_histogram(seed), app_txn_id="btok-seed")
    refreshed = X.bpe_merge_histograms(
        state.read(), X.bpe_word_histogram(batch)
    )
    state.overwrite(refreshed, app_txn_id="btok-refresh")
    merges = X.bpe_learn_from_histogram(
        state.read(), num_merges=_BPE_MERGES, byte_level=True
    )
    return merges.select(
        F.lit(state.latest_version()).cast("bigint").alias("state_versions"),
        "merge_rank",
        "left_sym",
        "right_sym",
        "pair_count",
    )


# ------------------------------------------------- learned re-rank (stage 3)
_RERANK_QIDS = (1, 2, 3, 4, 5)
_RERANK_TRAIN = (1, 3, 5)
_RERANK_EVAL = (2, 4)
_RERANK_TOP = 10
_RERANK_K = 5
_RERANK_ETA_DEN = 2**20
_RERANK_ITERS = 5
_RERANK_W = {
    (i, rel): (
        int(1e6 * rel)
        if i == 1
        else int(1e6 * rel // __import__("math").log2(i + 1))
    )
    for i in range(1, _RERANK_K + 1)
    for rel in range(1, _RERANK_K + 1)
}
_RERANK_IDCG = sum(
    _RERANK_W[(i, _RERANK_K + 1 - i)] for i in range(1, _RERANK_K + 1)
)


def _rerank_oracle_sql() -> str:
    """Full replay of search_rerank_linear: BM25 lexical leg, exact
    cosine, candidate union, integer feature frame, the ENTIRE 5-round
    fixed-point GD (shared _logreg_round_ctes template), margin re-rank,
    RRF baseline, and the integer-lattice nDCG@5 of both rankings."""
    sig, tdiv = _logreg_sig_tdiv()
    K, TOP = _RERANK_K, _RERANK_TOP
    qids = ", ".join(f"({q})" for q in _RERANK_QIDS)
    train = ", ".join(str(q) for q in _RERANK_TRAIN)
    ev = ", ".join(str(q) for q in _RERANK_EVAL)
    wvals = ", ".join(
        f"({i}, {rel}, {w})" for (i, rel), w in sorted(_RERANK_W.items())
    )
    rounds = ",".join(
        _logreg_round_ctes(_RERANK_ITERS, 1, _RERANK_ETA_DEN, sig, tdiv)
    )
    wN = f"w{_RERANK_ITERS}"
    return f"""
        WITH wlat(i, rel, w) AS (VALUES {wvals}),
        qs(query_id) AS (VALUES {qids}),
        toks AS (
            SELECT doc_id AS tdid, t.tok
            FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
            WHERE length(trim(text)) > 0
        ),
        dlen AS (SELECT tdid, count(*) AS dl FROM toks GROUP BY tdid),
        bstats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dlen),
        tf AS (
            SELECT tdid, tok, count(*) AS tf
            FROM toks WHERE tok IN ('spark', 'vector', 'merge')
            GROUP BY tdid, tok
        ),
        dft AS (SELECT tok, count(*) AS dft FROM tf GROUP BY tok),
        bm AS (
            SELECT tf.tdid AS doc_id,
                   round(sum(
                       ln(1 + (n_docs - dft + 0.5) / (dft + 0.5))
                       * tf * (1.2 + 1)
                       / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                   ), 4) AS bm25
            FROM tf
            JOIN dft ON tf.tok = dft.tok
            JOIN dlen ON tf.tdid = dlen.tdid
            CROSS JOIN bstats
            GROUP BY tf.tdid
        ),
        lex AS (
            SELECT doc_id, bm25,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
            FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT {TOP})
        ),
        vbase AS MATERIALIZED (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        qv AS (
            SELECT b.vec_id AS query_id, b.v AS qvec
            FROM vbase b JOIN qs ON b.vec_id = qs.query_id
        ),
        cosall AS MATERIALIZED (
            SELECT q.query_id, b.vec_id AS doc_id,
                   round(list_cosine_similarity(q.qvec, b.v), 4) AS cos
            FROM qv q, vbase b WHERE b.vec_id <> q.query_id
        ),
        sem AS (
            SELECT query_id, doc_id, cos,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY cos DESC, doc_id
                   ) AS sem_rank
            FROM cosall QUALIFY sem_rank <= {TOP}
        ),
        exr AS (
            SELECT query_id, doc_id, sem_rank AS exrank
            FROM sem WHERE sem_rank <= {K}
        ),
        cand AS (
            SELECT DISTINCT query_id, doc_id FROM (
                SELECT query_id, doc_id FROM sem
                UNION ALL
                SELECT q.query_id, l.doc_id FROM qs q, lex l)
        ),
        feat0 AS MATERIALIZED (
            SELECT c.query_id, c.doc_id,
                   c.query_id * 1000000 + c.doc_id AS did,
                   CAST(coalesce(round(l.bm25 * 10000), 0) AS BIGINT) AS x0,
                   CAST(coalesce(round(a.cos * 10000), 0) AS BIGINT) AS x1,
                   CAST(coalesce(d.dl, 0) AS BIGINT) AS x2
            FROM cand c
            LEFT JOIN lex l USING (doc_id)
            LEFT JOIN cosall a
              ON a.query_id = c.query_id AND a.doc_id = c.doc_id
            LEFT JOIN dlen d ON d.tdid = c.doc_id
        ),
        feat AS (
            SELECT did, j, x FROM (
                SELECT did, CAST(0 AS BIGINT) j, x0 AS x FROM feat0
                UNION ALL SELECT did, 1, x1 FROM feat0
                UNION ALL SELECT did, 2, x2 FROM feat0
                UNION ALL SELECT did, 3, 1000 FROM feat0)
            WHERE did // 1000000 IN ({train})
        ),
        lab AS (
            SELECT f.did,
                   CAST(CASE WHEN e.exrank IS NOT NULL THEN 1 ELSE 0 END
                        AS BIGINT) AS y
            FROM feat0 f LEFT JOIN exr e
              ON e.query_id = f.query_id AND e.doc_id = f.doc_id
            WHERE f.query_id IN ({train})
        ),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lab),
        w0 AS (
            SELECT CAST(g.j AS BIGINT) AS j, CAST(0 AS BIGINT) AS w
            FROM UNNEST(range(0, 4)) AS g(j)
        ),{rounds},
        scored AS (
            SELECT f.query_id, f.doc_id,
                   f.x0 * (SELECT w FROM {wN} WHERE j = 0)
                   + f.x1 * (SELECT w FROM {wN} WHERE j = 1)
                   + f.x2 * (SELECT w FROM {wN} WHERE j = 2)
                   + 1000 * (SELECT w FROM {wN} WHERE j = 3) AS m
            FROM feat0 f WHERE f.query_id IN ({ev})
        ),
        rrk AS (
            SELECT query_id, doc_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY m DESC, doc_id
                   ) AS rn
            FROM scored QUALIFY rn <= {K}
        ),
        fused AS (
            SELECT c.query_id, c.doc_id,
                   round(coalesce((1.0::DOUBLE) / (60 + l.lex_rank), 0.0)
                       + coalesce((1.0::DOUBLE) / (60 + s.sem_rank), 0.0), 6)
                       AS s
            FROM cand c
            LEFT JOIN lex l USING (doc_id)
            LEFT JOIN sem s
              ON s.query_id = c.query_id AND s.doc_id = c.doc_id
            WHERE c.query_id IN ({ev})
        ),
        frk AS (
            SELECT query_id, doc_id,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY s DESC, doc_id
                   ) AS rn
            FROM fused QUALIFY rn <= {K}
        ),
        dcg_rerank AS (
            SELECT r.query_id, CAST(coalesce(sum(wl.w), 0) AS BIGINT) AS dcg
            FROM rrk r
            LEFT JOIN exr e
              ON e.query_id = r.query_id AND e.doc_id = r.doc_id
            LEFT JOIN wlat wl
              ON wl.i = r.rn AND wl.rel = {K} + 1 - e.exrank
            GROUP BY r.query_id
        ),
        dcg_rrf AS (
            SELECT r.query_id, CAST(coalesce(sum(wl.w), 0) AS BIGINT) AS dcg
            FROM frk r
            LEFT JOIN exr e
              ON e.query_id = r.query_id AND e.doc_id = r.doc_id
            LEFT JOIN wlat wl
              ON wl.i = r.rn AND wl.rel = {K} + 1 - e.exrank
            GROUP BY r.query_id
        )
        SELECT a.query_id,
               (SELECT w FROM {wN} WHERE j = 0) AS w_bm25,
               (SELECT w FROM {wN} WHERE j = 1) AS w_cos,
               (SELECT w FROM {wN} WHERE j = 2) AS w_len,
               (SELECT w FROM {wN} WHERE j = 3) AS w_bias,
               CAST(b.dcg * 10000 // {_RERANK_IDCG} AS BIGINT) AS ndcg_rrf_bp,
               CAST(a.dcg * 10000 // {_RERANK_IDCG} AS BIGINT) AS ndcg_rerank_bp,
               CAST(a.dcg * 10000 // {_RERANK_IDCG}
                    - b.dcg * 10000 // {_RERANK_IDCG} AS BIGINT) AS uplift_bp
        FROM dcg_rerank a JOIN dcg_rrf b USING (query_id)
    """


@query(
    "search_rerank_linear",
    oracle=_rerank_oracle_sql(),
    tags=("north-star", "text", "search", "similarity", "classifier"),
)
def search_rerank_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third-stage LEARNED RE-RANK over hybrid retrieval (the standard
    production ladder: candidate generation → rank fusion → model
    re-scoring): per query, the candidate pool is the union of the BM25
    lexical top-10 and the cosine semantic top-10; a linear model over
    integer features [bm25·1e4, cosine·1e4, doc_length] + bias is
    trained with the fixed-point GD of operators/classifier.py
    (train_logreg, 5 rounds, eta 1/2^20) on the TRAIN queries' candidates
    (label = membership in the exact-cosine top-5), then re-scores the
    HELD-OUT queries' candidates by margin.  The emitted report compares
    integer-lattice nDCG@5 of the learned ranking against the RRF
    baseline per held-out query, with the trained weights pinned as
    columns — the oracle replays the WHOLE chain (legs, features, every
    GD round, both rankings, both metrics) bit-exactly.

    On this fixture the model recovers what rank-only fusion loses
    (cosine dominance; lex-only candidates demoted by a learned negative
    BM25 weight): nDCG@5 uplift vs RRF is positive on both held-out
    queries at sf0.001/0.01/0.1 — asserted in
    tests/test_operators.py::TestSearchRerankLinear.

    Scale: candidate pools are K-sized per query (TakeOrdered legs), so
    training and scoring touch |Q|·K rows — the corpus contributes one
    BM25 pass and one brute-force cosine pass (the exact ground truth a
    recall audit pays anyway; swap in the IVF tier's probes for the
    production path)."""
    from aws_genaric_datapipeline_spark.operators.classifier import (
        FEAT_SCALE,
        train_logreg_rows,
    )
    from aws_genaric_datapipeline_spark.operators import similarity as S

    documents, embeddings = load(spark, sf_dir, "documents", "embeddings")
    qids = list(_RERANK_QIDS)
    K, TOP = _RERANK_K, _RERANK_TOP
    bm = X.bm25_scores(documents, terms=("spark", "vector", "merge"))
    lexw = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = (
        bm.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(TOP)
        .select("doc_id", "bm25", F.row_number().over(lexw).alias("lex_rank"))
        .localCheckpoint(eager=True)
    )
    # one brute-force pass scores the whole panel (exact ground truth +
    # the cosine feature for every candidate)
    allcos = S.cosine_topk(embeddings, query_ids=qids, k=1 << 62).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "cosine_sim"
    )
    w_q = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("doc_id")
    )
    semr = (
        allcos.withColumn("sem_rank", F.row_number().over(w_q))
        .where(F.col("sem_rank") <= TOP)
        .localCheckpoint(eager=True)
    )
    exr = semr.where(F.col("sem_rank") <= K).select(
        "query_id", "doc_id", F.col("sem_rank").alias("exrank")
    )
    qpanel = spark.createDataFrame([(q,) for q in qids], "query_id bigint")
    cand = (
        semr.select("query_id", "doc_id")
        .unionByName(qpanel.crossJoin(lex.select("doc_id")))
        .distinct()
    )
    # length feature only matters for candidate docs — semi-join first so
    # the tokenize pass touches |candidates| rows, not the corpus
    dl = documents.join(
        cand.select("doc_id").distinct(), "doc_id", "left_semi"
    ).select("doc_id", F.size(X.tokens(F.col("text"))).alias("dl"))
    feats = (
        cand.join(allcos, ["query_id", "doc_id"], "left")
        .join(lex.select("doc_id", "bm25"), "doc_id", "left")
        .join(dl, "doc_id", "left")
        .select(
            "query_id",
            "doc_id",
            F.coalesce(F.round(F.col("bm25") * 10000), F.lit(0))
            .cast("bigint")
            .alias("x0"),
            F.coalesce(F.round(F.col("cosine_sim") * 10000), F.lit(0))
            .cast("bigint")
            .alias("x1"),
            F.coalesce("dl", F.lit(0)).cast("bigint").alias("x2"),
        )
        .localCheckpoint(eager=True)
    )
    did = (F.col("query_id") * F.lit(1000000) + F.col("doc_id")).alias("did")
    lab = cand.join(exr, ["query_id", "doc_id"], "left").select(
        did,
        F.when(F.col("exrank").isNotNull(), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("y"),
        "query_id",
    )
    featl = feats.select(
        did, "query_id", F.posexplode(F.array("x0", "x1", "x2")).alias("j", "x")
    ).unionByName(
        feats.select(
            did, "query_id", F.lit(3).alias("j"), F.lit(FEAT_SCALE).alias("x")
        )
    )
    train_q = list(_RERANK_TRAIN)
    # the training set is candidate-pool-sized (|Q|·K rows) by
    # construction — collect once and run the SAME integer GD driver-side
    # (train_logreg_rows is bit-identical to the distributed loop, which
    # spent seconds orchestrating ~60 rows)
    model = train_logreg_rows(
        [
            (r["did"], r["j"], r["x"])
            for r in featl.where(F.col("query_id").isin(train_q)).collect()
        ],
        [
            (r["did"], r["y"])
            for r in lab.where(F.col("query_id").isin(train_q)).collect()
        ],
        num_buckets=3,
        iters=_RERANK_ITERS,
        eta_num=1,
        eta_den=_RERANK_ETA_DEN,
    )
    wts = model.weights_fp
    eval_q = list(_RERANK_EVAL)
    margin = (
        F.col("x0") * F.lit(int(wts[0]))
        + F.col("x1") * F.lit(int(wts[1]))
        + F.col("x2") * F.lit(int(wts[2]))
        + F.lit(FEAT_SCALE) * F.lit(int(wts[3]))
    ).cast("bigint")
    rw = Window.partitionBy("query_id").orderBy(F.desc("m"), F.asc("doc_id"))
    rrk = (
        feats.where(F.col("query_id").isin(eval_q))
        .select("query_id", "doc_id", margin.alias("m"))
        .withColumn("rn", F.row_number().over(rw))
        .where(F.col("rn") <= K)
    )
    rrf_score = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("lex_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("sem_rank")), F.lit(0.0)),
        6,
    )
    fw = Window.partitionBy("query_id").orderBy(F.desc("s"), F.asc("doc_id"))
    frk = (
        cand.where(F.col("query_id").isin(eval_q))
        .join(lex.select("doc_id", "lex_rank"), "doc_id", "left")
        .join(
            semr.select("query_id", "doc_id", "sem_rank"),
            ["query_id", "doc_id"],
            "left",
        )
        .select("query_id", "doc_id", rrf_score.alias("s"))
        .withColumn("rn", F.row_number().over(fw))
        .where(F.col("rn") <= K)
    )
    wmap = F.create_map(
        *[
            F.lit(x)
            for (i, rel), w in sorted(_RERANK_W.items())
            for x in (i * 10 + rel, w)
        ]
    )

    def _ndcg(ranked: DataFrame, out: str) -> DataFrame:
        rel = F.coalesce(F.lit(K + 1) - F.col("exrank"), F.lit(0))
        contrib = F.coalesce(
            F.element_at(wmap, (F.col("rn") * 10 + rel).cast("int")), F.lit(0)
        )
        return (
            ranked.join(exr, ["query_id", "doc_id"], "left")
            .groupBy("query_id")
            .agg((F.sum(contrib) * 10000).cast("bigint").alias("_dcg10k"))
            .select(
                "query_id",
                F.expr(f"_dcg10k div {_RERANK_IDCG}")
                .cast("bigint")
                .alias(out),
            )
        )

    a = _ndcg(rrk, "ndcg_rerank_bp")
    b = _ndcg(frk, "ndcg_rrf_bp")
    return a.join(b, "query_id").select(
        "query_id",
        F.lit(int(wts[0])).cast("bigint").alias("w_bm25"),
        F.lit(int(wts[1])).cast("bigint").alias("w_cos"),
        F.lit(int(wts[2])).cast("bigint").alias("w_len"),
        F.lit(int(wts[3])).cast("bigint").alias("w_bias"),
        "ndcg_rrf_bp",
        "ndcg_rerank_bp",
        (F.col("ndcg_rerank_bp") - F.col("ndcg_rrf_bp"))
        .cast("bigint")
        .alias("uplift_bp"),
    )


@query(
    "tokenizer_incremental_wordpiece",
    oracle=(
        _WP_LEARN_ORACLE.replace(
            "SELECT CAST(1 AS INT) AS merge_rank,",
            "SELECT CAST(2 AS BIGINT) AS state_versions,"
            " CAST(1 AS INT) AS merge_rank,",
        )
        .replace(
            "SELECT CAST(2 AS INT) AS merge_rank,",
            "SELECT CAST(2 AS BIGINT) AS state_versions,"
            " CAST(2 AS INT) AS merge_rank,",
        )
        .replace(
            "SELECT CAST(3 AS INT) AS merge_rank,",
            "SELECT CAST(2 AS BIGINT) AS state_versions,"
            " CAST(3 AS INT) AS merge_rank,",
        )
    ),
    tags=("north-star", "text", "tokenizer", "incremental"),
)
def tokenizer_incremental_wordpiece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental WordPiece re-train — the likelihood-objective twin of
    tokenizer_incremental_refresh: WordPiece training is equally a pure
    function of the (word, freq) histogram, so the SAME mergeable state
    contract applies (seed the even-doc-id half's histogram into a
    TxnTable, fold in the odd half's batch histogram with
    bpe_merge_histograms — word counts are objective-agnostic — and
    re-derive the merges from the refreshed state via
    ``wordpiece_learn(word_types=...)``, vocab-sized work, no corpus
    re-scan).  The oracle replays full-corpus WordPiece training; exact
    equality holds because hist(A) ⊎ hist(B) = hist(A ∪ B).  With BPE,
    WordPiece, and the classifier's warm-start covered, every trained
    artifact family has a verified incremental path."""
    import shutil
    import tempfile
    from pathlib import Path

    from aws_genaric_datapipeline_spark.pipeline.txn import TxnTable

    (documents,) = load(spark, sf_dir, "documents")
    seed = documents.where(F.col("doc_id") % 2 == 0)
    batch = documents.where(F.col("doc_id") % 2 != 0)
    root = (
        Path(tempfile.gettempdir())
        / f"aws_gdp_wp_state_{spark.sparkContext.applicationId}"
    )
    shutil.rmtree(root, ignore_errors=True)
    state = TxnTable(spark, str(root))
    state.overwrite(X.wordpiece_word_types(seed), app_txn_id="wp-seed")
    refreshed = X.bpe_merge_histograms(
        state.read(), X.wordpiece_word_types(batch)
    )
    state.overwrite(refreshed, app_txn_id="wp-refresh")
    merges = X.wordpiece_learn(
        documents, num_merges=_WP_MERGES, word_types=state.read()
    )
    return merges.select(
        F.lit(state.latest_version()).cast("bigint").alias("state_versions"),
        "merge_rank",
        "left_sym",
        "right_sym",
        "pair_count",
        "score_e12",
    )
