"""North-star operator queries: dedup, similarity search, text analysis,
multimodal plumbing (SURVEY.md §2b bottom rows + BASELINE.json north_star).

Every query here is oracle-checked — including the sketch paths: the
hash families were chosen engine-portable (universal-hash minhash over a
31-bit base, splitmix64 hyperplane literals, integer-SQL k-means seeding,
a mod-2^64 polynomial rolling hash, md5-derived simhash bits), so DuckDB
replays candidate generation itself, not just the verification stage;
recall/guarantee contracts are additionally asserted in
tests/test_operators.py and the *_guarantees queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.operators import dedup as D
from aws_genaric_datapipeline_spark.operators import multimodal as M
from aws_genaric_datapipeline_spark.operators import similarity as S
from aws_genaric_datapipeline_spark.operators import text as X
from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load

def _md5_bucket10(col: F.Column) -> F.Column:
    """Deterministic 10% sub-corpus predicate (md5 bucket 0 of 10) — the
    shared sampler for the audit-tier ground truths.  MUST stay the
    byte-for-byte twin of _DUCK_MD5_BUCKET10: a one-character drift
    silently changes which sub-corpus a contract audits."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
            "bigint"
        )
        % 10
        == 0
    )


# DuckDB twin of _md5_bucket10 (format with col=<id column expression>)
_DUCK_MD5_BUCKET10 = (
    "CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8)) "
    "AS BIGINT) % 10 = 0"
)


def _ivf_oracle_sql(nprobe: int, num_cells: int = 16, k: int = 5, dim: int = 64) -> str:
    """Oracle SQL replaying the ENTIRE IVF pipeline (similarity.py
    ivf_train_centroids + _assign_cells + top-k re-rank) in DuckDB:

      seeds    — the num_cells vectors with the smallest Knuth scramble
                 ((id mod 2^31)·2654435761 mod 2^32, tie on id), unit-
                 normalized, cell_id = seed rank (exactly the engine's
                 deterministic seeding, now integer-SQL-expressible);
      assign0  — every unit vector to its max-dot seed (tie: lower cell);
      cunit    — one Lloyd step: per-cell element-wise mean (positional
                 unnest + list(... ORDER BY pos)), re-normalized;
      assign1  — corpus re-assigned to the trained centroids (nprobe=1);
      qprobe   — query vectors 1..5 probe their nprobe nearest cells;
      scored   — exact cosine re-rank inside probed cells, top-k window.

    Float caveat: both engines compute the same double arithmetic in
    different summation orders (~1e-16); a mismatch requires a Voronoi
    boundary or a round-to-4 boundary within that noise — the same
    negligible class as every other float oracle here."""
    scr = "((vec_id % 2147483648) * 2654435761) % 4294967296"
    return f"""
        WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        unit AS (
            SELECT vec_id,
                   CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v
                        ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                   END AS u
            FROM base
        ),
        seeds AS (
            SELECT u AS su, cell_id FROM (
                SELECT u, row_number() OVER (ORDER BY {scr}, vec_id) - 1 AS cell_id
                FROM unit)
            WHERE cell_id < {num_cells}
        ),
        assign0 AS (
            SELECT vec_id, u, cell_id FROM (
                SELECT un.vec_id, un.u, s.cell_id,
                       row_number() OVER (PARTITION BY un.vec_id
                           ORDER BY list_dot_product(un.u, s.su) DESC, s.cell_id) AS rn
                FROM unit un CROSS JOIN seeds s)
            WHERE rn = 1
        ),
        cmeans AS (
            SELECT cell_id, g.pos AS pos, avg(u[g.pos]) AS m
            FROM assign0, UNNEST(generate_series(1, {dim})) AS g(pos)
            GROUP BY 1, 2
        ),
        cvecs AS (SELECT cell_id, list(m ORDER BY pos) AS cv FROM cmeans GROUP BY cell_id),
        cunit AS (
            SELECT cell_id,
                   CASE WHEN sqrt(list_dot_product(cv, cv)) = 0 THEN cv
                        ELSE list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
                   END AS cu
            FROM cvecs
        ),
        assign1 AS (
            SELECT vec_id, u, cell_id FROM (
                SELECT un.vec_id, un.u, c.cell_id,
                       row_number() OVER (PARTITION BY un.vec_id
                           ORDER BY list_dot_product(un.u, c.cu) DESC, c.cell_id) AS rn
                FROM unit un CROSS JOIN cunit c)
            WHERE rn = 1
        ),
        qprobe AS (
            SELECT vec_id AS query_id, u AS qu, cell_id FROM (
                SELECT un.vec_id, un.u, c.cell_id,
                       row_number() OVER (PARTITION BY un.vec_id
                           ORDER BY list_dot_product(un.u, c.cu) DESC, c.cell_id) AS rn
                FROM unit un CROSS JOIN cunit c
                WHERE un.vec_id IN (1, 2, 3, 4, 5))
            WHERE rn <= {nprobe}
        ),
        scored AS (
            SELECT DISTINCT query_id, n.vec_id AS neighbor_id,
                   round(list_dot_product(q.qu, n.u), 4) AS cosine_sim
            FROM qprobe q
            JOIN assign1 n ON n.cell_id = q.cell_id AND n.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, cosine_sim
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS rn FROM scored)
        WHERE rn <= {k}
    """


def _lsh_buckets_cte(num_planes: int, num_tables: int, dim: int = 64) -> str:
    """UNION ALL branches computing every (table, hyperplane-sign bucket)
    row from LITERAL plane constants — the same deterministic splitmix64
    family (similarity._hyperplane) the engine uses, inlined into SQL.
    The engine buckets unit vectors; sign(dot(unit, h)) == sign(dot(raw, h))
    (positive scaling; zero-norm vectors yield dot 0 either way), so the
    oracle buckets the raw doubles.  Expects a CTE ``base(vec_id, v)``."""
    from aws_genaric_datapipeline_spark.operators.similarity import _hyperplane

    branches = []
    for t in range(num_tables):
        bits = []
        for p in range(num_planes):
            lit = "[" + ", ".join(repr(x) for x in _hyperplane(dim, t * num_planes + p)) + "]"
            bits.append(f"(CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << p} ELSE 0 END)")
        branches.append(f"SELECT vec_id, v, {t} AS tbl, " + " + ".join(bits) + " AS bucket FROM base")
    return " UNION ALL ".join(branches)


def _lsh_buckets_adaptive_cte(
    num_tables: int,
    target_bucket_size: int,
    min_planes: int = 3,
    max_planes: int = 8,
    dim: int = 64,
    max_bucket_width: int | None = None,
    count_where: str = "",
) -> str:
    """CTE chain replaying the CORPUS-ADAPTIVE bucket stage
    (similarity.adaptive_num_planes + lsh_candidate_pairs): derive the
    plane count from COUNT(*) with the same clamp(ceil(log2(N/target)))
    formula, compute every table's FULL max_planes-bit bucket from the
    fixed-stride literals (plane p of table t = global plane
    t·max_planes + p — identical constants to the engine's stride
    allocation), mask to the derived low np bits (bucket % 2^np ==
    bucketing with the first np planes), and optionally apply the
    bucket-width skew guard.  Emits CTEs ending in ``buck(vec_id, v, tbl,
    bucket)``; splice after a CTE ``base(vec_id, v)``."""
    from aws_genaric_datapipeline_spark.operators.similarity import _hyperplane

    branches = []
    for t in range(num_tables):
        bits = []
        for p in range(max_planes):
            lit = "[" + ", ".join(repr(x) for x in _hyperplane(dim, t * max_planes + p)) + "]"
            bits.append(f"(CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << p} ELSE 0 END)")
        branches.append(
            f"SELECT vec_id, v, {t} AS tbl, " + " + ".join(bits) + " AS fullbucket FROM base"
        )
    raw = " UNION ALL ".join(branches)
    ctes = f"""
        nplanes AS (
            SELECT LEAST({max_planes}, GREATEST({min_planes},
                CAST(CEIL(LOG2(GREATEST(COUNT(*), 1)
                     / CAST({target_bucket_size} AS DOUBLE))) AS INT))) AS np
            FROM base {count_where}
        ),
        rawbuck AS ({raw}),
        maskbuck AS (
            SELECT vec_id, v, tbl,
                   fullbucket % CAST(POW(2, np) AS BIGINT) AS bucket
            FROM rawbuck, nplanes
        )"""
    if max_bucket_width is None:
        return ctes + ",\n        buck AS (SELECT * FROM maskbuck)"
    return ctes + f""",
        bwidth AS (
            SELECT tbl, bucket, COUNT(*) AS w FROM maskbuck GROUP BY 1, 2
        ),
        buck AS (
            SELECT m.vec_id, m.v, m.tbl, m.bucket
            FROM maskbuck m JOIN bwidth USING (tbl, bucket)
            WHERE bwidth.w <= {max_bucket_width}
        )"""


# DuckDB fragments shared by several oracles.
_DUCK_TOKS = "string_split_regex(trim(text), '\\s+')"
_DUCK_TRIGRAMS = (
    "list_transform(range(1, len({w}) - 1), "
    "i -> array_to_string(list_slice({w}, i, i + 2), ' '))"
).format(w=_DUCK_TOKS)


@query(
    "text_token_stats",
    oracle=f"""
        SELECT doc_id,
               CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_tokens,
               CAST(list_sum(list_transform({_DUCK_TOKS},
                    w -> CAST(ceil(length(w) / 4.0) AS BIGINT))) AS BIGINT) AS n_tokens_bpe,
               CAST(length(trim(text)) AS BIGINT) AS n_chars_trim
        FROM documents
    """,
    tags=("north-star", "text"),
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token accounting: whitespace tokens + BPE-ish sub-word estimate."""
    (documents,) = load(spark, sf_dir, "documents")
    t = F.col("text")
    return documents.select(
        "doc_id",
        X.token_count(t).cast("bigint").alias("n_tokens"),
        X.bpe_ish_token_count(t).alias("n_tokens_bpe"),
        F.length(F.trim(t)).cast("bigint").alias("n_chars_trim"),
    )


@query(
    "text_quality_scores",
    oracle=f"""
        WITH base AS (
            SELECT doc_id,
                   length(trim(text)) AS n_chars,
                   len({_DUCK_TOKS}) AS n_toks,
                   length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g')) AS n_alpha
            FROM documents
        )
        SELECT doc_id,
               CAST(4 * least(n_chars * 20, 10000)
                  + 3 * (CASE WHEN n_toks > 0
                              AND n_chars - (n_toks - 1) >= 2 * n_toks
                              AND n_chars - (n_toks - 1) <= 12 * n_toks
                         THEN 10000 ELSE 0 END)
                  + 3 * (CASE WHEN n_chars = 0 THEN 0
                         ELSE (n_alpha * 10000) // n_chars END) AS BIGINT) AS quality_bp
        FROM base
    """,
    tags=("north-star", "text"),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface-statistics quality score (length/word-shape/alpha-ratio) in
    exact integer basis points — bit-reproducible across engines, no float
    rounding boundaries (the double-valued quality_score drifted on docs
    landing exactly on a rounding boundary)."""
    (documents,) = load(spark, sf_dir, "documents")
    return documents.select("doc_id", X.quality_score_bp(F.col("text")).alias("quality_bp"))


def _duck_ratio(markers: tuple[str, ...]) -> str:
    lst = "[" + ", ".join(f"'{m}'" for m in markers) + "]"
    return (
        f"CASE WHEN len({_DUCK_TOKS}) = 0 THEN 0.0 "
        f"ELSE len(list_filter({_DUCK_TOKS}, t -> list_contains({lst}, lower(t)))) "
        f"/ CAST(len({_DUCK_TOKS}) AS DOUBLE) END"
    )


def _duck_lang_fallback() -> str:
    """The marker-stopword heuristic as one CASE expression over `text` —
    the fallback tier for documents too short to carry a trigram."""
    s = {k: _duck_ratio(X.LANG_MARKERS[k]) for k in ("de", "en", "es", "fr")}
    g = f"greatest({s['de']}, {s['en']}, {s['es']}, {s['fr']})"
    return (
        f"CASE WHEN {g} = 0 THEN 'und' "
        f"WHEN {s['de']} = {g} THEN 'de' "
        f"WHEN {s['en']} = {g} THEN 'en' "
        f"WHEN {s['es']} = {g} THEN 'es' ELSE 'fr' END"
    )


# Shared trigram-profile CTE chain ending in pred(doc_id, lang, source,
# lang_pred) — the full train→score→argmax replay of
# operators/text.py detect_language_trigram, integer-quantized log-probs
# so the argmax is exact cross-engine.
_LANG_TRIGRAM_CTES = f"""
    WITH dd AS (
        SELECT doc_id, lang, source, text, lower(trim(text)) AS t
        FROM documents
    ),
    tg AS (
        SELECT doc_id, lang, substr(t, CAST(u.i AS INT), 3) AS gram
        FROM dd, UNNEST(range(1, length(t) - 1)) AS u(i)
        WHERE length(t) >= 3
    ),
    dg AS (SELECT doc_id, gram, count(*) AS c FROM tg GROUP BY 1, 2),
    nd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM dg GROUP BY 1),
    cl AS (
        SELECT lang, gram, count(*) AS cg FROM tg
        WHERE lang IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT lang, CAST(sum(cg) AS BIGINT) AS tot FROM cl GROUP BY 1),
    vv AS (SELECT count(DISTINCT gram) AS v FROM tg),
    prof AS (
        SELECT cl.lang, cl.gram,
               CAST(floor(1e6 * ln(CAST(cl.cg + 1 AS DOUBLE)
                    / CAST(tot.tot + vv.v AS DOUBLE))) AS BIGINT) AS lpq
        FROM cl JOIN tot USING (lang) CROSS JOIN vv
    ),
    unseen AS (
        SELECT lang,
               CAST(floor(1e6 * ln(1.0
                    / CAST(tot + (SELECT v FROM vv) AS DOUBLE))) AS BIGINT)
                   AS uq
        FROM tot
    ),
    mtch AS (
        SELECT dg.doc_id, p.lang, sum(dg.c * (p.lpq - u.uq)) AS delta
        FROM dg JOIN prof p USING (gram) JOIN unseen u ON u.lang = p.lang
        GROUP BY 1, 2
    ),
    sc AS (
        SELECT nd.doc_id, u.lang, nd.n * u.uq + coalesce(m.delta, 0) AS sq
        FROM nd CROSS JOIN unseen u
        LEFT JOIN mtch m ON m.doc_id = nd.doc_id AND m.lang = u.lang
    ),
    tri AS (
        SELECT doc_id, lang AS tri_pred FROM (
            SELECT doc_id, lang,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY sq DESC, lang) AS rn
            FROM sc
        ) WHERE rn = 1
    ),
    pred AS (
        SELECT dd.doc_id, dd.lang, dd.source,
               coalesce(tri.tri_pred, {_duck_lang_fallback()}) AS lang_pred
        FROM dd LEFT JOIN tri USING (doc_id)
    )
"""


@query(
    "text_lang_detect",
    oracle=_LANG_TRIGRAM_CTES
    + """
        SELECT lang, lang_pred, count(*) AS doc_count
        FROM pred GROUP BY 1, 2
    """,
    tags=("north-star", "text"),
)
def text_lang_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion counts: char-trigram naive-Bayes profiles
    trained from the labeled corpus (operators/text.py
    detect_language_trigram — covers ALL labeled languages, including
    'zh' which the marker heuristic cannot name), marker-stopword
    heuristic as the fallback tier for trigram-less docs.  The oracle
    replays training, scoring, and the quantized argmax in full."""
    (documents,) = load(spark, sf_dir, "documents")
    preds = X.detect_language_trigram(documents)
    return (
        documents.select("doc_id", "lang")
        .join(preds, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("doc_count"))
    )


@query(
    "report_lang_confusion_by_source",
    oracle=_LANG_TRIGRAM_CTES
    + """
        SELECT source, lang, lang_pred, count(*) AS doc_count,
               CAST(sum(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct
        FROM pred GROUP BY 1, 2, 3
    """,
    tags=("north-star", "text", "reporting"),
)
def report_lang_confusion_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source language-ID confusion report: (source, labeled lang,
    predicted lang, doc_count, n_correct) using the trained trigram
    profiles — the drill-down a curation pipeline reads to find the
    source whose documents mislabel or defeat the classifier."""
    (documents,) = load(spark, sf_dir, "documents")
    preds = X.detect_language_trigram(documents)
    return (
        documents.select("doc_id", "source", "lang")
        .join(preds, "doc_id")
        .groupBy("source", "lang", "lang_pred")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.sum(
                F.when(F.col("lang") == F.col("lang_pred"), 1).otherwise(0)
            ).alias("n_correct"),
        )
    )


@query(
    "text_fingerprint_dedup",
    oracle="""
        SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
               min(doc_id) AS doc_id,
               count(*) AS dup_count
        FROM documents
        GROUP BY 1
    """,
    tags=("north-star", "dedup"),
)
def text_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup via md5 fingerprint of normalized text
    (keep-min-id survivor policy, engine-portable hash)."""
    (documents,) = load(spark, sf_dir, "documents")
    return D.dedup_by_fingerprint(documents)


@query(
    "dedup_jaccard_trigram",
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
        )
        SELECT id_a, id_b,
               round(n_inter / CAST(sa.ss + sb.ss - n_inter AS DOUBLE), 4) AS jaccard
        FROM inter
        JOIN sizes sa ON inter.id_a = sa.did
        JOIN sizes sb ON inter.id_b = sb.did
        WHERE n_inter / CAST(sa.ss + sb.ss - n_inter AS DOUBLE) >= 0.8
    """,
    tags=("north-star", "dedup"),
)
def dedup_jaccard_trigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram-shingle Jaccard near-duplicate pairs (≥0.8) via
    inverted-index self-join — the ground truth the sketch-based paths
    (MinHash/SimHash) are measured against."""
    (documents,) = load(spark, sf_dir, "documents")
    return D.jaccard_pairs(documents, n=3, threshold=0.8)


# Symmetrized edge list of the trigram-Jaccard (≥0.5) near-dup graph —
# the shared candidate/verify replay feeding the CC-closure oracle and the
# k-core peel oracle.
_DUCK_NEARDUP_EDGE_CTES = f"""sh AS (
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
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON inter.id_a = sa.did
            JOIN sizes sb ON inter.id_b = sb.did
            WHERE round(n_inter / CAST(sa.ss + sb.ss - n_inter AS DOUBLE), 4) >= 0.5
        ),
        edges AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION ALL
            SELECT id_b, id_a FROM pairs
        )"""

# Full-recompute closure over the near-dup graph — shared by
# dedup_connected_clusters (one-shot CC) and graph_incremental_components
# (state + batch merge): both must land on the SAME fixpoint, which is
# exactly what sharing the oracle asserts.
_CC_CLUSTERS_ORACLE = f"""
        WITH RECURSIVE {_DUCK_NEARDUP_EDGE_CTES},
        reach(node, label) AS (
            SELECT s, s FROM edges
            UNION
            SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
        ),
        comp AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node)
        SELECT CAST(node AS BIGINT) AS doc_id,
               CAST(cluster_id AS BIGINT) AS cluster_id,
               CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
        FROM comp
    """


@query(
    "dedup_connected_clusters",
    oracle=_CC_CLUSTERS_ORACLE,
    tags=("north-star", "dedup", "graph"),
)
def dedup_connected_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup PAIRS → duplicate CLUSTERS: exact trigram-Jaccard edges
    (≥0.5) closed transitively by distributed connected components
    (operators/graph.py — hash-min + pointer jumping, O(log diameter)
    rounds).  ``cluster_id`` = min doc id = the canonical survivor; the
    DuckDB oracle recomputes the closure with a recursive CTE, so the
    iterative distributed algorithm is verified against a declarative
    fixpoint."""
    from aws_genaric_datapipeline_spark.operators.graph import (
        dedup_cluster_assignments,
    )

    (documents,) = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(documents, n=3, threshold=0.5, hash_tokens=True)
    return dedup_cluster_assignments(pairs).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("cluster_id").cast("bigint").alias("cluster_id"),
        "cluster_size",
    )


@query(
    "graph_components_star",
    oracle=_CC_CLUSTERS_ORACLE,
    tags=("north-star", "dedup", "graph"),
)
def graph_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME near-dup clustering as dedup_connected_clusters, computed
    by the hub-safe LARGE-STAR/SMALL-STAR algorithm
    (operators/graph.py connected_components_star) instead of hash-min —
    sharing the recursive-CTE closure oracle proves both algorithms
    reach the identical fixpoint on real data.  Star alternation is the
    100 TB fallback for hub-heavy edge sets (a shingle shared by millions
    of documents), where the static-edge hash-min join concentrates one
    hub's neighborhood into a single task every round; star rewrites
    shrink the edge list toward the final star forest instead.  Planted-
    hub equivalence + round-count bounds live in
    tests/test_operators.py::TestStarComponents."""
    from pyspark.sql import Window

    from aws_genaric_datapipeline_spark.operators.graph import (
        connected_components_star,
    )

    (documents,) = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(documents, n=3, threshold=0.5, hash_tokens=True)
    comp = connected_components_star(pairs, src="id_a", dst="id_b")
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("cluster_id"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
    )


def _kcore_oracle_sql(k: int = 2, rounds: int = 10) -> str:
    """Unrolled-peel replay of k-core over the shared near-dup edge CTEs:
    round i recomputes degrees within the round-(i-1) survivor set and
    drops nodes under k — the same declarative-fixpoint trick the
    label-propagation and PageRank oracles use (recursive CTEs cannot
    delete, so the peel is unrolled; the mirror test fails loudly if the
    corpus ever needs more rounds than unrolled, because the last round's
    degrees would still change)."""
    # AS MATERIALIZED is load-bearing: each round references the previous
    # one three times (edge filter via two survivor joins + the degree
    # count), so inlined CTEs expand 3^rounds-fold — enough to exhaust
    # file handles re-opening the source parquet before round 10.
    parts = [
        "e0 AS MATERIALIZED (SELECT s, d FROM edges)",
        "d0 AS MATERIALIZED (SELECT s AS node, count(*) AS deg FROM e0 GROUP BY s)",
        f"s0 AS MATERIALIZED (SELECT node FROM d0 WHERE deg >= {k})",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"e{i} AS MATERIALIZED (SELECT e.s, e.d FROM e{i - 1} e "
            f"JOIN s{i - 1} a ON e.s = a.node "
            f"JOIN s{i - 1} b ON e.d = b.node)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED "
            f"(SELECT s AS node, count(*) AS deg FROM e{i} GROUP BY s)"
        )
        parts.append(
            f"s{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= {k})"
        )
    chain = ",\n        ".join(parts)
    return f"""
        WITH {_DUCK_NEARDUP_EDGE_CTES},
        {chain}
        SELECT CAST(node AS BIGINT) AS doc_id,
               CAST(deg AS BIGINT) AS core_degree
        FROM d{rounds} WHERE deg >= {k}
    """


@query(
    "graph_kcore_boilerplate",
    oracle=_kcore_oracle_sql(k=2, rounds=10),
    tags=("north-star", "dedup", "graph"),
)
def graph_kcore_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the trigram-Jaccard near-dup graph (operators/graph.py
    k_core): iterative peel keeps only documents that near-dup ≥ 2 OTHER
    surviving documents — the dense boilerplate families a curation
    pipeline deletes aggressively, separated from incidental pairwise
    chains (which peel away and get keep-best handling instead).  Returns
    (doc_id, core_degree) for core members; the oracle replays the peel
    round by round over the same replayed edge set."""
    from aws_genaric_datapipeline_spark.operators.graph import k_core

    (documents,) = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(documents, n=3, threshold=0.5, hash_tokens=True)
    return k_core(pairs, src="id_a", dst="id_b", k=2).select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("core_degree").cast("bigint").alias("core_degree"),
    )


@query(
    "sample_split_leakage_safe",
    oracle=f"""
        WITH RECURSIVE {_DUCK_NEARDUP_EDGE_CTES},
        reach(node, label) AS (
            SELECT s, s FROM edges
            UNION
            SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
        ),
        comp AS (SELECT node, min(label) AS cluster_id FROM reach GROUP BY node),
        assign AS (
            SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
        ),
        sp AS (
            SELECT doc_id, cluster_id,
                   CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'valid'
                        ELSE 'test' END AS split
            FROM (SELECT *, ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)),
                             1, 8))::BIGINT % 10 AS b
                  FROM assign)
        ),
        leak AS (
            SELECT count(*) AS leaked FROM pairs p
            JOIN sp sa ON p.id_a = sa.doc_id
            JOIN sp sb ON p.id_b = sb.doc_id
            WHERE sa.split <> sb.split
        )
        SELECT split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
               CAST(leaked AS BIGINT) AS leaked_pairs
        FROM sp CROSS JOIN leak
        GROUP BY split, leaked
    """,
    tags=("north-star", "curation", "sampling", "dedup"),
)
def sample_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/valid/test split: near-duplicate CLUSTERS are
    the assignment unit, not documents — every trigram-Jaccard (≥ 0.5)
    cluster lands atomically in one split via an engine-portable md5
    bucket of its cluster id (8/1/1), so no near-dup pair can straddle
    train and eval (the contamination mode a doc-level random split
    ships silently: an eval doc whose near-twin was trained on).  The
    emitted ``leaked_pairs`` column IS the audit — provably 0 by
    construction, and the oracle recomputes it from the raw pair set,
    so a regression in clustering or hashing surfaces as a nonzero leak
    or a split-count mismatch, not a silent quality drift.

    Scale: one near-dup edge build (shared shape with the dedup family)
    + the CC closure over pairs only; the corpus-sized work is one
    left join of doc ids against the component frame and a 3-group
    aggregate.  Singleton docs skip the graph entirely (cluster_id =
    doc_id)."""
    from aws_genaric_datapipeline_spark.operators.graph import (
        connected_components,
    )

    (documents,) = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(
        documents, n=3, threshold=0.5, hash_tokens=True
    ).localCheckpoint(eager=True)
    comp = connected_components(pairs, src="id_a", dst="id_b")
    assign = (
        documents.select("doc_id")
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 10
    )
    sp = assign.withColumn(
        "split",
        F.when(bucket < 8, F.lit("train"))
        .when(bucket == 8, F.lit("valid"))
        .otherwise(F.lit("test")),
    ).localCheckpoint(eager=True)  # reused by the aggregate AND the leak audit
    leak = (
        pairs.join(
            sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .where(F.col("sa") != F.col("sb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("leaked_pairs"))
    )
    return (
        sp.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("cluster_id").cast("bigint").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(leak))
        .select("split", "n_docs", "n_clusters", "leaked_pairs")
    )


@query(
    "graph_incremental_components",
    oracle=_CC_CLUSTERS_ORACLE,
    tags=("north-star", "dedup", "graph", "incremental"),
)
def graph_incremental_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL connected components (operators/graph.py
    incremental_components): the duplicate-cluster state over the standing
    corpus (doc_id % 5 != 0) absorbs a new-edge batch (every pair touching
    a batch doc) WITHOUT re-closing untouched components — completing the
    incremental family (minhash / semantic / simhash gates) at the graph
    layer, where a 100 TB pipeline otherwise re-runs full CC over the
    entire edge history per ingest batch.

    The standing state passes through broadcast semi/anti splits with zero
    shuffle; only new edges plus members of touched components enter the
    hash-min loop.  The oracle recomputes the FULL closure over all edges
    (shared verbatim with dedup_connected_clusters), so the driver checks
    the maintenance identity  merge(CC(old), Δ) == CC(old ∪ Δ)  on real
    data, cluster sizes included."""
    from pyspark.sql import Window

    from aws_genaric_datapipeline_spark.operators.graph import (
        connected_components,
        incremental_components,
    )

    (documents,) = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(
        documents, n=3, threshold=0.5, hash_tokens=True
    ).localCheckpoint(eager=True)
    a_batch = F.col("id_a") % 5 == 0
    b_batch = F.col("id_b") % 5 == 0
    state = connected_components(
        pairs.where(~a_batch & ~b_batch), src="id_a", dst="id_b"
    )
    merged = incremental_components(
        state, pairs.where(a_batch | b_batch), src="id_a", dst="id_b"
    )
    w = Window.partitionBy("component")
    return merged.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("cluster_id"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
    )


def _subword_cte_body() -> str:
    """Shared CTE chain replaying greedy longest-match subword
    tokenization down to ``per_doc`` — used by text_subword_tokenize's
    oracle and the per-source OOV report so the two can never drift."""
    vals = ", ".join(f"('{t}')" for t in X.SUBWORD_VOCAB)
    return f"""vocab(tok) AS (VALUES {vals}),
        words AS (
            SELECT doc_id, CAST(t.i AS INT) AS widx, l[CAST(t.i AS INT)] AS word
            -- explicit class, not \\s: RE2 \\s excludes \\x0b while the
            -- engine's Python regex includes it; this class matches both
            FROM (SELECT doc_id, string_split_regex(lower(text), '[ \\t\\n\\r\\f\\v]+') AS l FROM documents),
                 UNNEST(range(1, len(l) + 1)) AS t(i)
            WHERE l[CAST(t.i AS INT)] <> ''
        ),
        dw AS (SELECT DISTINCT word FROM words),
        pos AS (
            SELECT word, CAST(t.i AS INT) AS p
            FROM dw, UNNEST(range(1, length(word) + 1)) AS t(i)
        ),
        bm AS (
            SELECT p.word, p.p, coalesce(max(length(v.tok)), 0) AS bl
            FROM pos p LEFT JOIN vocab v
              ON length(v.tok) <= length(p.word) - p.p + 1
             AND substr(p.word, p.p, length(v.tok)) = v.tok
            GROUP BY 1, 2
        ),
        seg AS (
            SELECT word, 1 AS p, '' AS toks FROM dw
            UNION ALL
            SELECT s.word,
                   s.p + CASE WHEN b.bl = 0 THEN 1 ELSE b.bl END,
                   s.toks || CASE WHEN s.toks = '' THEN '' ELSE ' ' END ||
                       CASE WHEN b.bl = 0 THEN '<unk>'
                            ELSE substr(s.word, s.p, b.bl) END
            FROM seg s JOIN bm b ON b.word = s.word AND b.p = s.p
            WHERE s.p <= length(s.word)
        ),
        done AS (
            SELECT word, toks,
                   CAST(length(toks) - length(replace(toks, ' ', '')) + 1 AS BIGINT) AS ntoks
            FROM seg WHERE p > length(word)
        ),
        per_doc AS (
            SELECT w.doc_id AS did,
                   CAST(count(*) AS BIGINT) AS n_words,
                   CAST(sum(d.ntoks) AS BIGINT) AS n_subwords,
                   string_agg(d.toks, ' ' ORDER BY w.widx) AS stream
            FROM words w JOIN done d ON d.word = w.word
            GROUP BY 1
        )"""


def _subword_oracle_sql() -> str:
    """DuckDB replay of greedy longest-match subword tokenization
    (operators/text.py subword_tokenize): the literal SUBWORD_VOCAB as a
    VALUES table, a precomputed best-match-length table per (distinct
    word, position), a recursive pointer chase that emits the maximal
    munch segmentation (<unk> on no match), and per-document reassembly
    in word order.  md5 of the full subword stream pins the entire
    segmentation, not just counts."""
    return f"""
        WITH RECURSIVE {_subword_cte_body()}
        SELECT doc_id,
               coalesce(p.n_words, 0) AS n_words,
               coalesce(p.n_subwords, 0) AS n_subwords,
               md5(coalesce(p.stream, '')) AS stream_md5
        FROM documents LEFT JOIN per_doc p ON p.did = documents.doc_id
    """


@query(
    "text_subword_tokenize",
    oracle=_subword_oracle_sql(),
    tags=("north-star", "text"),
)
def text_subword_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword tokenization — the deterministic BPE/WordPiece APPLY pass a
    training pipeline runs to count real tokens (vs the regex estimate in
    text_token_stats): greedy longest-match against the fixed
    SUBWORD_VOCAB, <unk> for out-of-vocabulary characters.  md5 of the
    full subword stream is oracle-checked, so the segmentation itself —
    maximal munch order included — is verified bit-for-bit against the
    DuckDB recursive replay (verified sf0.001 + sf0.01)."""
    (documents,) = load(spark, sf_dir, "documents")
    return X.subword_tokenize(documents).select(
        "doc_id",
        "n_words",
        "n_subwords",
        F.md5("subword_stream").alias("stream_md5"),
    )


@query(
    "report_tokenizer_oov",
    oracle=f"""
        WITH RECURSIVE {_subword_cte_body()}
        SELECT d.source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(coalesce(p.n_subwords, 0)) AS BIGINT) AS n_subwords,
               CAST(sum(coalesce((length(p.stream)
                        - length(replace(p.stream, '<unk>', ''))) // 5, 0))
                    AS BIGINT) AS n_unk,
               CAST(CASE WHEN sum(coalesce(p.n_subwords, 0)) = 0 THEN 0
                    ELSE sum(coalesce((length(p.stream)
                         - length(replace(p.stream, '<unk>', ''))) // 5, 0))
                         * 10000 // sum(coalesce(p.n_subwords, 0)) END
                    AS BIGINT) AS oov_bp
        FROM documents d LEFT JOIN per_doc p ON p.did = d.doc_id
        GROUP BY d.source
    """,
    tags=("north-star", "text", "tokenizer", "report"),
)
def report_tokenizer_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary-coverage report per source: the fraction of
    subwords that fall out of SUBWORD_VOCAB (<unk> emissions, basis
    points) — the go/no-go check before committing a tokenizer to a new
    corpus slice (a source whose OOV rate spikes will waste its token
    budget on <unk> and train nothing).  Shares the greedy
    longest-match segmentation (and its recursive-replay oracle CTEs)
    with text_subword_tokenize verbatim, and counts <unk> by the same
    integer string arithmetic in both engines.

    Scale: the segmentation pass is the same Arrow-batched map-side UDF
    (broadcast vocab, per-batch word memo); the report adds one
    source-grain aggregate."""
    (documents,) = load(spark, sf_dir, "documents")
    seg = X.subword_tokenize(documents)
    unk = (
        (F.length("subword_stream")
         - F.length(F.replace(F.col("subword_stream"), F.lit("<unk>"), F.lit(""))))
        / F.lit(5)
    ).cast("bigint")
    per_doc = seg.select("doc_id", "n_subwords", unk.alias("n_unk"))
    joined = documents.select("doc_id", "source").join(per_doc, "doc_id", "left")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.coalesce("n_subwords", F.lit(0))).cast("bigint").alias("n_subwords"),
        F.sum(F.coalesce("n_unk", F.lit(0))).cast("bigint").alias("n_unk"),
        F.expr(
            "CASE WHEN sum(coalesce(n_subwords, 0)) = 0 THEN 0 "
            "ELSE sum(coalesce(n_unk, 0)) * 10000 div sum(coalesce(n_subwords, 0)) END"
        )
        .cast("bigint")
        .alias("oov_bp"),
    )


def _minhash_replay_oracle(num_hashes: int = 16, bands: int = 8, threshold: float = 0.8) -> str:
    """DuckDB replay of the ENTIRE MinHash-LSH pipeline — shingle-set
    collapse, md5-31-bit base hash, the (a_i·h+b_i) mod p signature mins,
    md5-60-bit band keys, the band self-join, exact verification on
    representatives, and member expansion — bit-for-bit the computation in
    operators/dedup.py:minhash_lsh_pairs.  No recall assumption anywhere:
    the oracle finds exactly the pairs the engine's banding finds."""
    r = num_hashes // bands
    sig_mins = ", ".join(
        f"min((h31 * {D._MH_A[i]} + {D._MH_B[i]}) % {D._MH_P}) AS s{i}"
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT did, {b} AS band, ('0x' || substr(md5("
        + " || ',' || ".join(f"CAST(s{b * r + j} AS VARCHAR)" for j in range(r))
        + "), 1, 15))::BIGINT AS bh FROM sig"
        for b in range(bands)
    )
    return f"""
        WITH docs AS (
            SELECT doc_id AS did, list_sort(list_distinct({_DUCK_TRIGRAMS})) AS sh
            FROM documents
            WHERE len({_DUCK_TRIGRAMS}) > 0
        ),
        grp AS (SELECT did, sh, min(did) OVER (PARTITION BY sh) AS gid FROM docs),
        reps AS (SELECT did, sh FROM grp WHERE did = gid),
        tok AS (SELECT did, t.tok FROM reps, UNNEST(sh) AS t(tok)),
        h AS (SELECT did, ('0x' || substr(md5(tok), 1, 8))::BIGINT // 2 AS h31 FROM tok),
        sig AS (SELECT did, {sig_mins} FROM h GROUP BY did),
        banded AS ({band_selects}),
        cand AS (
            SELECT DISTINCT x.did AS id_a, y.did AS id_b
            FROM banded x JOIN banded y
              ON x.band = y.band AND x.bh = y.bh AND x.did < y.did
        ),
        ver AS (
            SELECT id_a, id_b,
                   round(len(list_intersect(a.sh, b.sh)) /
                         CAST(len(a.sh) + len(b.sh)
                              - len(list_intersect(a.sh, b.sh)) AS DOUBLE),
                         4) AS jaccard
            FROM cand
            JOIN reps a ON a.did = cand.id_a
            JOIN reps b ON b.did = cand.id_b
        ),
        keep AS (SELECT * FROM ver WHERE jaccard >= {threshold}),
        mem AS (SELECT did, gid FROM grp),
        cross_pairs AS (
            SELECT least(ma.did, mb.did) AS id_a,
                   greatest(ma.did, mb.did) AS id_b, v.jaccard
            FROM keep v
            JOIN mem ma ON ma.gid = v.id_a
            JOIN mem mb ON mb.gid = v.id_b
        ),
        intra AS (
            SELECT a.did AS id_a, b.did AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
            FROM mem a JOIN mem b ON a.gid = b.gid AND a.did < b.did
        )
        SELECT id_a, id_b, jaccard FROM cross_pairs
        UNION ALL
        SELECT id_a, id_b, jaccard FROM intra
    """


@query(
    "dedup_minhash_lsh",
    oracle=_minhash_replay_oracle(num_hashes=16, bands=8, threshold=0.8),
    tags=("north-star", "dedup"),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + 8-band LSH candidates, exact-Jaccard-verified ≥0.8.

    Oracle = a full DuckDB replay of the pipeline itself (see
    _minhash_replay_oracle): the base shingle hash is the top 31 bits of
    md5's first word and band keys are md5-derived 60-bit values — both
    ENGINE-PORTABLE, so the oracle reproduces signatures, band buckets,
    candidates, verification, and member expansion bit-for-bit.  This
    removes the earlier exact-pair-set oracle's false-failure mode (a
    regenerated corpus where 16-hash/8-band banding legitimately misses a
    true J ≈ 0.8 pair would have flipped the row red with correct code);
    recall quality remains separately pinned by
    tests/test_operators.py::test_minhash_lsh_recall_vs_exact and the lsh
    ⊆ exact subset contract."""
    (documents,) = load(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(documents, shingle_n=3, num_hashes=16, bands=8, threshold=0.8)


@query(
    "dedup_simhash_pairs",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id AS did, t.tok
            FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
        ),
        th AS (
            SELECT did,
                   ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h_hi,
                   ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h_lo
            FROM tok
        ),
        bits AS (
            SELECT did, CAST(g.i AS INT) AS bit,
                   sum(CASE WHEN (CASE WHEN g.i < 32 THEN h_lo >> CAST(g.i AS INT)
                                  ELSE h_hi >> CAST(g.i - 32 AS INT) END) & 1 = 1
                       THEN 1 ELSE -1 END) AS s
            FROM th, UNNEST(range(0, 64)) AS g(i)
            GROUP BY 1, 2
        ),
        sim AS (
            SELECT did,
                   CAST(CASE WHEN t >= 9223372036854775808::HUGEINT
                        THEN t - 18446744073709551616::HUGEINT ELSE t END AS BIGINT)
                       AS simhash
            FROM (SELECT did,
                         coalesce(sum(CASE WHEN s > 0
                             THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END), 0) AS t
                  FROM bits GROUP BY did)
        )
        SELECT a.did AS id_a, b.did AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sim a JOIN sim b ON a.did < b.did
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    tags=("north-star", "dedup"),
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup candidates (hamming ≤ 3 via 16-bit chunk banding).

    FULLY oracle-checked (the last rows-only query through r06): the
    per-token bits are md5 halves — engine-portable — so DuckDB recomputes
    every document's 64-bit fingerprint exactly (±1 bit sums in integer
    arithmetic, HUGEINT re-signing) and emits the BRUTE-FORCE hamming≤3
    pair set.  The engine runs the banded equi-join; equality against the
    brute-force oracle therefore proves the banding's pigeonhole
    completeness (no hamming≤3 pair missed) AND soundness (nothing else
    emitted) on every driver corpus — the contract dedup_sketch_guarantees
    asserts as a boolean, here checked pair-by-pair."""
    (documents,) = load(spark, sf_dir, "documents")
    return D.simhash_near_pairs(documents)


@query(
    "sim_cosine_topk",
    oracle="""
        WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id IN (1, 2, 3, 4, 5)),
        scored AS (
            SELECT query_id, b.vec_id AS neighbor_id,
                   round(list_cosine_similarity(qv, b.v), 4) AS cosine_sim
            FROM q JOIN base b ON b.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, cosine_sim
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS rn FROM scored)
        WHERE rn <= 5
    """,
    tags=("north-star", "similarity"),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for query vectors 1..5 (the ANN baseline)."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return S.cosine_topk(embeddings, query_ids=[1, 2, 3, 4, 5], k=5)


@query(
    "sim_hard_negatives",
    oracle="""
        WITH base AS (
            SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        q AS (
            SELECT vec_id AS query_id, label AS query_label, v AS qv
            FROM base WHERE vec_id IN (1, 2, 3, 4, 5, 6, 7, 8)
        ),
        scored AS (
            SELECT query_id, query_label,
                   b.vec_id AS neighbor_id, b.label AS neighbor_label,
                   round(list_cosine_similarity(qv, b.v), 4) AS cosine_sim
            FROM q JOIN base b ON b.label <> q.query_label
        )
        SELECT query_id, CAST(query_label AS INT) AS query_label,
               neighbor_id, CAST(neighbor_label AS INT) AS neighbor_label,
               cosine_sim
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS rn FROM scored)
        WHERE rn <= 5
    """,
    tags=("north-star", "similarity", "trainprep"),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py hard_negatives): per
    anchor (vec_ids 1-8), the 5 most-similar embeddings carrying a
    DIFFERENT label — the near-boundary negatives contrastive training
    batches against each anchor.  Broadcast anchors, one corpus scan, the
    label predicate inside the broadcast join; the only shuffle is the
    per-anchor top-k window.  The all-anchor 100 TB form runs the same
    predicate through the persisted IVF index; this exact scan is its
    recall baseline."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    out = S.hard_negatives(embeddings, query_ids=[1, 2, 3, 4, 5, 6, 7, 8], k=5)
    return out.select(
        "query_id",
        F.col("query_label").cast("int").alias("query_label"),
        "neighbor_id",
        F.col("neighbor_label").cast("int").alias("neighbor_label"),
        "cosine_sim",
    )


@query(
    "sim_cosine_near_pairs",
    oracle="""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cosine_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4) >= 0.4
    """,
    tags=("north-star", "similarity"),
)
def sim_cosine_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-pairs with cosine ≥ 0.4 (threshold sits above the
    random-pair distribution of this corpus, max ≈ 0.51).

    exact=True: at 0.4 — far below near-duplicate territory — hyperplane-LSH
    recall cannot reach 1, so this oracle tier runs the brute-force path;
    sim_lsh_near_pairs below exercises the scalable default."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return S.cosine_near_pairs(embeddings, threshold=0.4, exact=True)


@query(
    "sim_lsh_near_pairs",
    oracle=f"""
        WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        buck AS ({{_LSH_NP_BUCKETS}}),
        cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM buck a JOIN buck b
              ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        )
        SELECT id_a, id_b,
               round(list_cosine_similarity(x.v, y.v), 4) AS cosine_sim
        FROM cand
        JOIN base x ON x.vec_id = cand.id_a
        JOIN base y ON y.vec_id = cand.id_b
        WHERE round(list_cosine_similarity(x.v, y.v), 4) >= 0.45
    """.replace("{_LSH_NP_BUCKETS}", _lsh_buckets_cte(num_planes=3, num_tables=12)),
    tags=("north-star", "similarity"),
)
def sim_lsh_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs via the default LSH-candidate path
    (self equi-join on (table, bucket), exact cosine verify on candidates —
    no crossJoin; plan-gated in tests/test_plans.py, recall contract
    driver-checked via sim_ann_recall_guarantees and pytest).

    FULLY oracle-checked (was rows-only through r05): the hyperplanes are
    deterministic splitmix64 constants, so the oracle replays the ENTIRE
    sketch — the same 12×3 plane literals, sign-bit buckets, (table,
    bucket) candidate join and exact-cosine verification — in DuckDB
    (_lsh_buckets_cte above).  Candidate generation, not just the
    verification stage, is therefore engine-vs-oracle checked.

    This corpus's pair-cosine tops out ≈0.51, so the threshold sits at 0.45
    with a wide-OR family (3 planes × 12 tables → pair recall ≈0.98 at
    p=0.649) to keep the result non-empty; production near-dup thresholds
    (≥0.9) would use the deeper default family."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return S.cosine_near_pairs(
        embeddings, threshold=0.45, num_planes=3, num_tables=12
    )


@query(
    "sim_ivf_query_only",
    oracle=_ivf_oracle_sql(nprobe=4),
    tags=("north-star", "similarity"),
)
def sim_ivf_query_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION ANN shape: query a PERSISTED IVF index (built once per
    corpus at ingest, amortized over every query) instead of re-training
    per call like sim_ivf_topk's self-contained benchmark.  The probed-cell
    filter is a parquet partition filter (plan-gated in TestIvfIndex), so
    scan cost tracks nprobe/num_cells of the corpus.

    FULLY oracle-checked (was rows-only through r05): the Knuth-scramble
    seeding made the whole training pass integer-SQL-expressible, so the
    oracle replays seed pick → Lloyd step → cell assignment → probe →
    re-rank in DuckDB (_ivf_oracle_sql) — a stale or corrupted persisted
    index turns the row red, which is exactly the failure the content-
    digest cache key guards against.

    The index is cached under .cache/ keyed by corpus dir; first invocation
    builds it (that cost belongs to ingest, not query — bench.py pre-builds
    in warmup so the recorded number is query-side only)."""
    from aws_genaric_datapipeline_spark.operators.similarity import (
        ivf_build_index,
        ivf_query_index,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    index_path = _ensure_corpus_index(
        sf_dir,
        "ivf",
        "v2",  # algorithm version (Knuth-scramble seeding) — an index
        # trained by an older build must not be served after a change
        "centroids",
        lambda p: ivf_build_index(embeddings, p, num_cells=16, iters=1),
    )
    queries_df = embeddings.where(F.col("vec_id").isin([1, 2, 3, 4, 5]))
    return ivf_query_index(spark, index_path, queries_df, k=5, nprobe=4)


def _ensure_corpus_index(
    sf_dir: str,
    prefix: str,
    version: str,
    probe_subdir: str,
    build,
    src_name: str = "embeddings.parquet",
) -> str:
    """Build-once cache for persisted ANN indexes under .cache/.

    Key = corpus dir name + a CONTENT digest of the source parquet (head +
    tail + size — the footer at the tail carries row-group stats, so
    regenerated data changes the digest): the test corpus can be
    regenerated in place, and stat metadata (mtime, size) survives
    cp -p/tar restores with different content — the exact staleness the
    cache must catch.  Stale {prefix}_* entries for the same corpus dir are
    pruned on rebuild so regenerations don't strand indexes forever.
    ``version`` bumps on algorithm changes; ``probe_subdir`` is the
    sub-path whose _SUCCESS marker proves a complete build; ``build`` is
    called with the index path on miss."""
    import hashlib
    import shutil
    from pathlib import Path

    src = Path(sf_dir) / src_name
    digest = hashlib.md5()
    with open(src, "rb") as fh:
        digest.update(fh.read(65536))
        size = src.stat().st_size
        if size > 131072:
            fh.seek(-65536, 2)
        digest.update(fh.read(65536))
    digest.update(str(size).encode())
    corpus = Path(sf_dir).name or "sf"
    cache_root = Path(__file__).resolve().parents[2] / ".cache"
    index_path = cache_root / f"{prefix}_{corpus}_{version}_{digest.hexdigest()[:16]}"
    if not (index_path / probe_subdir / "_SUCCESS").exists():
        for stale in cache_root.glob(f"{prefix}_{corpus}*"):
            if stale.name != index_path.name:
                shutil.rmtree(stale, ignore_errors=True)
        build(str(index_path))
    return str(index_path)


@query(
    "sim_lsh_ann_topk",
    oracle="""
        WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        buck AS ({_LSH_TK_BUCKETS}),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, b.vec_id AS neighbor_id
            FROM buck q JOIN buck b
              ON q.tbl = b.tbl AND q.bucket = b.bucket AND b.vec_id <> q.vec_id
            WHERE q.vec_id IN (1, 2, 3, 4, 5)
        ),
        scored AS (
            SELECT query_id, neighbor_id,
                   round(list_cosine_similarity(x.v, y.v), 4) AS cosine_sim
            FROM cand
            JOIN base x ON x.vec_id = cand.query_id
            JOIN base y ON y.vec_id = cand.neighbor_id
        )
        SELECT query_id, neighbor_id, cosine_sim
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cosine_sim DESC, neighbor_id) AS rn FROM scored)
        WHERE rn <= 5
    """.replace("{_LSH_TK_BUCKETS}", _lsh_buckets_cte(num_planes=4, num_tables=8)),
    tags=("north-star", "similarity"),
)
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed approximate top-5.

    FULLY oracle-checked (was rows-only through r05): the deterministic
    splitmix64 hyperplanes are inlined as SQL literals, so DuckDB replays
    bucket assignment (8 tables × 4 sign bits), the (table, bucket)
    candidate join, exact-cosine re-rank and the top-5 window — the whole
    approximate pipeline, not just a recall bound.  The recall contract
    additionally stays driver-verified by sim_ann_recall_guarantees
    (lsh_topk row) and pytest."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return S.lsh_bucketed_topk(
        embeddings, query_ids=[1, 2, 3, 4, 5], k=5, num_planes=4, num_tables=8
    )


@query(
    "sim_ann_recall_guarantees",
    oracle="""
        WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id IN (1, 2, 3, 4, 5)),
        topk AS (
            SELECT count(*) AS n FROM (
                SELECT query_id, b.vec_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY round(list_cosine_similarity(qv, b.v), 4) DESC,
                                    b.vec_id) AS rn
                FROM q JOIN base b ON b.vec_id <> q.query_id
            ) WHERE rn <= 5
        ),
        bs AS (
            SELECT * FROM base
            WHERE {bucket_vec}
        ),
        np AS (
            SELECT count(*) AS n
            FROM bs a JOIN bs b ON a.vec_id < b.vec_id
            WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.45
        )
        SELECT 'ivf_topk'       AS method, (SELECT n FROM topk) AS n_exact, true AS recall_ok
        UNION ALL
        SELECT 'ivf_index_query', (SELECT n FROM topk),                     true
        UNION ALL
        SELECT 'lsh_topk',       (SELECT n FROM topk),                      true
        UNION ALL
        SELECT 'lsh_near_pairs', (SELECT n FROM np),                        true
    """.replace("{bucket_vec}", _DUCK_MD5_BUCKET10.format(col="vec_id")),
    tags=("north-star", "similarity"),
)
def sim_ann_recall_guarantees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable recall contracts for the approximate-similarity
    paths (VERDICT r2 item 7: oracle-check the verification stage even
    where candidate generation is engine-specific).

    For each ANN method the oracle recomputes the EXACT ground-truth size
    in SQL (brute-force top-5 per query / near-pairs ≥0.45) and the engine
    emits that exact size plus a boolean asserting the approximate result
    recovered at least its contractual recall: IVF(nprobe 6/16) ≥ 0.5,
    persisted-index IVF (nprobe 4/16) ≥ 0.3, hyperplane-LSH top-k
    (4 planes x 8 tables) ≥ 0.6, LSH near-pairs (3 planes x 12 tables)
    ≥ 0.8 — the same bounds as the pytest contracts, each holding with
    margin at sf0.001 and sf0.01 (observed 0.60-0.64 / 0.36-0.44 /
    0.72-0.80 / 0.93-1.0; all deterministic — seeded hyperplanes, seeded
    k-means init, static corpus).  A red row = a broken recall contract,
    not a representation diff.

    The near-pair leg audits a deterministic md5-bucketed 10% sub-corpus
    (see the inline note): per-pair LSH hit probability is a function of
    the two vectors alone, so sampling changes the audit's COST (~100×
    less crossJoin), not the contract.  The top-k legs already use a
    fixed 5-query panel (linear scans, no sampling needed)."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    qids = [1, 2, 3, 4, 5]
    exact_tk = S.cosine_topk(embeddings, query_ids=qids, k=5).select(
        "query_id", "neighbor_id"
    )
    # The near-pair ground truth is the one quadratic scan here (brute
    # crossJoin): audit it on a deterministic md5-bucketed 10% sub-corpus
    # — per-pair LSH hit probability depends only on the two vectors, so
    # the sampled contract is the full contract restricted to sampled
    # pairs at ~1% of the scan cost.  The full-corpus form stays a pytest
    # audit (TestSketchContractsFullCorpus).
    emb_s = embeddings.where(_md5_bucket10(F.col("vec_id")))
    exact_np = S.cosine_near_pairs(emb_s, threshold=0.45, exact=True).select(
        "id_a", "id_b"
    )

    def contract(name: str, exact: DataFrame, approx: DataFrame, bound: float) -> DataFrame:
        keys = exact.columns
        n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
        n_hit = exact.join(approx.select(*keys), keys, "left_semi").agg(
            F.count(F.lit(1)).alias("n_hit")
        )
        return n_exact.crossJoin(n_hit).select(
            F.lit(name).alias("method"),
            "n_exact",
            (F.col("n_hit") >= F.lit(bound) * F.col("n_exact")).alias("recall_ok"),
        )

    ivf = S.ivf_topk(embeddings, query_ids=qids, k=5, num_cells=16, nprobe=6)
    ivf_idx = sim_ivf_query_only(spark, sf_dir)
    lsh = S.lsh_bucketed_topk(embeddings, query_ids=qids, k=5, num_planes=4, num_tables=8)
    lshnp = S.cosine_near_pairs(emb_s, threshold=0.45, num_planes=3, num_tables=12)
    return (
        contract("ivf_topk", exact_tk, ivf, 0.5)
        .unionAll(contract("ivf_index_query", exact_tk, ivf_idx, 0.3))
        .unionAll(contract("lsh_topk", exact_tk, lsh, 0.6))
        .unionAll(contract("lsh_near_pairs", exact_np, lshnp, 0.8))
    )


@query(
    "multimodal_frame_sample",
    oracle="""
        SELECT doc_id,
               CAST(t.i AS INT) AS frame_idx,
               CAST(t.i * 1000 AS INT) AS ts_ms
        FROM documents,
             UNNEST(range(0, least(4, ((length(text) * 7) % 20000) // 1000 + 1))) AS t(i)
        WHERE length(text) > 0
    """,
    tags=("north-star", "multimodal"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling end to end: documents → media table with video-typed
    metadata (duration derived from text length) → mapInPandas 1-in-N-out
    frame expansion.  The oracle checks the row-expansion contract — which
    docs emit frames, how many, and at which timestamps; frame payload bytes
    are covered by unit tests (the stub decoder is engine-specific)."""
    (documents,) = load(spark, sf_dir, "documents")
    duration = ((F.length("text") * 7) % 20000).cast("int")
    media = documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.struct(
            F.lit("video").alias("kind"),
            F.lit("video/mp4").alias("mime"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            duration.alias("duration_ms"),
        ).alias("media_meta"),
    )
    frames = M.sample_frames(media, every_ms=1000, max_frames=4, fake=True)
    return frames.select("doc_id", "frame_idx", "ts_ms")


@query(
    "multimodal_video_frames",
    oracle="""
        SELECT doc_id,
               CAST(t.i AS INT) AS frame_idx,
               CAST(t.i * 1000 AS INT) AS ts_ms,
               CAST(floor(1.164383 * ((doc_id * 7 + t.i * 13) % 200) + 0.5) AS INT) AS lum
        FROM documents,
             UNNEST(range(0, least(4, ((length(text) * 7) % 20000) // 1000 + 1))) AS t(i)
        WHERE length(text) > 0
    """,
    tags=("north-star", "multimodal"),
)
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode end to end: per document, synthesize a Y4M
    (YUV4MPEG2) stream of solid-gray frames (level 16 + (doc_id·7 + i·13)
    mod 200, frame count from text length as in multimodal_frame_sample),
    then run sample_frames' DEFAULT (non-fake) path — pure numpy Y4M
    parsing, offset-arithmetic frame seeking, BT.601 YUV→RGB with half-up
    rounding, PNG re-encode (operators/videocodec.py + imagecodec.py) —
    and PNG-decode each emitted frame back to its luminance.  The whole
    decode chain is bit-reproducible, so the oracle recomputes the decoded
    gray value in SQL from the same double constants: a single wrong byte
    anywhere in parse → seek → color-convert → encode → decode turns the
    row red."""
    from collections.abc import Iterator

    import pandas as pd

    (documents,) = load(spark, sf_dir, "documents")

    H, W = 8, 12

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from aws_genaric_datapipeline_spark.operators.videocodec import encode_y4m_mono

        for pdf in batches:
            rows: dict[str, list] = {"doc_id": [], "media": [], "media_meta": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                n_chars = len(text) if text is not None else 0
                if n_chars == 0:
                    continue
                n = min(4, ((n_chars * 7) % 20000) // 1000 + 1)
                frames = [
                    np.full((H, W), 16 + (int(did) * 7 + i * 13) % 200, dtype=np.uint8)
                    for i in range(n)
                ]
                rows["doc_id"].append(did)
                rows["media"].append(encode_y4m_mono(frames, fps_num=1))
                rows["media_meta"].append(
                    {"kind": "video", "mime": "video/x-yuv4mpeg", "width": W,
                     "height": H, "duration_ms": n * 1000}
                )
            yield pd.DataFrame(rows)

    def _lum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aws_genaric_datapipeline_spark.operators.imagecodec import decode_image

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "ts_ms": pdf["ts_ms"],
                    "lum": [int(decode_image(bytes(b))[0, 0, 0]) for b in pdf["frame"]],
                }
            )

    media = documents.select("doc_id", "text").mapInPandas(_render, schema=M.MEDIA_SCHEMA)
    frames = M.sample_frames(media, every_ms=1000, max_frames=4)
    return frames.mapInPandas(
        _lum, schema="doc_id long, frame_idx int, ts_ms int, lum int"
    )


@query(
    "sim_ivf_topk",
    oracle=_ivf_oracle_sql(nprobe=6),
    tags=("north-star", "similarity"),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-5: corpus bucketed by nearest
    trained centroid, queries probe their nprobe nearest cells, exact
    re-rank inside the probed cells.

    FULLY oracle-checked (was rows-only through r05): deterministic
    Knuth-scramble seeding lets the oracle replay the entire train →
    assign → probe → re-rank pipeline in DuckDB (_ivf_oracle_sql); the
    recall contract additionally stays driver-checked via
    sim_ann_recall_guarantees and tests/test_operators.py."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return S.ivf_topk(
        embeddings, query_ids=[1, 2, 3, 4, 5], k=5, num_cells=16, nprobe=6
    )


def _pq_oracle_sql(
    num_subspaces: int = 8, num_codes: int = 16, dim: int = 64, k: int = 5
) -> str:
    """Oracle SQL replaying the ENTIRE product-quantization pipeline
    (similarity.py pq_train_codebooks + pq_encode + pq_topk ADC) in
    DuckDB: Knuth-scramble seed pick, per-subspace argmin-L2 Lloyd step
    (ties to the lower code), re-encode against the trained codebooks,
    per-query M×ks lookup tables from EXACT query sub-vectors, and the
    summed ADC score ranked (round-4 DESC, neighbor id).  Same float
    caveat class as _ivf_oracle_sql: a mismatch needs an argmin or
    round-4 boundary inside ~1e-16 summation noise."""
    m_, d = num_subspaces, dim // num_subspaces
    scr = "((vec_id % 2147483648) * 2654435761) % 4294967296"
    return f"""
        WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        unit AS (
            SELECT vec_id,
                   CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v
                        ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                   END AS u
            FROM base
        ),
        seeds AS (
            SELECT u AS su, code FROM (
                SELECT u, row_number() OVER (ORDER BY {scr}, vec_id) - 1 AS code
                FROM unit)
            WHERE code < {num_codes}
        ),
        sp AS (SELECT CAST(g.m AS INT) AS m FROM UNNEST(generate_series(0, {m_ - 1})) AS g(m)),
        sub AS (
            SELECT vec_id, m, list_slice(u, m * {d} + 1, m * {d} + {d}) AS s
            FROM unit, sp
        ),
        sseed AS (
            SELECT code, m, list_slice(su, m * {d} + 1, m * {d} + {d}) AS s
            FROM seeds, sp
        ),
        assign0 AS (
            SELECT vec_id, m, code FROM (
                SELECT c.vec_id, c.m, s.code,
                       row_number() OVER (PARTITION BY c.vec_id, c.m
                           ORDER BY list_distance(c.s, s.s), s.code) AS rn
                FROM sub c JOIN sseed s ON s.m = c.m)
            WHERE rn = 1
        ),
        cm AS (
            SELECT a.m, a.code, g.pos AS pos, avg(c.s[g.pos]) AS v
            FROM assign0 a
            JOIN sub c ON c.vec_id = a.vec_id AND c.m = a.m,
            UNNEST(generate_series(1, {d})) AS g(pos)
            GROUP BY 1, 2, 3
        ),
        cb0 AS (SELECT m, code, list(v ORDER BY pos) AS cv FROM cm GROUP BY m, code),
        cb AS (
            SELECT s.m, s.code, coalesce(c.cv, s.s) AS cv
            FROM sseed s LEFT JOIN cb0 c ON c.m = s.m AND c.code = s.code
        ),
        enc AS (
            SELECT vec_id, m, code FROM (
                SELECT c.vec_id, c.m, b.code,
                       row_number() OVER (PARTITION BY c.vec_id, c.m
                           ORDER BY list_distance(c.s, b.cv), b.code) AS rn
                FROM sub c JOIN cb b ON b.m = c.m)
            WHERE rn = 1
        ),
        lut AS (
            SELECT q.vec_id AS query_id, b.m, b.code, list_dot_product(q.s, b.cv) AS pdot
            FROM sub q JOIN cb b ON b.m = q.m
            WHERE q.vec_id IN (1, 2, 3, 4, 5)
        ),
        scored AS (
            SELECT l.query_id, e.vec_id AS neighbor_id,
                   round(sum(l.pdot), 4) AS approx_sim
            FROM enc e JOIN lut l ON l.m = e.m AND l.code = e.code
            WHERE e.vec_id <> l.query_id
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, approx_sim
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY approx_sim DESC, neighbor_id) AS rn FROM scored)
        WHERE rn <= {k}
    """


def _ivfpq_oracle_sql(
    nprobe: int = 4,
    num_cells: int = 16,
    num_subspaces: int = 8,
    num_codes: int = 16,
    dim: int = 64,
    k: int = 5,
) -> str:
    """Oracle SQL replaying the composed IVF-PQ pipeline: the IVF coarse
    training/assignment/probing CTEs of _ivf_oracle_sql joined with the
    PQ codebook/encode/LUT CTEs of _pq_oracle_sql, with ADC scoring
    restricted to (query, cell)-matched candidates.  Same float caveat
    class as its two parents."""
    m_, d = num_subspaces, dim // num_subspaces
    scr = "((vec_id % 2147483648) * 2654435761) % 4294967296"
    return f"""
        WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        unit AS (
            SELECT vec_id,
                   CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v
                        ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                   END AS u
            FROM base
        ),
        -- IVF coarse quantizer (as _ivf_oracle_sql)
        iseeds AS (
            SELECT u AS su, cell_id FROM (
                SELECT u, row_number() OVER (ORDER BY {scr}, vec_id) - 1 AS cell_id
                FROM unit)
            WHERE cell_id < {num_cells}
        ),
        iassign0 AS (
            SELECT vec_id, u, cell_id FROM (
                SELECT un.vec_id, un.u, s.cell_id,
                       row_number() OVER (PARTITION BY un.vec_id
                           ORDER BY list_dot_product(un.u, s.su) DESC, s.cell_id) AS rn
                FROM unit un CROSS JOIN iseeds s)
            WHERE rn = 1
        ),
        icm AS (
            SELECT cell_id, g.pos AS pos, avg(u[g.pos]) AS m
            FROM iassign0, UNNEST(generate_series(1, {dim})) AS g(pos)
            GROUP BY 1, 2
        ),
        icvecs AS (SELECT cell_id, list(m ORDER BY pos) AS cv FROM icm GROUP BY cell_id),
        icunit AS (
            SELECT cell_id,
                   CASE WHEN sqrt(list_dot_product(cv, cv)) = 0 THEN cv
                        ELSE list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
                   END AS cu
            FROM icvecs
        ),
        iassign1 AS (
            SELECT vec_id, cell_id FROM (
                SELECT un.vec_id, c.cell_id,
                       row_number() OVER (PARTITION BY un.vec_id
                           ORDER BY list_dot_product(un.u, c.cu) DESC, c.cell_id) AS rn
                FROM unit un CROSS JOIN icunit c)
            WHERE rn = 1
        ),
        qprobe AS (
            SELECT vec_id AS query_id, cell_id FROM (
                SELECT un.vec_id, c.cell_id,
                       row_number() OVER (PARTITION BY un.vec_id
                           ORDER BY list_dot_product(un.u, c.cu) DESC, c.cell_id) AS rn
                FROM unit un CROSS JOIN icunit c
                WHERE un.vec_id IN (1, 2, 3, 4, 5))
            WHERE rn <= {nprobe}
        ),
        -- PQ fine quantizer (as _pq_oracle_sql)
        pseeds AS (
            SELECT u AS su, code FROM (
                SELECT u, row_number() OVER (ORDER BY {scr}, vec_id) - 1 AS code
                FROM unit)
            WHERE code < {num_codes}
        ),
        sp AS (SELECT CAST(g.m AS INT) AS m FROM UNNEST(generate_series(0, {m_ - 1})) AS g(m)),
        sub AS (
            SELECT vec_id, m, list_slice(u, m * {d} + 1, m * {d} + {d}) AS s
            FROM unit, sp
        ),
        sseed AS (
            SELECT code, m, list_slice(su, m * {d} + 1, m * {d} + {d}) AS s
            FROM pseeds, sp
        ),
        passign0 AS (
            SELECT vec_id, m, code FROM (
                SELECT c.vec_id, c.m, s.code,
                       row_number() OVER (PARTITION BY c.vec_id, c.m
                           ORDER BY list_distance(c.s, s.s), s.code) AS rn
                FROM sub c JOIN sseed s ON s.m = c.m)
            WHERE rn = 1
        ),
        pcm AS (
            SELECT a.m, a.code, g.pos AS pos, avg(c.s[g.pos]) AS v
            FROM passign0 a
            JOIN sub c ON c.vec_id = a.vec_id AND c.m = a.m,
            UNNEST(generate_series(1, {d})) AS g(pos)
            GROUP BY 1, 2, 3
        ),
        pcb0 AS (SELECT m, code, list(v ORDER BY pos) AS cv FROM pcm GROUP BY m, code),
        pcb AS (
            SELECT s.m, s.code, coalesce(c.cv, s.s) AS cv
            FROM sseed s LEFT JOIN pcb0 c ON c.m = s.m AND c.code = s.code
        ),
        enc AS (
            SELECT vec_id, m, code FROM (
                SELECT c.vec_id, c.m, b.code,
                       row_number() OVER (PARTITION BY c.vec_id, c.m
                           ORDER BY list_distance(c.s, b.cv), b.code) AS rn
                FROM sub c JOIN pcb b ON b.m = c.m)
            WHERE rn = 1
        ),
        lut AS (
            SELECT q.vec_id AS query_id, b.m, b.code, list_dot_product(q.s, b.cv) AS pdot
            FROM sub q JOIN pcb b ON b.m = q.m
            WHERE q.vec_id IN (1, 2, 3, 4, 5)
        ),
        -- composition: ADC only inside probed cells
        scored AS (
            SELECT l.query_id, e.vec_id AS neighbor_id,
                   round(sum(l.pdot), 4) AS approx_sim
            FROM enc e
            JOIN iassign1 n ON n.vec_id = e.vec_id
            JOIN qprobe p ON p.cell_id = n.cell_id
            JOIN lut l ON l.query_id = p.query_id AND l.m = e.m AND l.code = e.code
            WHERE e.vec_id <> l.query_id
            GROUP BY 1, 2
        )
        SELECT query_id, neighbor_id, approx_sim
        FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY approx_sim DESC, neighbor_id) AS rn FROM scored)
        WHERE rn <= {k}
    """


@query(
    "sim_ivfpq_topk",
    oracle=_ivfpq_oracle_sql(nprobe=4),
    tags=("north-star", "similarity"),
)
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-5 — the production ANN composition (coarse
    inverted-file probing × product-quantized ADC scoring, the FAISS
    IVFPQ recipe on raw vectors): queries probe 4 of 16 trained cells and
    score only those cells' vectors from their one-byte-per-subspace
    codes.  At 100 TB the scan is nprobe/num_cells of a 64×-compressed
    codes column — candidate count AND bytes-per-candidate both cut.
    FULLY oracle-checked (_ivfpq_oracle_sql replays both trainers, the
    cell assignment/probing, encoding, LUTs, and the cell-restricted ADC
    ranking)."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return S.ivfpq_topk(embeddings, query_ids=[1, 2, 3, 4, 5], k=5, nprobe=4)


@query(
    "sim_pq_topk",
    oracle=_pq_oracle_sql(),
    tags=("north-star", "similarity"),
)
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-5 (Jégou et al. 2011): unit
    vectors compressed to one byte-sized code per subspace (8 subspaces ×
    16 codes over 64 dims ≈ 64× compression), queries score the corpus by
    asymmetric distance computation — exact query sub-vectors against a
    per-query M×ks lookup table of codebook partial dots, summed over
    subspaces.

    This is the missing compression tier between brute-force cosine and
    the IVF/LSH candidate generators: at 100 TB the codes column (1/64th
    of the embeddings) is what scans, and IVF-PQ composes the two (probe
    cells, ADC inside).  FULLY oracle-checked: deterministic seeding and
    one Lloyd step make training, encoding, LUT build, and ADC ranking
    SQL-replayable (_pq_oracle_sql), verified bit-identical at sf0.001
    and sf0.01.  Recall vs exact top-k is pinned separately in
    tests/test_operators.py::TestProductQuantization."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    return S.pq_topk(embeddings, query_ids=[1, 2, 3, 4, 5], k=5)


@query(
    "sim_pq_query_only",
    oracle=_pq_oracle_sql(),
    tags=("north-star", "similarity"),
)
def sim_pq_query_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The amortized PQ path — query a PERSISTED PQ index (codebooks +
    codes column built once per corpus at ingest) instead of re-training
    and re-encoding per call like sim_pq_topk's self-contained benchmark.
    This is the production FAISS recipe: the query-side cost is the LUT
    build (M×ks dots per query) plus an ADC scan of STORED 1-byte codes —
    the original embeddings are never read on the query path.

    Deterministic training makes the persisted index byte-equivalent to a
    fresh build, so the SAME full-pipeline PQ oracle checks index-served
    results — a stale or corrupted persisted index turns the row red,
    exactly the failure the content-digest cache key guards against.
    First invocation builds the index (ingest-side cost; bench.py
    pre-builds in warmup so the recorded number is query-side only)."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    index_path = _ensure_corpus_index(
        sf_dir,
        "pq",
        "v1",
        "codes",
        lambda p: S.pq_build_index(embeddings, p),
    )
    queries_df = embeddings.where(F.col("vec_id").isin([1, 2, 3, 4, 5]))
    return S.pq_query_index(spark, index_path, queries_df, k=5)


@query(
    "sim_ivfpq_query_only",
    oracle=_ivfpq_oracle_sql(nprobe=4),
    tags=("north-star", "similarity"),
)
def sim_ivfpq_query_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The amortized IVF-PQ path — query a PERSISTED IVF-PQ index (coarse
    centroids + PQ codebooks + the codes column partitioned by cell on
    disk).  Queries probe 4 of 16 cells; the cell filter is a parquet
    PARTITION filter on the index layout, so the scan reads
    nprobe/num_cells of a 64×-compressed codes column — the full
    production ANN cost shape, amortizing BOTH trainings that
    sim_ivfpq_topk pays per call.  Same oracle as the fresh-build tier
    (deterministic trainers ⇒ index-served ≡ fresh), so index integrity
    is value-checked, not assumed."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    index_path = _ensure_corpus_index(
        sf_dir,
        "ivfpq",
        "v1",
        "centroids",
        lambda p: S.ivfpq_build_index(embeddings, p, num_cells=16),
    )
    queries_df = embeddings.where(F.col("vec_id").isin([1, 2, 3, 4, 5]))
    return S.ivfpq_query_index(spark, index_path, queries_df, k=5, nprobe=4)


@query(
    "multimodal_features",
    oracle="""
        SELECT doc_id,
               'image' AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
        FROM documents
    """,
    tags=("north-star", "multimodal"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media column plumbing end to end: encode → typed-metadata media
    table → Arrow-batched mapInPandas feature extraction (deterministic fake
    decoder).  The byte-count contract is oracle-checked; feature values are
    covered by unit tests."""
    (documents,) = load(spark, sf_dir, "documents")
    media = M.attach_media(documents)
    feats = M.decode_media(media, fake=True)
    return feats.select("doc_id", "kind", "n_bytes")


_MM_SUM_SQL = (
    "CAST(list_sum(list_transform(range(1, 145), "
    "j -> unicode(substr(tile, {off} + CAST(j AS INT), 1)))) AS BIGINT) AS s{i}"
)


@query(
    "multimodal_real_decode",
    oracle=f"""
        WITH a AS (
            SELECT doc_id, text FROM documents
            WHERE text IS NOT NULL AND length(text) > 0
              AND octet_length(encode(text)) = length(text)
        ),
        t AS (
            SELECT doc_id,
                   substr(repeat(text, CAST(576 // length(text) AS INT) + 1),
                          1, 576) AS tile
            FROM a
        )
        SELECT doc_id,
               {_MM_SUM_SQL.format(off=0, i=0)},
               {_MM_SUM_SQL.format(off=144, i=1)},
               {_MM_SUM_SQL.format(off=288, i=2)},
               {_MM_SUM_SQL.format(off=432, i=3)}
        FROM t
    """,
    tags=("north-star", "multimodal"),
)
def multimodal_real_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end to end, FULLY oracle-checked (rows-only
    through r05): per document, render its text bytes as a deterministic
    16×12 RGB image, PNG-encode (operators/imagecodec.py — pure
    numpy/zlib, no image library), then run decode_media's DEFAULT
    (non-fake) path: PNG decode + stripe-luminance features over actual
    pixels, Arrow-batched through mapInPandas.

    PNG being lossless, each stripe's luminance is a pure function of the
    text bytes — so the oracle recomputes it WITHOUT any codec: tile the
    document's characters to 576, sum the 144 codepoints of each of the 4
    stripes (both engines restricted to ASCII documents, where codepoint
    == UTF-8 byte — today that's every generated document, and the filter
    keeps the oracle exact if a regenerated corpus ever adds non-ASCII).
    The engine maps its decoded float features back to the integer byte
    sums (s_i = round(f_i·144·255); the 6-dp rounding error of f_i is
    ≤0.018 ≪ 0.5, so the integers are EXACT) — a hash-match therefore
    proves the whole encode→decode→feature path bit-reproducibly, with no
    float-boundary caveat.  Pixel-exactness is additionally asserted in
    tests/test_operators.py::TestMultimodal and tests/test_imagecodec.py."""
    from collections.abc import Iterator

    import pandas as pd

    (documents,) = load(spark, sf_dir, "documents")
    documents = documents.where(
        F.col("text").isNotNull()
        & (F.length("text") > 0)
        & (F.octet_length("text") == F.length("text"))
    )

    H, W = 12, 16

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from aws_genaric_datapipeline_spark.operators.imagecodec import encode_png

        n = H * W * 3
        for pdf in batches:
            blobs = []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8")
                buf = (raw * (n // max(len(raw), 1) + 1))[:n] if raw else bytes(n)
                img = np.frombuffer(buf, dtype=np.uint8).reshape(H, W, 3)
                blobs.append(encode_png(img))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": blobs,
                    "media_meta": [
                        {"kind": "image", "mime": "image/png", "width": W,
                         "height": H, "duration_ms": 0}
                        for _ in blobs
                    ],
                }
            )

    media = documents.select("doc_id", "text").mapInPandas(_render, schema=M.MEDIA_SCHEMA)
    feats = M.decode_media(media, feature_dim=4)
    return feats.select(
        "doc_id",
        *[
            F.round(F.element_at("feature", i + 1) * (144 * 255))
            .cast("bigint")
            .alias(f"s{i}")
            for i in range(4)
        ],
    )


def _phash_oracle_sql() -> str:
    """Shared WITH-body CTEs (a, t, h) replaying the full image-dHash
    chain for the 16×12 tiles — used by both phash oracles:
    tile text → nearest-neighbor 10×7 downscale (pure index selection:
    ys[r] = r·12//7, xs[c] = c·16//10) → integer luminance
    (299R+587G+114B)//1000 → adjacent-column compare bit per (r, c) →
    63-bit packed bigint.  PNG being lossless and every step integer,
    the hash is a pure function of the text bytes — replayed without any
    codec, same trick as multimodal_real_decode's stripe sums."""

    def gray(col_expr: str) -> str:
        px = f"((((CAST(i AS INT)//9)*12)//7)*16 + {col_expr})*3"
        return (
            f"(299*unicode(substr(tile, {px} + 1, 1))"
            f" + 587*unicode(substr(tile, {px} + 2, 1))"
            f" + 114*unicode(substr(tile, {px} + 3, 1))) // 1000"
        )

    left = gray("((CAST(i AS INT)%9)*16)//10")
    right = gray("(((CAST(i AS INT)%9)+1)*16)//10")
    return f"""
        a AS (
            SELECT doc_id, text FROM documents
            WHERE text IS NOT NULL AND length(text) > 0
              AND octet_length(encode(text)) = length(text)
        ),
        t AS (
            SELECT doc_id,
                   substr(repeat(text, CAST(576 // length(text) AS INT) + 1),
                          1, 576) AS tile
            FROM a
        ),
        h AS (
            SELECT doc_id,
                   CAST(list_sum(list_transform(range(0, 63), i ->
                       CASE WHEN {left} > {right}
                            THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                            ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
            FROM t
        )
    """


def _phash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, phash) over the deterministic 16×12 text-tile PNG corpus:
    render → REAL PNG decode → integer dHash (perceptual_hash_media).
    Shared by the exact-dup and Hamming-near-dup phash queries."""
    from collections.abc import Iterator

    import pandas as pd

    (documents,) = load(spark, sf_dir, "documents")
    documents = documents.where(
        F.col("text").isNotNull()
        & (F.length("text") > 0)
        & (F.octet_length("text") == F.length("text"))
    )

    H, W = 12, 16

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from aws_genaric_datapipeline_spark.operators.imagecodec import encode_png

        n = H * W * 3
        for pdf in batches:
            blobs = []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8")
                buf = (raw * (n // max(len(raw), 1) + 1))[:n] if raw else bytes(n)
                img = np.frombuffer(buf, dtype=np.uint8).reshape(H, W, 3)
                blobs.append(encode_png(img))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": blobs,
                    "media_meta": [
                        {"kind": "image", "mime": "image/png", "width": W,
                         "height": H, "duration_ms": 0}
                        for _ in blobs
                    ],
                }
            )

    media = documents.select("doc_id", "text").mapInPandas(_render, schema=M.MEDIA_SCHEMA)
    return M.perceptual_hash_media(media)


@query(
    "multimodal_phash_dedup",
    oracle=f"""
        WITH {_phash_oracle_sql()},
        c AS (SELECT phash, count(*) AS dup_count FROM h GROUP BY phash)
        SELECT h.doc_id, h.phash, CAST(c.dup_count AS BIGINT) AS dup_count
        FROM h JOIN c USING (phash)
        WHERE h.doc_id % 25 = 0
    """,
    tags=("north-star", "multimodal", "dedup"),
)
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE dedup by perceptual difference-hash (operators/multimodal.py
    perceptual_hash_media): per document, render its text bytes as the
    deterministic 16×12 PNG (same corpus as multimodal_real_decode), run
    the REAL decode → integer downscale → luminance → dHash chain, then
    group the corpus by the 8-byte hash.  Returns, for the doc_id % 25
    probe subset, each doc's hash and its corpus-wide duplicate count —
    candidate generation AND the hash values themselves are replayed by
    the oracle bit-exactly (every step is integer arithmetic; see
    _phash_oracle_sql).

    Scale: the image corpus is touched once by an Arrow-batched
    mapInPandas; dedup shuffles only (id, phash) pairs — 16 bytes/image
    at 100 TB of pixels.  Hamming-near-dup extends via the SimHash banded
    join over the same hashes."""
    # localCheckpoint (not persist): the render+decode output is reused by
    # both branches below but must not stay pinned in executor memory after
    # this query's action — checkpoint blocks are released when the frame
    # goes out of scope (ContextCleaner), unlike CacheManager entries.
    hashes = _phash_frame(spark, sf_dir).localCheckpoint(eager=True)
    counts = hashes.groupBy("phash").agg(F.count(F.lit(1)).alias("dup_count"))
    return (
        hashes.where(F.col("doc_id") % 25 == 0)
        .join(counts, "phash")
        .select("doc_id", "phash", "dup_count")
    )


@query(
    "multimodal_phash_near_dup",
    oracle=f"""
        WITH {_phash_oracle_sql()}
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
        FROM h a JOIN h b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= 3
    """,
    tags=("north-star", "multimodal", "dedup"),
)
def multimodal_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IMAGE near-dup pairs: same real-decode dHash corpus as
    multimodal_phash_dedup, paired by the generic banded Hamming join
    (operators/dedup.py hamming_near_pairs — 4×16-bit chunks, pigeonhole
    guarantees zero recall loss at hamming ≤ 3).  The oracle verifies the
    band path against an ALL-PAIRS hamming filter over the replayed
    hashes, so both candidate completeness and hash values are driver-
    checked.  Only (id, chunk) rows shuffle; the engine never forms N²."""
    hashes = _phash_frame(spark, sf_dir)
    return D.hamming_near_pairs(
        hashes, id_col="doc_id", hash_col="phash", max_hamming=3
    ).select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))


def _jpeg_phash_oracle_sql() -> str:
    """WITH-body CTEs (a, t, h) replaying the GRAYSCALE-tile dHash for the
    JPEG roundtrip corpus.  Exactness argument: each 16×12 tile pixel is
    expanded to a constant 8×8 block, and a block-constant image at JPEG
    quality 100 (all-ones quant tables) roundtrips BIT-EXACTLY through
    the DCT chain (DC = 8*(v-128) integer, AC float noise ~1e-13
    quantizes to 0 — operators/jpegcodec.py module doc).  resize_nearest
    then composes floors: (i*96//7)//8 == i*12//7, so the decoded
    128×96 image hashes identically to the 16×12 tile — which is what
    this SQL computes straight from the text bytes, no codec."""

    def gray(col_expr: str) -> str:
        px = f"(((CAST(i AS INT)//9)*12)//7)*16 + {col_expr}"
        return f"unicode(substr(tile, {px} + 1, 1))"

    left = gray("((CAST(i AS INT)%9)*16)//10")
    right = gray("(((CAST(i AS INT)%9)+1)*16)//10")
    return f"""
        a AS (
            SELECT doc_id, text FROM documents
            WHERE text IS NOT NULL AND length(text) > 0
              AND octet_length(encode(text)) = length(text)
        ),
        t AS (
            SELECT doc_id,
                   substr(repeat(text, CAST(192 // length(text) AS INT) + 1),
                          1, 192) AS tile
            FROM a
        ),
        h AS (
            SELECT doc_id,
                   CAST(list_sum(list_transform(range(0, 63), i ->
                       CASE WHEN {left} > {right}
                            THEN (CAST(1 AS BIGINT) << CAST(i AS INT))
                            ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS phash
            FROM t
        )
    """


@query(
    "multimodal_jpeg_phash",
    oracle=f"""
        WITH {_jpeg_phash_oracle_sql()},
        c AS (SELECT phash, count(*) AS dup_count FROM h GROUP BY phash)
        SELECT h.doc_id, h.phash, CAST(c.dup_count AS BIGINT) AS dup_count
        FROM h JOIN c USING (phash)
        WHERE h.doc_id % 25 = 0
    """,
    tags=("north-star", "multimodal", "dedup"),
)
def multimodal_jpeg_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG decode end to end, FULLY oracle-checked: per document, render
    its text bytes as a deterministic 16×12 GRAYSCALE tile, expand each
    pixel to an 8×8 block (128×96), encode with the engine's own
    baseline JPEG encoder (operators/jpegcodec.py — huffman bitstream,
    DCT, Annex-K tables, quality 100), then run the standard
    perceptual-hash chain: REAL JPEG decode → nearest-neighbor 10×7 →
    dHash → corpus-wide duplicate counts for the doc_id % 25 probe set.

    The block-constant + quality-100 construction makes the LOSSY codec's
    output provably bit-exact (see _jpeg_phash_oracle_sql), so the oracle
    replays hash VALUES — any defect anywhere in the segment parser,
    huffman decode, dequant, IDCT, or resize flips bits and fails the
    driver gate.  General lossy behavior (color, 4:2:0, gradients,
    PSNR) is covered by tests/test_jpegcodec.py.

    Scale: identical shape to multimodal_phash_dedup — one Arrow-batched
    mapInPandas over the image corpus, then only (id, phash) shuffles."""
    from collections.abc import Iterator

    import pandas as pd

    (documents,) = load(spark, sf_dir, "documents")
    documents = documents.where(
        F.col("text").isNotNull()
        & (F.length("text") > 0)
        & (F.octet_length("text") == F.length("text"))
    )

    H, W = 12, 16

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from aws_genaric_datapipeline_spark.operators.jpegcodec import encode_jpeg

        n = H * W
        ones = np.ones((8, 8), dtype=np.uint8)
        for pdf in batches:
            blobs = []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8")
                buf = (raw * (n // max(len(raw), 1) + 1))[:n] if raw else bytes(n)
                tile = np.frombuffer(buf, dtype=np.uint8).reshape(H, W)
                blobs.append(encode_jpeg(np.kron(tile, ones), quality=100))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": blobs,
                    "media_meta": [
                        {"kind": "image", "mime": "image/jpeg", "width": W * 8,
                         "height": H * 8, "duration_ms": 0}
                        for _ in blobs
                    ],
                }
            )

    # The JPEG encode inside _render is ~4 ms/image of Python work; the
    # parquet source is a single split at bench scale, so parallelize the
    # INPUT of the render pass (ensure_parallelism downstream would only
    # parallelize the decode side).
    from aws_genaric_datapipeline_spark.operators.partitioning import (
        ensure_parallelism,
    )

    media = ensure_parallelism(documents.select("doc_id", "text")).mapInPandas(
        _render, schema=M.MEDIA_SCHEMA
    )
    hashes = M.perceptual_hash_media(media).localCheckpoint(eager=True)
    counts = hashes.groupBy("phash").agg(F.count(F.lit(1)).alias("dup_count"))
    return (
        hashes.where(F.col("doc_id") % 25 == 0)
        .join(counts, "phash")
        .select("doc_id", "phash", F.col("dup_count").cast("bigint").alias("dup_count"))
    )


@query(
    "multimodal_audio_near_dup",
    oracle="""
        WITH p AS (
            SELECT doc_id, doc_id % 50 AS g,
                   CAST(doc_id % 7 AS INT) AS pp,
                   CAST(doc_id % 3 AS INT) AS pv,
                   (doc_id % 50) * 37 % 1000 + 2100 AS n
            FROM documents WHERE length(text) > 0
        ),
        w AS (
            SELECT doc_id, g, pp, pv, n, CAST(t.i AS INT) AS win
            FROM p, UNNEST(range(0, (n + 31) // 32)) AS t(i)
        ),
        e AS MATERIALIZED (
            SELECT doc_id, win,
                   sum(CASE WHEN u.j = pp
                       THEN ((g*31 + u.j*(17 + 2*g)) % 4001 - 2000 + pv)
                          * ((g*31 + u.j*(17 + 2*g)) % 4001 - 2000 + pv)
                       ELSE ((g*31 + u.j*(17 + 2*g)) % 4001 - 2000)
                          * ((g*31 + u.j*(17 + 2*g)) % 4001 - 2000) END) AS energy
            FROM w, UNNEST(range(win * 32, least(n, (win + 1) * 32))) AS u(j)
            GROUP BY doc_id, win
        ),
        fp AS MATERIALIZED (
            SELECT a.doc_id,
                   CAST(sum(CASE WHEN b.energy > a.energy
                            THEN CAST(1 AS BIGINT) << a.win
                            ELSE 0 END) AS BIGINT) AS fp
            FROM e a JOIN e b ON a.doc_id = b.doc_id AND b.win = a.win + 1
            WHERE a.win < 63
            GROUP BY a.doc_id
        ),
        ck AS (
            SELECT doc_id, fp, t.c,
                   (fp >> (t.c * 16)) & 65535 AS cv
            FROM fp, UNNEST([0, 1, 2, 3]) AS t(c)
        ),
        cand AS (
            SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
                   x.fp AS fa, y.fp AS fb
            FROM ck x JOIN ck y
              ON x.c = y.c AND x.cv = y.cv AND x.doc_id < y.doc_id
        )
        SELECT id_a, id_b,
               CAST(bit_count(CAST(xor(fa, fb) AS BIGINT)) AS INT) AS hamming
        FROM cand
        WHERE bit_count(CAST(xor(fa, fb) AS BIGINT)) <= 3
    """,
    tags=("north-star", "multimodal", "dedup"),
)
def multimodal_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio NEAR-duplicate detection end to end — the acoustic-
    fingerprint analog of the image dHash near-dup (chromaprint's shape,
    integer-exact): per document synthesize an int16 PCM waveform shared
    by its doc_id%50 group except one tiny per-doc sample perturbation
    (so genuine near-duplicates exist by construction), REALLY encode it
    as RIFF/WAVE and decode it back (operators/audiocodec.py), compute
    32-sample windowed int64 energies, and fingerprint the ENERGY
    TRANSITIONS: bit w = [energy(w+1) > energy(w)], packed into ≤63 bits
    (bit 63 unused — no sign games).  Near-dup pairs come from the same
    banded 4×16-bit Hamming join the image path uses
    (operators/dedup.py hamming_near_pairs — pigeonhole-complete for
    hamming ≤ 3).

    The oracle replays EVERYTHING in SQL from the generating congruence:
    window energies (perturbation included), transition bits, the packed
    fingerprint, the banded candidate join, and the Hamming verify — a
    single wrong byte in WAV encode → parse → decode → window flips a
    bit and fails the hash gate.

    Scale: one Arrow-batched mapInPandas per codec direction; only
    (id, fingerprint) and band rows shuffle — corpus audio never
    re-enters after the fingerprint pass (the documented dHash shape)."""
    from collections.abc import Iterator

    import pandas as pd

    (documents,) = load(spark, sf_dir, "documents")
    docs = documents.where(F.length("text") > 0)

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from aws_genaric_datapipeline_spark.operators.audiocodec import (
            encode_wav,
        )

        for pdf in batches:
            rows: dict[str, list] = {"doc_id": [], "media": [], "media_meta": []}
            for did in pdf["doc_id"]:
                did = int(did)
                g = did % 50
                n = g * 37 % 1000 + 2100
                i = np.arange(n, dtype=np.int64)
                x = (g * 31 + i * (17 + 2 * g)) % 4001 - 2000
                x[did % 7] += did % 3  # the near-dup perturbation
                rows["doc_id"].append(did)
                rows["media"].append(
                    encode_wav(x.astype(np.int16), sample_rate=8000)
                )
                rows["media_meta"].append(
                    {"kind": "audio", "mime": "audio/wav", "width": 0,
                     "height": 0, "duration_ms": n * 1000 // 8000}
                )
            yield pd.DataFrame(rows)

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aws_genaric_datapipeline_spark.operators.audiocodec import (
            decode_wav,
            window_energy,
        )

        for pdf in batches:
            out: dict[str, list] = {"did": [], "fp": []}
            for did, payload in zip(pdf["doc_id"], pdf["media"]):
                en = [e for _, _, e in window_energy(
                    decode_wav(bytes(payload)), window=32
                )]
                f = 0
                for w in range(min(len(en) - 1, 63)):
                    if en[w + 1] > en[w]:
                        f |= 1 << w
                out["did"].append(int(did))
                out["fp"].append(f)
            yield pd.DataFrame(out)

    from aws_genaric_datapipeline_spark.operators.partitioning import (
        ensure_parallelism,
    )

    media = ensure_parallelism(docs.select("doc_id")).mapInPandas(
        _render, schema=M.MEDIA_SCHEMA
    )
    fps = media.mapInPandas(_fp, schema="did long, fp long")
    return D.hamming_near_pairs(fps, id_col="did", hash_col="fp")


@query(
    "curate_image_caption_rules",
    oracle=_LANG_TRIGRAM_CTES
    + f""",
    ic AS (
        SELECT d.doc_id,
               CAST(8 * (1 + d.doc_id % 7) AS INT) AS width,
               CAST(8 * (1 + (d.doc_id * 3) % 6) AS INT) AS height,
               CAST(CASE WHEN length(trim(d.text)) = 0 THEN 0
                    ELSE len({_DUCK_TOKS.replace('text', 'd.text')}) END
                    AS BIGINT) AS n_caption_tokens,
               p.lang, p.lang_pred
        FROM documents d JOIN pred p USING (doc_id)
        WHERE d.text IS NOT NULL AND length(d.text) > 0
          AND octet_length(encode(d.text)) = length(d.text)
    )
    SELECT doc_id, width, height, n_caption_tokens,
           (width * height >= 1024) AS flag_res,
           (width <= 2 * height AND height <= 2 * width) AS flag_aspect,
           (n_caption_tokens BETWEEN 3 AND 40) AS flag_caplen,
           (lang IS NOT NULL AND lang_pred = lang) AS flag_lang,
           ((width * height >= 1024)
            AND (width <= 2 * height AND height <= 2 * width)
            AND (n_caption_tokens BETWEEN 3 AND 40)
            AND (lang IS NOT NULL AND lang_pred = lang)) AS keep
    FROM ic
    """,
    tags=("north-star", "multimodal", "curation"),
)
def curate_image_caption_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style rule-based image–caption pair curation — the multimodal
    twin of curate_funnel_v2: each document becomes an (image, caption)
    pair (image = its text bytes rendered as a grayscale JPEG whose
    dimensions derive deterministically from doc_id, so the fixture spans
    8×8..56×48; caption = the text), then four standard filters compose:

      flag_res    — minimum resolution (width·height ≥ 1024 px)
      flag_aspect — aspect ratio within [1/2, 2] (integer cross-compare)
      flag_caplen — caption length 3..40 whitespace tokens
      flag_lang   — trigram-NB predicted caption language matches the
                    labeled lang (detect_language_trigram; NULL label
                    never matches — a pair without a language is dropped)

    and ``keep`` is their conjunction.  width/height come from a REAL
    encode→decode round trip: the engine's own baseline JPEG codec
    (operators/jpegcodec.py) encodes each tile and the decoded ndarray's
    shape — not the metadata — feeds the rules, so the oracle's
    arithmetic replay of the dimensions also proves the codec preserved
    them.  All rules are integer/boolean-exact (text_gopher_rules
    posture): no float boundary can flip a flag cross-engine.

    Scale: one Arrow-batched mapInPandas per codec direction over the
    image corpus (the documented multimodal envelope), the vocabulary-
    sized language model broadcast into scoring (text.py:205), and
    everything downstream is (id, dims, flags) rows."""
    from collections.abc import Iterator

    import pandas as pd

    from aws_genaric_datapipeline_spark.operators.partitioning import (
        ensure_parallelism,
    )

    (documents,) = load(spark, sf_dir, "documents")
    docs = documents.where(
        F.col("text").isNotNull()
        & (F.length("text") > 0)
        & (F.octet_length("text") == F.length("text"))
    )

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from aws_genaric_datapipeline_spark.operators.jpegcodec import (
            encode_jpeg,
        )

        for pdf in batches:
            blobs, metas = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                w = 8 * (1 + int(did) % 7)
                h = 8 * (1 + (int(did) * 3) % 6)
                raw = (text or "").encode("utf-8")
                n = w * h
                buf = (raw * (n // max(len(raw), 1) + 1))[:n] if raw else bytes(n)
                tile = np.frombuffer(buf, dtype=np.uint8).reshape(h, w)
                blobs.append(encode_jpeg(tile, quality=100))
                metas.append(
                    {"kind": "image", "mime": "image/jpeg", "width": w,
                     "height": h, "duration_ms": 0}
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": blobs, "media_meta": metas}
            )

    def _decode_dims(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aws_genaric_datapipeline_spark.operators.jpegcodec import (
            decode_jpeg,
        )

        for pdf in batches:
            ws, hs = [], []
            for payload in pdf["media"]:
                arr = decode_jpeg(bytes(payload))
                hs.append(int(arr.shape[0]))
                ws.append(int(arr.shape[1]))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "width": ws, "height": hs}
            )

    media = ensure_parallelism(docs.select("doc_id", "text")).mapInPandas(
        _render, schema=M.MEDIA_SCHEMA
    )
    dims = media.mapInPandas(
        _decode_dims, schema="doc_id long, width int, height int"
    )
    preds = X.detect_language_trigram(documents)
    caps = docs.select(
        "doc_id",
        "lang",
        F.size(X.tokens(F.col("text"))).cast("bigint").alias("n_caption_tokens"),
    )
    flag_res = F.col("width") * F.col("height") >= 1024
    flag_aspect = (F.col("width") <= 2 * F.col("height")) & (
        F.col("height") <= 2 * F.col("width")
    )
    flag_caplen = F.col("n_caption_tokens").between(3, 40)
    flag_lang = F.col("lang").isNotNull() & (
        F.col("lang_pred") == F.col("lang")
    )
    return (
        caps.join(dims, "doc_id")
        .join(preds, "doc_id")
        .select(
            "doc_id",
            "width",
            "height",
            "n_caption_tokens",
            flag_res.alias("flag_res"),
            flag_aspect.alias("flag_aspect"),
            flag_caplen.alias("flag_caplen"),
            flag_lang.alias("flag_lang"),
            (flag_res & flag_aspect & flag_caplen & flag_lang).alias("keep"),
        )
    )


# Quality score in exact integer basis points — same arithmetic as
# operators/text.py quality_score_bp (shared by the quality + curation
# oracles).
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
    "curate_top_quality_per_lang",
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
        ),
        ranked AS (
            SELECT *, percent_rank() OVER (PARTITION BY lang
                       ORDER BY quality_bp DESC, doc_id) AS pr
            FROM scored
        )
        SELECT doc_id, lang, quality_bp FROM ranked WHERE pr <= 0.5
    """,
    tags=("north-star", "text", "curation"),
)
def curate_top_quality_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The core curation shape: keep the top half of documents by quality
    WITHIN each language (global thresholds starve low-resource languages).
    Integer-exact scores + unique-id tie-break make the kept set
    bit-reproducible — rerunning curation after an incremental ingest keeps
    a superset, never a reshuffled set.

    Scale: one shuffle on lang for the percent_rank window; lang is
    low-cardinality, so skew is the concern — at 100 TB replace percent_rank
    with an approx-quantile threshold per lang (two tiny aggregates, no
    per-lang global sort).
    """
    from pyspark.sql import Window

    (documents,) = load(spark, sf_dir, "documents")
    scored = documents.select(
        "doc_id", "lang", X.quality_score_bp(F.col("text")).alias("quality_bp")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("quality_bp"), "doc_id")
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .where(F.col("pr") <= 0.5)
        .select("doc_id", "lang", "quality_bp")
    )


def _winnow_oracle_sql(
    k: int = 25, w: int = 10, min_shared: int = 2, max_doc_freq: int = 50
) -> str:
    """Oracle SQL replaying the ENTIRE winnowing pipeline bit-for-bit in
    DuckDB (operators/text.py winnow_batch_fn + operators/dedup.py
    winnow_near_pairs):

      h64  — the base-B polynomial k-gram rolling hash over the NORMALIZED
             text's bytes, B = FNV-1a prime, arithmetic wrapping mod 2^64:
             an exact-HUGEINT Horner list_reduce per position (list_sum
             degrades to DOUBLE and loses the low bits — measured);
      wmin — min hash of each window of w consecutive positions (ROWS
             frame), kernel semantics for short hash runs included (a doc
             with fewer than w k-gram positions yields its global min);
      fps  — distinct per-doc fingerprints, re-signed to int64 exactly as
             numpy's .view(int64);
      df cap + shared-fingerprint pair counts as in winnow_near_pairs.

    Both engines restrict to ASCII documents whose normalized text has at
    least k characters (codepoint == UTF-8 byte, no sub-k partial-hash
    branch), which today is every generated document."""
    u64 = 18446744073709551616
    return f"""
        WITH nd AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
            FROM documents
            WHERE text IS NOT NULL AND octet_length(encode(text)) = length(text)
        ),
        docs AS (SELECT doc_id, nt, length(nt) AS n FROM nd WHERE length(nt) >= {k}),
        pos AS (
            SELECT doc_id, n, nt, CAST(t.i AS INT) AS p
            FROM docs, UNNEST(range(1, n - {k} + 2)) AS t(i)
        ),
        h64 AS (
            SELECT doc_id, n, p,
                   list_reduce(
                       list_prepend(0::HUGEINT,
                           list_transform(range(0, {k}),
                               j -> CAST(unicode(substr(nt, p + CAST(j AS INT), 1))
                                         AS HUGEINT))),
                       (acc, c) -> (acc * {1099511628211} + c) % {u64}::HUGEINT) AS hu
            FROM pos
        ),
        wmin AS (
            SELECT doc_id, n, p,
                   min(hu) OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS m
            FROM h64
        ),
        fps AS (
            SELECT DISTINCT doc_id,
                   CAST(CASE WHEN m < {u64 // 2}::HUGEINT THEN m
                        ELSE m - {u64}::HUGEINT END AS BIGINT) AS fp
            FROM wmin
            WHERE p <= greatest(n - {k} + 1 - {w} + 1, 1)
        ),
        freq AS (SELECT fp, count(*) AS dfreq FROM fps GROUP BY fp),
        rare AS (
            SELECT fps.doc_id, fps.fp FROM fps JOIN freq USING (fp)
            WHERE dfreq <= {max_doc_freq}
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS shared_fps
        FROM rare a JOIN rare b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {min_shared}
    """


@query("dedup_winnow_pairs", oracle=_winnow_oracle_sql(), tags=("north-star", "dedup"))
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by shared winnowing fingerprints (rolling-hash
    k-grams, min-per-window — the MOSS algorithm).

    FULLY oracle-checked (rows-only through r06-early): the rolling hash
    is a base-B polynomial mod 2^64 over the normalized text's bytes, so
    DuckDB replays the whole sketch — hash, window minima, distinct
    fingerprints, document-frequency cap and shared-pair counts — in
    exact HUGEINT arithmetic (_winnow_oracle_sql).  Both engines restrict
    to ASCII docs with >= k normalized chars (every generated doc today;
    keeps codepoint == byte and skips the sub-k partial-hash branch under
    corpus regeneration).  Precision vs exact Jaccard and the substring
    guarantee remain pytest-pinned (TestWinnowing) and driver-checked
    (dedup_sketch_guarantees)."""
    (documents,) = load(spark, sf_dir, "documents")
    from aws_genaric_datapipeline_spark.operators.text import normalize_text

    docs = documents.where(
        F.col("text").isNotNull()
        & (F.octet_length("text") == F.length("text"))
        & (F.length(normalize_text(F.col("text"))) >= 25)
    )
    return D.winnow_near_pairs(docs)


def _pagerank_oracle(iterations: int = 5, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank oracle (standard SQL forbids
    aggregation inside a recursive CTE, so the five synchronous updates
    are chained CTEs r0..r5 — same uniform start and drop-dangling-mass
    variant as operators/graph.py pagerank)."""
    base = f"""
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
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON inter.id_a = sa.did
            JOIN sizes sb ON inter.id_b = sb.did
            WHERE round(n_inter / CAST(sa.ss + sb.ss - n_inter AS DOUBLE), 4) >= 0.5
        ),
        edges AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION
            SELECT id_b, id_a FROM pairs
        ),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        nn AS (SELECT count(*) AS n FROM nodes),
        deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        r0 AS (SELECT node, 1.0 / n AS rank FROM nodes, nn)"""
    for i in range(1, iterations + 1):
        base += f""",
        r{i} AS (
            SELECT x.node, (1 - {damping}) / nn.n + {damping} * coalesce(s.c, 0) AS rank
            FROM nodes x
            CROSS JOIN nn
            LEFT JOIN (
                SELECT e.dst, sum(r.rank / d.deg) AS c
                FROM edges e
                JOIN r{i - 1} r ON r.node = e.src
                JOIN deg d ON d.src = e.src
                GROUP BY e.dst
            ) s ON s.dst = x.node)"""
    return base + f"""
        SELECT CAST(node AS BIGINT) AS node, round(rank, 6) AS rank
        FROM r{iterations}
    """


@query(
    "graph_pagerank_centrality",
    oracle=_pagerank_oracle(),
    tags=("north-star", "graph", "dedup"),
)
def graph_pagerank_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-duplicate graph (exact trigram-
    Jaccard edges ≥ 0.5, symmetrized): an iterative distributed algorithm
    verified against a declaratively-unrolled oracle.  Ranks give a
    centrality-based canonical-document pick for dedup clusters — the
    doc most similar to the most others — vs min-id's arbitrary pick."""
    from aws_genaric_datapipeline_spark.operators.graph import pagerank

    (documents,) = load(spark, sf_dir, "documents")
    # materialize the expensive exact-Jaccard edge build once — the
    # symmetrizing union below references it twice
    pairs = D.jaccard_pairs(documents, n=3, threshold=0.5, hash_tokens=True).localCheckpoint(eager=True)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    ranks = pagerank(edges, iterations=5)
    return ranks.select(
        F.col("node").cast("bigint").alias("node"), F.round("rank", 6).alias("rank")
    )


@query(
    "dedup_sketch_guarantees",
    oracle="""
        WITH nd AS (
            SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
            FROM documents
            WHERE text IS NOT NULL
              AND {bucket_doc}
        ),
        g AS (
            SELECT DISTINCT doc_id AS did, substr(nt, CAST(t.i AS INT), 34) AS gram
            FROM nd, UNNEST(range(1, greatest(length(nt) - 32, 1))) AS t(i)
            WHERE length(nt) >= 34
        ),
        gp AS (
            SELECT DISTINCT a.did AS id_a, b.did AS id_b
            FROM g a JOIN g b ON a.gram = b.gram AND a.did < b.did
        )
        SELECT 'winnow_substring_recall' AS method,
               (SELECT count(*) FROM gp) AS n_anchor, true AS contract_ok
        UNION ALL
        SELECT 'simhash_hamming_complete',
               (SELECT count(*) FROM gp), true
    """.replace("{bucket_doc}", _DUCK_MD5_BUCKET10.format(col="doc_id")),
    tags=("north-star", "dedup"),
)
def dedup_sketch_guarantees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable DETERMINISTIC contracts for the two sketch paths
    whose pair outputs stay rows-only (engine-seeded hashes aren't
    SQL-reproducible) — the dedup analog of sim_ann_recall_guarantees:

      winnow_substring_recall — the winnowing guarantee (Schleimer et al.,
        SIGMOD'03): any pair of documents whose NORMALIZED texts share a
        substring of length >= w + k - 1 = 34 must share at least one
        selected fingerprint.  The guaranteed-pair set is exactly the
        pairs sharing a 34-character gram, which BOTH engines compute
        independently (Spark: substring-window explode; DuckDB: substr/UNNEST)
        — so n_anchor is fully oracle-checked, and contract_ok asserts
        winnow_near_pairs(min_shared=1, no df cap) covers every such pair.

      simhash_hamming_complete — the pigeonhole contract of the 4x16-bit
        banding: EVERY pair at hamming distance <= 3 must be emitted by
        simhash_near_pairs.  Ground truth is a brute-force all-pairs
        hamming scan over the 64-bit signature frame.

    BOTH ground truths audit a deterministic md5-bucketed 10% SUB-CORPUS
    (doc_id hash bucket 0), not the full table: the winnow anchor set is
    an uncapped 34-char-gram self-join and the simhash ground truth a
    signature crossJoin — quadratic audit-tier scans whose cost the
    sampling cuts ~100× while each contract stays EXACT per sampled pair
    (fingerprints and signatures are per-document, and no df-cap/pruning
    is in play, so restricting both sides to the sample equals the
    full-corpus contract restricted to sample pairs).  The FULL-corpus
    forms remain pytest audits (TestSketchContractsFullCorpus).

    Unlike the probabilistic ANN recall bounds, both contracts are exact
    consequences of the algorithms — a red row is an implementation bug,
    not corpus noise, on ANY driver-regenerated corpus."""
    from aws_genaric_datapipeline_spark.operators.text import normalize_text

    (documents,) = load(spark, sf_dir, "documents")
    docs = documents.where(
        F.col("text").isNotNull() & _md5_bucket10(F.col("doc_id"))
    )

    # -- winnow: guaranteed pairs = pairs sharing a normalized 34-char gram
    t = 34  # w + k - 1 for the default winnow_near_pairs(k=25, w=10)
    nd = docs.select("doc_id", normalize_text(F.col("text")).alias("nt"))
    grams = nd.where(F.length("nt") >= t).select(
        F.col("doc_id").alias("did"),
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.length("nt") - (t - 1)),
                    lambda i: F.col("nt").substr(i, F.lit(t)),
                )
            )
        ).alias("gram"),
    )
    gp = (
        grams.select(F.col("did").alias("id_a"), "gram")
        .join(grams.select(F.col("did").alias("id_b"), "gram"), "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
        .localCheckpoint(eager=True)  # feeds both the count and the anti-join
    )
    wp = D.winnow_near_pairs(docs, min_shared=1, max_doc_freq=1 << 40).select(
        "id_a", "id_b"
    )
    n_anchor = gp.agg(F.count(F.lit(1)).alias("n_anchor"))
    w_missing = gp.join(wp, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_missing")
    )
    w_row = n_anchor.crossJoin(w_missing).select(
        F.lit("winnow_substring_recall").alias("method"),
        "n_anchor",
        (F.col("n_missing") == 0).alias("contract_ok"),
    )

    # -- simhash: brute-force hamming<=3 ground truth vs the banded operator
    # ONE signature pass feeds both sides (simhash_near_pairs ≡
    # hamming_near_pairs over the simhash frame — its generic form); the
    # eager checkpoint pins the 64-aggregate reduction to one evaluation.
    sig = D.simhash(docs).localCheckpoint(eager=True)
    ham = (
        sig.select(F.col("did").alias("id_a"), F.col("simhash").alias("sh_a"))
        .crossJoin(sig.select(F.col("did").alias("id_b"), F.col("simhash").alias("sh_b")))
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))) <= 3)
        .select("id_a", "id_b")
    )
    sp = D.hamming_near_pairs(sig, id_col="did", hash_col="simhash").select(
        "id_a", "id_b"
    )
    s_missing = ham.join(sp, ["id_a", "id_b"], "left_anti").agg(
        F.count(F.lit(1)).alias("n_missing")
    )
    s_row = n_anchor.crossJoin(s_missing).select(
        F.lit("simhash_hamming_complete").alias("method"),
        "n_anchor",
        (F.col("n_missing") == 0).alias("contract_ok"),
    )
    return w_row.unionAll(s_row)


@query(
    "dedup_keep_best_canonical",
    oracle=f"""
        WITH RECURSIVE sh AS (
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
            SELECT id_a, id_b
            FROM inter
            JOIN sizes sa ON inter.id_a = sa.did
            JOIN sizes sb ON inter.id_b = sb.did
            WHERE round(n_inter / CAST(sa.ss + sb.ss - n_inter AS DOUBLE), 4) >= 0.5
        ),
        edges AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION ALL
            SELECT id_b, id_a FROM pairs
        ),
        reach(node, label) AS (
            SELECT s, s FROM edges
            UNION
            SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
        ),
        comp AS (SELECT node, min(label) AS cid FROM reach GROUP BY node),
        base AS (
            SELECT doc_id,
                   length(trim(text)) AS n_chars,
                   len({_DUCK_TOKS}) AS n_toks,
                   length(regexp_replace(trim(text), '[^A-Za-z]', '', 'g')) AS n_alpha
            FROM documents
        ),
        scored AS (
            SELECT d.doc_id,
                   CAST(coalesce(c.cid, d.doc_id) AS BIGINT) AS cluster_id,
                   {_DUCK_QUALITY_BP} AS quality_bp
            FROM base d LEFT JOIN comp c ON c.node = d.doc_id
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (PARTITION BY cluster_id
                       ORDER BY quality_bp DESC, doc_id) AS rn,
                   count(*) OVER (PARTITION BY cluster_id) AS csz
            FROM scored
        )
        SELECT doc_id, cluster_id, quality_bp,
               CAST(csz - 1 AS BIGINT) AS n_pruned
        FROM ranked WHERE rn = 1
    """,
    tags=("north-star", "dedup", "curation"),
)
def dedup_keep_best_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dedup ENDGAME a pretraining pipeline actually runs:
    near-dup pairs (exact trigram-Jaccard >= 0.5) -> transitive clusters
    (distributed connected components) -> keep the HIGHEST-QUALITY member
    of each cluster (integer quality_bp, doc_id tie-break) instead of
    min-id's arbitrary pick; singletons survive as their own canonical.
    Returns one row per surviving document with how many near-dups it
    absorbed — the frame downstream training reads.

    Composition of three individually-verified operators (jaccard_pairs,
    dedup_cluster_assignments, quality_score_bp); the oracle replays the
    whole funnel declaratively (recursive-CTE closure + window arg-max).

    Scale: pair build is the prefix-filtered SSJoin; components are
    hash-min pointer-jumping (O(log d) rounds, keys-only shuffles); the
    final arg-max is one window over (cluster_id) — clusters are small by
    construction, so no skew concern.  Only ids, 64-bit scores and labels
    shuffle after the first projection."""
    from pyspark.sql import Window

    from aws_genaric_datapipeline_spark.operators.graph import (
        dedup_cluster_assignments,
    )

    (documents,) = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(documents, n=3, threshold=0.5, hash_tokens=True)
    clusters = dedup_cluster_assignments(pairs).select("doc_id", "cluster_id")
    scored = documents.select(
        "doc_id", X.quality_score_bp(F.col("text")).alias("quality_bp")
    )
    labeled = scored.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).cast("bigint").alias("cluster_id"),
        "quality_bp",
    )
    w = Window.partitionBy("cluster_id")
    ranked = labeled.select(
        "*",
        F.row_number()
        .over(w.orderBy(F.desc("quality_bp"), "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("csz"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "doc_id",
        "cluster_id",
        "quality_bp",
        (F.col("csz") - 1).cast("bigint").alias("n_pruned"),
    )


@query(
    "dedup_semantic_embeddings",
    oracle="""
        WITH RECURSIVE base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        unit AS (
            SELECT vec_id,
                   CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v
                        ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                   END AS u
            FROM base
        ),
        {_LSH_SD_BUCKETS},
        cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM buck a JOIN buck b
              ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
        ),
        pairs AS (
            SELECT id_a, id_b
            FROM cand
            JOIN base x ON x.vec_id = cand.id_a
            JOIN base y ON y.vec_id = cand.id_b
            WHERE round(list_cosine_similarity(x.v, y.v), 4) >= 0.45
        ),
        edges AS (
            SELECT id_a AS s, id_b AS d FROM pairs
            UNION ALL
            SELECT id_b, id_a FROM pairs
        ),
        reach(node, label) AS (
            SELECT s, s FROM edges
            UNION
            SELECT e.d, r.label FROM reach r JOIN edges e ON e.s = r.node
        ),
        comp AS (SELECT node, min(label) AS cid FROM reach GROUP BY node),
        cm AS (
            SELECT cid, g.pos AS pos, avg(u[g.pos]) AS m
            FROM comp
            JOIN unit ON unit.vec_id = comp.node,
            UNNEST(generate_series(1, 64)) AS g(pos)
            GROUP BY 1, 2
        ),
        cvecs AS (SELECT cid, list(m ORDER BY pos) AS cv FROM cm GROUP BY cid),
        scored AS (
            SELECT comp.node AS vid, comp.cid,
                   round(list_dot_product(u, cv), 4) AS centrality,
                   count(*) OVER (PARTITION BY comp.cid) AS csz
            FROM comp
            JOIN unit ON unit.vec_id = comp.node
            JOIN cvecs ON cvecs.cid = comp.cid
        )
        SELECT CAST(vid AS BIGINT) AS vec_id,
               CAST(cid AS BIGINT) AS cluster_id,
               CAST(csz AS BIGINT) AS cluster_size,
               centrality
        FROM (SELECT *, row_number() OVER (PARTITION BY cid
                  ORDER BY centrality DESC, vid) AS rn FROM scored)
        WHERE rn = 1
    """.replace(
        "{_LSH_SD_BUCKETS}",
        _lsh_buckets_adaptive_cte(
            num_tables=12, target_bucket_size=64, max_bucket_width=256
        ),
    ),
    tags=("north-star", "similarity", "dedup", "graph"),
)
def dedup_semantic_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup (the SemDeDup recipe, Abbas et al. 2023): embedding
    near-duplicate pairs -> transitive clusters -> keep the member MOST
    SIMILAR TO ITS CLUSTER CENTROID (round-4 dot with the mean unit
    vector, vec_id tie-break) — text-level dedup misses paraphrases and
    re-encodings; this catches them from the embedding geometry.

    Composition of verified operators: CORPUS-ADAPTIVE hyperplane-LSH
    near-pairs (num_planes derived from the corpus count so expected
    bucket width stays ~64 at any scale — round 6's fixed 8-buckets/table
    was the one quadratic-at-scale shape left; the 256-wide bucket guard
    bounds adversarial skew), distributed connected components
    (operators/graph.py), positional-mean centroids, zip_with dot
    re-rank.  The oracle replays EVERYTHING declaratively: the same
    fixed-stride splitmix64 hyperplane literals, the clamp(ceil(log2(
    N/64))) plane-count formula over COUNT(*), the low-bit bucket mask,
    the width guard, (table, bucket) candidate join, exact-cosine
    verification, recursive-CTE closure, per-cluster positional centroid
    means and the centrality arg-max — candidate generation included, not
    just verification.  Ranking compares ROUNDED
    centrality (+ id tie-break) on both engines, so cross-engine float
    noise (~1e-16 summation-order) cannot flip the survivor except on an
    exact round-4 boundary — the same negligible class as the IVF oracle.

    Scale: pairs/components shuffle ids + 64-bit keys only; the centroid
    stage shuffles (cluster, pos, x) narrow rows — at 100 TB the explode
    is dim x members rows, the same shape embed_label_centroids plan-gates;
    clusters are near-dup sized (small), so the final window has no skew."""
    from pyspark.sql import Window

    from aws_genaric_datapipeline_spark.operators.graph import connected_components
    from aws_genaric_datapipeline_spark.operators.similarity import with_unit_vectors

    (embeddings,) = load(spark, sf_dir, "embeddings")
    pairs = S.cosine_near_pairs(
        embeddings,
        threshold=0.45,
        num_tables=12,
        target_bucket_size=64,
        max_bucket_width=256,
    ).select("id_a", "id_b")
    comp = connected_components(pairs, src="id_a", dst="id_b")
    unit = with_unit_vectors(embeddings, "embedding").select(
        F.col("vec_id"), F.col("unit_vec")
    )
    members = comp.join(unit, comp["node"] == unit["vec_id"]).select(
        "vec_id", F.col("component").alias("cluster_id"), "unit_vec"
    )
    pe = members.select(
        "cluster_id", F.posexplode("unit_vec").alias("pos", "x")
    )
    cvecs = (
        pe.groupBy("cluster_id", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("cluster_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m
            ).alias("cv")
        )
    )
    dot = F.aggregate(
        F.zip_with("unit_vec", "cv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = members.join(cvecs, "cluster_id").select(
        "vec_id",
        "cluster_id",
        F.round(dot, 4).alias("centrality"),
    )
    w = Window.partitionBy("cluster_id")
    ranked = scored.select(
        "*",
        F.row_number().over(w.orderBy(F.desc("centrality"), "vec_id")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("csz"),
    )
    return ranked.where(F.col("rn") == 1).select(
        "vec_id",
        "cluster_id",
        F.col("csz").cast("bigint").alias("cluster_size"),
        "centrality",
    )


@query(
    "text_unigram_logprob_quality",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents
        ),
        tc AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        tot AS (SELECT SUM(c) AS n FROM tc),
        perdoc AS (
            SELECT t.doc_id, COUNT(*) AS cnt,
                   round(avg(ln(tc.c / (SELECT n FROM tot))), 4) AS alp
            FROM toks t JOIN tc ON tc.tok = t.tok
            GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(p.cnt, 0) AS BIGINT) AS n_tokens,
               p.alp AS avg_logprob
        FROM documents d LEFT JOIN perdoc p ON p.doc_id = d.doc_id
    """,
    tags=("north-star", "text"),
)
def text_unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality scoring — the perplexity-proxy
    filter of CCNet-style curation (Wenzek et al. 2020 use a KenLM
    n-gram model; the unigram MLE is its deterministic, SQL-replayable
    core): train token log-probabilities on the corpus itself (one
    count aggregation), score every document by the MEAN log-prob of
    its tokens.  Very negative scores = rare-token-heavy documents
    (gibberish, OCR noise, exotic boilerplate) — the usual cut is a
    percentile threshold downstream.  Empty documents surface with
    n_tokens = 0 and NULL score (no silent drop).

    Scale shape: the model IS a (token, count) aggregate — vocabulary-
    sized, not corpus-sized — and it BROADCASTS into the scoring join, so
    the corpus never shuffles on token (whose stopword keys are the
    textbook skew case) and scoring is map-side.  If a corpus's
    vocabulary ever exceeds the broadcast threshold, drop the hint and
    let AQE skew-join split the hot keys — same result, one extra
    shuffle.  Every value is a count ratio — exact in doubles below
    2^53 — so the only cross-engine noise is ln()/summation-order ulps,
    absorbed by round-4.
    """
    (documents,) = load(spark, sf_dir, "documents")
    toks = documents.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("tok")
    )
    tc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = tc.agg(F.sum("c").alias("n"))
    perdoc = (
        toks.join(F.broadcast(tc), "tok")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", F.log(F.col("c") / F.col("n")).alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("lp"), 4).alias("alp"),
        )
    )
    return (
        documents.select("doc_id")
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("n_tokens"),
            F.col("alp").alias("avg_logprob"),
        )
    )


@query(
    "report_source_kl_divergence",
    oracle=f"""
        WITH toks AS (SELECT source, unnest({_DUCK_TOKS}) AS tok FROM documents),
        sc AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
        st AS (SELECT source, SUM(c) AS n FROM sc GROUP BY 1),
        cc AS (SELECT tok, SUM(c) AS c2 FROM sc GROUP BY 1),
        ct AS (SELECT SUM(c2) AS n2 FROM cc)
        SELECT sc.source,
               CAST(st.n AS BIGINT) AS n_tokens,
               round(SUM((sc.c / st.n) * ln((sc.c / st.n)
                     / (cc.c2 / (SELECT n2 FROM ct)))), 4) AS kl_nats
        FROM sc JOIN st USING (source) JOIN cc USING (tok)
        GROUP BY sc.source, st.n
    """,
    tags=("north-star", "text", "diagnostics"),
)
def report_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distribution drift: KL(P_source ‖ P_corpus) over unigram
    token distributions, in nats — the data-mixing diagnostic that flags a
    source whose language diverges from the blend (domain shift, encoding
    rot, a scraper gone wrong) before it skews training.  KL is finite by
    construction here: every source token occurs in the corpus
    distribution (P ≪ Q), so no smoothing is needed.

    Scale shape: everything reduces to (source, token) and (token) count
    aggregates — two shuffles over token keys, vocabulary-sized outputs,
    corpus never re-shuffled; the final per-source sum is a handful of
    rows.  Same float-parity posture as the unigram scorer (exact count
    ratios; round-4 absorbs ln/summation ulps).
    """
    (documents,) = load(spark, sf_dir, "documents")
    toks = documents.select(
        "source", F.explode(X.tokens(F.col("text"))).alias("tok")
    )
    sc = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    st = sc.groupBy("source").agg(F.sum("c").alias("n"))
    cc = sc.groupBy("tok").agg(F.sum("c").alias("c2"))
    ct = cc.agg(F.sum("c2").alias("n2"))
    p = F.col("c") / F.col("n")
    q = F.col("c2") / F.col("n2")
    return (
        sc.join(st, "source")
        .join(cc, "tok")
        .crossJoin(F.broadcast(ct))
        .groupBy("source", "n")
        .agg(F.round(F.sum(p * F.log(p / q)), 4).alias("kl_nats"))
        .select(
            "source",
            F.col("n").cast("bigint").alias("n_tokens"),
            "kl_nats",
        )
    )


def _minhash_index_oracle(
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
    split_mod: int = 5,
    batch_pred: str | None = None,
    corpus_pred: str | None = None,
) -> str:
    """DuckDB replay of the INCREMENTAL MinHash index path
    (operators/dedup.py minhash_build_index + minhash_query_index): per-doc
    signatures (no group collapse — the index stores every doc), the same
    md5-31-bit base hash / Carter-Wegman mins / md5-60-bit band keys, the
    batch×corpus band join, and exact-Jaccard verification.  The engine
    fuses (band, bh) into one xxhash64 key for single-column bucketing and
    verifies on xxhash64'd shingle arrays; both differ from this replay
    only by 64-bit-collision classes that are documented-negligible (a
    fused-key collision can only add a candidate; verification values are
    identical modulo distinct-shingle hash collisions)."""
    r = num_hashes // bands
    sig_mins = ", ".join(
        f"min((h31 * {D._MH_A[i]} + {D._MH_B[i]}) % {D._MH_P}) AS s{i}"
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT did, {b} AS band, ('0x' || substr(md5("
        + " || ',' || ".join(f"CAST(s{b * r + j} AS VARCHAR)" for j in range(r))
        + "), 1, 15))::BIGINT AS bh FROM sig"
        for b in range(bands)
    )
    batch_pred = batch_pred or f"b.did % {split_mod} = 0"
    corpus_pred = corpus_pred or f"c.did % {split_mod} <> 0"
    return f"""
        WITH docs AS (
            SELECT doc_id AS did, list_sort(list_distinct({_DUCK_TRIGRAMS})) AS sh
            FROM documents
            WHERE len({_DUCK_TRIGRAMS}) > 0
        ),
        tok AS (SELECT did, t.tok FROM docs, UNNEST(sh) AS t(tok)),
        h AS (SELECT did, ('0x' || substr(md5(tok), 1, 8))::BIGINT // 2 AS h31 FROM tok),
        sig AS (SELECT did, {sig_mins} FROM h GROUP BY did),
        banded AS ({band_selects}),
        cand AS (
            SELECT DISTINCT b.did AS batch_id, c.did AS corpus_id
            FROM banded b JOIN banded c
              ON b.band = c.band AND b.bh = c.bh
            WHERE ({batch_pred}) AND ({corpus_pred})
        ),
        ver AS (
            SELECT batch_id, corpus_id,
                   round(len(list_intersect(a.sh, b.sh)) /
                         CAST(len(a.sh) + len(b.sh)
                              - len(list_intersect(a.sh, b.sh)) AS DOUBLE),
                         4) AS jaccard
            FROM cand
            JOIN docs b ON b.did = cand.batch_id
            JOIN docs a ON a.did = cand.corpus_id
        )
        SELECT CAST(batch_id AS BIGINT) AS batch_id,
               CAST(corpus_id AS BIGINT) AS corpus_id,
               jaccard
        FROM ver WHERE jaccard >= {threshold}
    """


@query(
    "dedup_incremental_minhash",
    oracle=_minhash_index_oracle(),
    tags=("north-star", "dedup", "incremental"),
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL near-duplicate dedup: sketch the standing corpus once
    into a persisted, bucketed MinHash index (band keys + verify arrays),
    then near-dedup an incoming batch against it at per-batch cost — the
    ingest-gate shape a 100 TB pipeline actually runs, where re-sketching
    the corpus per batch (what one-shot dedup_minhash_lsh would cost) is
    a non-starter.  Corpus = doc_id % 5 != 0, batch = the rest; returns
    (batch_id, corpus_id, jaccard ≥ 0.8) cross-pairs.

    Both index scans read co-located with ZERO corpus-side Exchange
    (plan-gated in tests/test_plans.py::TestMinhashIndex, with one-shot
    equivalence and append==rebuild contracts).  The oracle replays the
    full per-doc sketch — base hashes, signature mins, band keys, the
    batch×corpus band join, exact verification — so the index path's
    VALUES are driver-checked, not just its plan shape.  The in-query
    index build is the ingest-side cost made visible; production pays it
    once and appends per batch (mode="append")."""
    (documents,) = load(spark, sf_dir, "documents")
    corpus = documents.where(F.col("doc_id") % 5 != 0)
    batch = documents.where(F.col("doc_id") % 5 == 0)
    D.minhash_build_index(corpus, "mh_inc_bands_idx", "mh_inc_toks_idx")
    return D.minhash_query_index(
        spark, batch, "mh_inc_bands_idx", "mh_inc_toks_idx", threshold=0.8
    )


@query(
    "dedup_index_erasure",
    oracle=_minhash_index_oracle(
        batch_pred="b.did % 20 = 3",
        corpus_pred="c.did % 20 <> 3",
    ),
    tags=("north-star", "dedup", "privacy", "incremental"),
)
def dedup_index_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure CASCADED into the persisted near-dup index
    (operators/dedup.py erase_from_minhash_index): build the MinHash
    index over the FULL corpus, erase the victim set (doc_id % 20 = 3)
    from both bucketed tables in place, then re-submit the victims' text
    as a fresh batch.  A correct cascade matches them only against
    SURVIVING near-duplicates — never against their own ghost rows.

    The oracle replays the index path with corpus = survivors, i.e. it
    computes build(corpus \\ victims) directly — so a hash match proves
    the erased index is equivalent to a rebuilt one (the contract
    tests/test_erasure.py also asserts row-for-row on the tables
    themselves, plus the fingerprint-refcount and bloom-rebuild ones).

    Scale: erasure rewrites the bucketed tables minus a broadcast victim
    set — one co-located scan each, no corpus re-sketch; at 100 TB
    rewrite only victim-bearing files via the txn log."""
    (documents,) = load(spark, sf_dir, "documents")
    victims = documents.where(F.col("doc_id") % 20 == 3)
    D.minhash_build_index(documents, "mh_erase_bands_idx", "mh_erase_toks_idx")
    D.erase_from_minhash_index(
        spark,
        "mh_erase_bands_idx",
        "mh_erase_toks_idx",
        victims.select(F.col("doc_id").alias("did")),
    )
    return D.minhash_query_index(
        spark, victims, "mh_erase_bands_idx", "mh_erase_toks_idx", threshold=0.8
    )


@query(
    "dedup_incremental_semantic",
    oracle="""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        {_LSH_INC_BUCKETS},
        cand AS (
            SELECT DISTINCT b.vec_id AS batch_id, c.vec_id AS corpus_id
            FROM buck b JOIN buck c
              ON b.tbl = c.tbl AND b.bucket = c.bucket
            WHERE b.vec_id % 4 = 0 AND c.vec_id % 4 <> 0
        )
        SELECT CAST(batch_id AS BIGINT) AS batch_id,
               CAST(corpus_id AS BIGINT) AS corpus_id,
               round(list_cosine_similarity(x.v, y.v), 4) AS cosine_sim
        FROM cand
        JOIN base x ON x.vec_id = cand.batch_id
        JOIN base y ON y.vec_id = cand.corpus_id
        WHERE round(list_cosine_similarity(x.v, y.v), 4) >= 0.45
    """.replace(
        "{_LSH_INC_BUCKETS}",
        _lsh_buckets_adaptive_cte(
            num_tables=12,
            target_bucket_size=64,
            count_where="WHERE vec_id % 4 <> 0",
        ),
    ),
    tags=("north-star", "similarity", "dedup", "incremental"),
)
def dedup_incremental_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL semantic near-dup gate: bucket the standing embedding
    corpus once into a persisted LSH index (fused bucket keys + unit
    vectors, both bucketed tables), then check an incoming embedding
    batch against it at per-batch cost — the ingest-side SemDeDup check
    that never re-shuffles the corpus (zero corpus-side Exchange,
    plan-gated with direct-path equivalence in
    tests/test_plans.py::TestLshIndex).  Corpus = vec_id % 4 != 0, batch
    = the rest; plane count is derived adaptively FROM THE CORPUS (the
    oracle's nplanes CTE counts the same filtered set) and threaded to
    the query path, since bucket ids are a function of it.  Returns
    (batch_id, corpus_id, cosine ≥ 0.45) cross-pairs; candidate
    generation AND verification are value-replayed by the oracle (fused
    xxhash64 bucket keys differ from the replay only by the documented
    2^-64 add-a-candidate collision class).  The in-query build is the
    ingest cost made visible; production builds once and appends."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    corpus = embeddings.where(F.col("vec_id") % 4 != 0)
    batch = embeddings.where(F.col("vec_id") % 4 == 0)
    planes = S.lsh_build_index(
        corpus,
        "lsh_inc_buckets_idx",
        "lsh_inc_vecs_idx",
        num_tables=12,
        target_bucket_size=64,
    )
    return S.lsh_query_index(
        spark,
        batch,
        "lsh_inc_buckets_idx",
        "lsh_inc_vecs_idx",
        planes,
        num_tables=12,
        threshold=0.45,
    )


@query(
    "dedup_incremental_simhash",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id AS did, t.tok
            FROM documents, UNNEST({_DUCK_TOKS}) AS t(tok)
        ),
        th AS (
            SELECT did,
                   ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h_hi,
                   ('0x' || substr(md5(tok), 9, 8))::BIGINT AS h_lo
            FROM tok
        ),
        bits AS (
            SELECT did, CAST(g.i AS INT) AS bit,
                   sum(CASE WHEN (CASE WHEN g.i < 32 THEN h_lo >> CAST(g.i AS INT)
                                  ELSE h_hi >> CAST(g.i - 32 AS INT) END) & 1 = 1
                       THEN 1 ELSE -1 END) AS s
            FROM th, UNNEST(range(0, 64)) AS g(i)
            GROUP BY 1, 2
        ),
        sim AS (
            SELECT did,
                   CAST(CASE WHEN t >= 9223372036854775808::HUGEINT
                        THEN t - 18446744073709551616::HUGEINT ELSE t END AS BIGINT)
                       AS simhash
            FROM (SELECT did,
                         coalesce(sum(CASE WHEN s > 0
                             THEN (1::HUGEINT << bit) ELSE 0::HUGEINT END), 0) AS t
                  FROM bits GROUP BY did)
        )
        SELECT b.did AS batch_id, a.did AS corpus_id,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        FROM sim b JOIN sim a
          ON b.did % 4 = 0 AND a.did % 4 <> 0
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    tags=("north-star", "dedup", "incremental"),
)
def dedup_incremental_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SimHash screen: fingerprint the standing corpus once
    into a persisted banded index, then hamming-screen an incoming batch
    against it — the cheapest per-batch near-dup gate (64 bits per corpus
    doc, zero corpus-side Exchange; plan-gated with one-shot equivalence
    in tests/test_plans.py::TestSimhashIndex).  Corpus = doc_id % 4 != 0,
    batch = the rest; returns (batch_id, corpus_id, hamming ≤ 3).

    The oracle recomputes every fingerprint from md5 token halves and
    emits the BRUTE-FORCE cross-pair hamming set — equality proves the
    index's banding pigeonhole-complete and its verification sound on
    every driver corpus, the same contract dedup_simhash_pairs pins for
    the one-shot path.  In-query build = visible ingest cost; production
    appends per batch."""
    (documents,) = load(spark, sf_dir, "documents")
    corpus = documents.where(F.col("doc_id") % 4 != 0)
    batch = documents.where(F.col("doc_id") % 4 == 0)
    D.simhash_build_index(corpus, "sh_inc_chunks_idx", "sh_inc_sigs_idx")
    return D.simhash_query_index(
        spark, batch, "sh_inc_chunks_idx", "sh_inc_sigs_idx", max_hamming=3
    )


_LSH_EDGE_CTE = """
        base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                 FROM embeddings),
        buck AS ({_LSH_NP_BUCKETS}),
        cand AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM buck a JOIN buck b
              ON a.tbl = b.tbl AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id
        ),
        e AS (
            SELECT id_a AS u, id_b AS v
            FROM cand
            JOIN base x ON x.vec_id = cand.id_a
            JOIN base y ON y.vec_id = cand.id_b
            WHERE round(list_cosine_similarity(x.v, y.v), 4) >= 0.45
        )""".replace(
    "{_LSH_NP_BUCKETS}", _lsh_buckets_cte(num_planes=3, num_tables=12)
)


def _lsh_edges(embeddings: DataFrame) -> DataFrame:
    """The scalable graph edge set: LSH-bucketed candidates + exact cosine
    verify (threshold 0.45), identical to sim_lsh_near_pairs — the
    brute-force all-pairs edge build was 5× slower at sf0.1 and O(N²) at
    scale; the replayed-sketch path is the one a 100 TB corpus runs."""
    return S.cosine_near_pairs(
        embeddings, threshold=0.45, num_planes=3, num_tables=12
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))


@query(
    "graph_triangle_count",
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
        e AS (
            SELECT id_a AS u, id_b AS v
            FROM inter
            JOIN sizes sa ON inter.id_a = sa.did
            JOIN sizes sb ON inter.id_b = sb.did
            WHERE round(n_inter / CAST(sa.ss + sb.ss - n_inter AS DOUBLE),
                        4) >= 0.5
        ),
        tri AS (
            SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e e1
            JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        per_node AS (
            SELECT node, count(*) AS n_triangles FROM (
                SELECT a AS node FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri
            ) GROUP BY node
        )
        SELECT node AS doc_id, n_triangles,
               (SELECT count(*) FROM tri) AS total_triangles
        FROM per_node
        ORDER BY n_triangles DESC, node LIMIT 10
    """,
    tags=("north-star", "graph", "dedup"),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the document near-dup graph (trigram
    Jaccard ≥ 0.5, the same edge set dedup_connected_clusters closes
    over): the clustering-structure probe — boilerplate families are
    triangle-dense (every trio of mutual near-dups), chance collisions
    are not, so triangle counts grade CLUSTER QUALITY where CC only
    reports reachability.  Counted by the ordered-edge join (u<v<w):
    e(a,b) ⋈ e(b,c) ⋈ e(a,c) finds every triangle exactly once.
    Returns the 10 most triangle-heavy documents plus the global count.

    Scale: edges come from the prefix-filtered Jaccard join (never
    all-pairs), and the triangle join is the standard distributed recipe
    — ordering vertices kills duplicate enumeration, each join shuffles
    id-pairs only; at 100 TB, orient edges low-degree → high-degree to
    bound hub skew."""
    (documents,) = load(spark, sf_dir, "documents")
    # The edge frame feeds all three legs of the triangle join: persist
    # so the pair pipeline runs once, not per leg (intra-job cache
    # reuse, released by bench/clearCache).
    e = (
        D.jaccard_pairs(documents, n=3, threshold=0.5)
        .select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .persist()
    )
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    total = tri.agg(F.count(F.lit(1)).alias("total_triangles"))
    return (
        nodes.crossJoin(F.broadcast(total))
        .orderBy(F.desc("n_triangles"), F.asc("node"))
        .limit(10)
        .select(F.col("node").alias("doc_id"), "n_triangles", "total_triangles")
    )


def _lpa_round_sql(r: int) -> str:
    prev = f"l{r - 1}"
    return f"""
        r{r}c AS (
            SELECT und.u AS node, {prev}.label, count(*) AS c
            FROM und JOIN {prev} ON {prev}.node = und.v
            GROUP BY und.u, {prev}.label
        ),
        l{r} AS (
            SELECT node, label FROM (
                SELECT *, row_number() OVER (PARTITION BY node
                    ORDER BY c DESC, label) AS rn FROM r{r}c
            ) WHERE rn = 1
        )"""


_LPA_ROUNDS = 3


@query(
    "graph_label_propagation",
    oracle=f"""
        WITH {_LSH_EDGE_CTE},
        und AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
        l0 AS (SELECT DISTINCT u AS node, u AS label FROM und),
        {",".join(_lpa_round_sql(r) for r in range(1, _LPA_ROUNDS + 1))}
        SELECT label AS community, count(*) AS n_nodes, min(node) AS min_node
        FROM l{_LPA_ROUNDS} GROUP BY label
    """,
    tags=("north-star", "graph", "similarity"),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by deterministic synchronous label propagation
    (3 rounds, majority label with min-label tie-break) over the
    LSH-bucketed cosine ≥ 0.45 similarity graph (same scalable edge build
    as graph_triangle_count); reports each community's size and smallest
    member.  The oracle replays the edge sketch AND every LPA round, so
    the community assignment — not just the census — is value-checked."""
    from aws_genaric_datapipeline_spark.operators.graph import label_propagation

    (embeddings,) = load(spark, sf_dir, "embeddings")
    e = _lsh_edges(embeddings)
    labels = label_propagation(e, iterations=_LPA_ROUNDS)
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").alias("min_node"),
    )


@query(
    "multimodal_audio_features",
    oracle="""
        WITH p AS (
            SELECT doc_id, (length(text) * 11) % 3000 + 100 AS n
            FROM documents WHERE length(text) > 0
        ),
        w AS (
            SELECT doc_id, n, CAST(t.i AS INT) AS win_idx
            FROM p, UNNEST(range(0, (n + 255) // 256)) AS t(i)
        ),
        s AS (
            SELECT doc_id, win_idx,
                   count(*) AS n_samples,
                   sum(((doc_id * 31 + u.j * 17) % 4001 - 2000)
                       * ((doc_id * 31 + u.j * 17) % 4001 - 2000)) AS energy
            FROM w, UNNEST(range(win_idx * 256,
                                 least(n, (win_idx + 1) * 256))) AS u(j)
            GROUP BY doc_id, win_idx
        )
        SELECT doc_id, CAST(win_idx AS INT) AS win_idx,
               CAST(n_samples AS INT) AS n_samples,
               CAST(energy AS BIGINT) AS energy
        FROM s
    """,
    tags=("north-star", "multimodal"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end to end, completing the image/video/audio
    codec trio: per document, synthesize a deterministic int16 PCM
    waveform (sample i = (doc_id·31 + i·17) mod 4001 − 2000, length from
    text length), encode it as a canonical RIFF/WAVE file, then run the
    feature pass — RIFF chunk walk, PCM decode, 256-sample windowed
    ENERGY sums in pure int64 arithmetic (operators/audiocodec.py).
    Because every stage is integer-exact, the oracle recomputes each
    window's energy in SQL from the same congruence: a single wrong byte
    anywhere in encode → parse → decode → window turns the row red."""
    from collections.abc import Iterator

    import pandas as pd

    (documents,) = load(spark, sf_dir, "documents")

    def _render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from aws_genaric_datapipeline_spark.operators.audiocodec import (
            encode_wav,
        )

        for pdf in batches:
            rows: dict[str, list] = {"doc_id": [], "media": [], "media_meta": []}
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                n_chars = len(text) if text is not None else 0
                if n_chars == 0:
                    continue
                n = (n_chars * 11) % 3000 + 100
                i = np.arange(n, dtype=np.int64)
                x = ((int(did) * 31 + i * 17) % 4001 - 2000).astype(np.int16)
                rows["doc_id"].append(did)
                rows["media"].append(encode_wav(x, sample_rate=8000))
                rows["media_meta"].append(
                    {"kind": "audio", "mime": "audio/wav", "width": 0,
                     "height": 0, "duration_ms": n * 1000 // 8000}
                )
            yield pd.DataFrame(rows)

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aws_genaric_datapipeline_spark.operators.audiocodec import (
            decode_wav,
            window_energy,
        )

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "win_idx": [], "n_samples": [], "energy": []
            }
            for did, payload in zip(pdf["doc_id"], pdf["media"]):
                for w, ns, en in window_energy(decode_wav(bytes(payload))):
                    out["doc_id"].append(did)
                    out["win_idx"].append(w)
                    out["n_samples"].append(ns)
                    out["energy"].append(en)
            yield pd.DataFrame(out)

    media = documents.select("doc_id", "text").mapInPandas(
        _render, schema=M.MEDIA_SCHEMA
    )
    return media.mapInPandas(
        _feat, schema="doc_id long, win_idx int, n_samples int, energy long"
    )


# ------------------------------------------------------ ANN tuning report
def _ann_tuning_oracle_sql(
    num_cells: int = 16, k: int = 5, nprobes: tuple = (1, 2, 4, 8), dim: int = 64
) -> str:
    """Sweep replay: the shared IVF training/assignment CTEs of
    _ivf_oracle_sql (materialized — they are referenced once per swept
    nprobe, and DuckDB would otherwise inline-recompute them; the k-core
    oracle hit the same wall, round-8 verify notes) plus, per nprobe, the
    candidate set, its top-k, and the recall/scan-fraction counts against
    an exact brute-force ground truth.  All output values are integer
    basis points via floor division — no float comparisons at all in the
    final row set (the float caveat narrows to top-k membership at
    round-4 tie boundaries, the same class as _ivf_oracle_sql)."""
    scr = "((vec_id % 2147483648) * 2654435761) % 4294967296"
    nq = 5
    pmax = max(nprobes)
    parts = [f"""
        base AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        unit AS MATERIALIZED (
            SELECT vec_id,
                   CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v
                        ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                   END AS u
            FROM base
        ),
        seeds AS (
            SELECT u AS su, cell_id FROM (
                SELECT u, row_number() OVER (ORDER BY {scr}, vec_id) - 1 AS cell_id
                FROM unit)
            WHERE cell_id < {num_cells}
        ),
        assign0 AS (
            SELECT vec_id, u, cell_id FROM (
                SELECT un.vec_id, un.u, s.cell_id,
                       row_number() OVER (PARTITION BY un.vec_id
                           ORDER BY list_dot_product(un.u, s.su) DESC, s.cell_id) AS rn
                FROM unit un CROSS JOIN seeds s)
            WHERE rn = 1
        ),
        cmeans AS (
            SELECT cell_id, g.pos AS pos, avg(u[g.pos]) AS m
            FROM assign0, UNNEST(generate_series(1, {dim})) AS g(pos)
            GROUP BY 1, 2
        ),
        cvecs AS (SELECT cell_id, list(m ORDER BY pos) AS cv FROM cmeans GROUP BY cell_id),
        cunit AS MATERIALIZED (
            SELECT cell_id,
                   CASE WHEN sqrt(list_dot_product(cv, cv)) = 0 THEN cv
                        ELSE list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
                   END AS cu
            FROM cvecs
        ),
        assign1 AS MATERIALIZED (
            SELECT vec_id, cell_id FROM (
                SELECT un.vec_id, c.cell_id,
                       row_number() OVER (PARTITION BY un.vec_id
                           ORDER BY list_dot_product(un.u, c.cu) DESC, c.cell_id) AS rn
                FROM unit un CROSS JOIN cunit c)
            WHERE rn = 1
        ),
        qpall AS MATERIALIZED (
            SELECT vec_id AS query_id, cell_id, rn FROM (
                SELECT un.vec_id, c.cell_id,
                       row_number() OVER (PARTITION BY un.vec_id
                           ORDER BY list_dot_product(un.u, c.cu) DESC, c.cell_id) AS rn
                FROM unit un CROSS JOIN cunit c
                WHERE un.vec_id IN (1, 2, 3, 4, 5))
            WHERE rn <= {pmax}
        ),
        exscored AS (
            SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                   round(list_dot_product(q.u, n.u), 4) AS s
            FROM unit q JOIN unit n ON n.vec_id <> q.vec_id
            WHERE q.vec_id IN (1, 2, 3, 4, 5)
        ),
        extop AS MATERIALIZED (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY s DESC, neighbor_id) AS rn FROM exscored)
            WHERE rn <= {k}
        ),
        nn AS (SELECT count(*) AS n FROM base)"""]
    for p in nprobes:
        parts.append(f"""
        cand_{p} AS MATERIALIZED (
            SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id
            FROM qpall q JOIN assign1 a ON a.cell_id = q.cell_id
            WHERE q.rn <= {p} AND a.vec_id <> q.query_id
        ),
        top_{p} AS (
            SELECT query_id, neighbor_id FROM (
                SELECT c.query_id, c.neighbor_id,
                       row_number() OVER (PARTITION BY c.query_id
                           ORDER BY round(list_dot_product(qu.u, nu.u), 4) DESC,
                                    c.neighbor_id) AS rn
                FROM cand_{p} c
                JOIN unit qu ON qu.vec_id = c.query_id
                JOIN unit nu ON nu.vec_id = c.neighbor_id)
            WHERE rn <= {k}
        )""")
    selects = " UNION ALL ".join(
        f"""SELECT CAST({p} AS BIGINT) AS nprobe,
               CAST((SELECT count(*) FROM top_{p} t JOIN extop e
                     ON e.query_id = t.query_id AND e.neighbor_id = t.neighbor_id)
                    * 10000 // {k * nq} AS BIGINT) AS recall_bp,
               CAST((SELECT count(*) FROM cand_{p}) * 10000
                    // ((SELECT n FROM nn) * {nq}) AS BIGINT) AS scan_bp"""
        for p in nprobes
    )
    return "WITH " + ",".join(parts) + " " + selects


@query(
    "sim_ann_tuning_report",
    oracle=_ann_tuning_oracle_sql(),
    tags=("north-star", "similarity", "report"),
)
def sim_ann_tuning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall/cost TUNING REPORT for the IVF ANN tier
    (operators/similarity.py ivf_tuning_report): sweep nprobe over
    {1,2,4,8} against the deterministic trained index and report, per
    setting, recall@5 vs the exact brute-force top-5 and the fraction of
    the corpus actually scored — both as integer basis points.  This is
    the operator that tells a 100 TB deployment where to sit on the
    recall/scan curve BEFORE committing cluster time; the oracle replays
    training, assignment, every swept probe set, the exact ground truth,
    and the report arithmetic itself.

    Scale: training + corpus assignment are paid once (checkpointed);
    each additional swept setting costs one candidate join over its
    probed cells — the sweep is ~one extra corpus scan total."""
    from aws_genaric_datapipeline_spark.operators.similarity import (
        ivf_tuning_report,
    )

    (embeddings,) = load(spark, sf_dir, "embeddings")
    return ivf_tuning_report(
        embeddings, query_ids=[1, 2, 3, 4, 5], k=5, num_cells=16,
        nprobes=(1, 2, 4, 8),
    )


@query(
    "dedup_containment_pairs",
    oracle=f"""
        WITH sh AS (
            SELECT DISTINCT doc_id AS did, s.tok
            FROM documents, UNNEST({_DUCK_TRIGRAMS}) AS s(tok)
        ),
        sizes AS (SELECT did, count(*) AS ss FROM sh GROUP BY did),
        inter AS (
            SELECT a.did AS id_contained, b.did AS id_container, count(*) AS n
            FROM sh a JOIN sh b ON a.tok = b.tok AND a.did <> b.did
            GROUP BY 1, 2
        )
        SELECT id_contained, id_container,
               round(n / CAST(sa.ss AS DOUBLE), 4) AS containment
        FROM inter
        JOIN sizes sa ON sa.did = inter.id_contained
        WHERE n / CAST(sa.ss AS DOUBLE) >= 0.9
    """,
    tags=("north-star", "dedup"),
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs (trigram shingles, C >= 0.9):
    catches a short document quoted wholesale inside a long one, which
    Jaccard structurally misses (the long side inflates the union).
    Directional output — (contained, container) — because "A is inside B"
    and "B is inside A" are different curation decisions (drop the quote,
    keep the source).  operators/dedup.py containment_pairs: prefix filter
    on the contained side only, full postings on the container side, JVM
    array_intersect verify; the threshold compares unrounded IEEE
    quotients so Spark and DuckDB agree even on pairs landing exactly on
    0.9 (sf0.01 has one)."""
    (documents,) = load(spark, sf_dir, "documents")
    return D.containment_pairs(documents, n=3, threshold=0.9)


@query(
    "text_unicode_normalize",
    oracle="""
        WITH decomposed AS (
            SELECT doc_id,
                   replace(text, 'e', 'e' || chr(769)) AS raw
            FROM documents WHERE doc_id < 200
        )
        SELECT doc_id,
               CAST(nfc_normalize(raw) <> raw AS BOOLEAN) AS changed,
               md5(nfc_normalize(raw)) AS norm_md5,
               CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_chars_norm
        FROM decomposed
    """,
    tags=("north-star", "text", "hygiene"),
)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization — the ingest hygiene pass that makes
    decomposed sequences ('e' + combining acute) hash/compare equal to
    their composed forms; without it, exact dedup fingerprints and join
    keys silently split on byte-different equal-looking text.  The
    fixture text is ASCII, so the query CONSTRUCTS decomposed forms
    deterministically (every 'e' → 'e' + U+0301) in BOTH engines, then
    proves the normalizer recomposes them: changed is true wherever an
    'e' existed, and the md5 of the normalized text must match DuckDB's
    utf8proc-based nfc_normalize byte-for-byte (both implement standard
    NFC over UTF-8).

    Scale: row-parallel Arrow-batched pandas UDF, no shuffle; at 100 TB
    this rides the same ingest scan as the rest of the hygiene stack."""
    (documents,) = load(spark, sf_dir, "documents")
    raw = documents.where(F.col("doc_id") < 200).select(
        "doc_id",
        F.regexp_replace("text", "e", "e\u0301").alias("raw"),  # e + combining acute
    )
    norm = X.nfc_normalize_udf()(F.col("raw"))
    return raw.select(
        "doc_id",
        (norm != F.col("raw")).alias("changed"),
        F.md5(norm.cast("binary")).alias("norm_md5"),
        F.length(norm).cast("bigint").alias("n_chars_norm"),
    )


_MRL_DIMS = 16
_MRL_K = 5
_MRL_QUERIES = "(1, 2, 3, 4, 5, 6, 7, 8, 9, 10)"


def _mrl_topk_cte(tag: str, vec_expr: str) -> str:
    return f"""
        scored_{tag} AS (
            SELECT q.query_id, b.vec_id AS neighbor_id,
                   round(list_cosine_similarity(q.qv, {vec_expr}), 4) AS s
            FROM q_{tag} q JOIN base b ON b.vec_id <> q.query_id
        ),
        top_{tag} AS (
            SELECT query_id, neighbor_id
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rn
                  FROM scored_{tag})
            WHERE rn <= {_MRL_K}
        )"""


@query(
    "embed_matryoshka_report",
    oracle=f"""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        q_full AS (
            SELECT vec_id AS query_id, v AS qv FROM base
            WHERE vec_id IN {_MRL_QUERIES}
        ),
        q_trunc AS (
            SELECT vec_id AS query_id, list_slice(v, 1, {_MRL_DIMS}) AS qv
            FROM base WHERE vec_id IN {_MRL_QUERIES}
        ),
        {_mrl_topk_cte("full", "b.v")},
        {_mrl_topk_cte("trunc", f"list_slice(b.v, 1, {_MRL_DIMS})")}
        SELECT f.query_id,
               CAST(count(t.neighbor_id) AS BIGINT) AS n_overlap,
               CAST(count(t.neighbor_id) * 10000 / {_MRL_K} AS BIGINT)
                   AS recall_bp
        FROM top_full f
        LEFT JOIN top_trunc t
          ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
        GROUP BY f.query_id
    """,
    tags=("north-star", "similarity", "embeddings"),
)
def embed_matryoshka_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation quality report: recall@{_MRL_K} of top-k
    retrieval using only the FIRST {_MRL_DIMS} of 64 embedding dims
    against the full-dimension ground truth — the measurement behind the
    'can we store/serve the 4x-cheaper prefix?' decision MRL-style
    embeddings pose (Kusupati et al. 2022).  Both retrievals are exact
    brute force with the shared rounded-score/id tie rank, so the
    overlap count is bit-deterministic.

    Scale: the report costs two broadcast-query scans over the corpus
    (queries are a fixed panel) — the same shape as sim_cosine_topk; at
    100 TB the truncated leg reads {_MRL_DIMS}/64 of the vector bytes,
    which is exactly the saving being measured."""
    (embeddings,) = load(spark, sf_dir, "embeddings")
    qids = list(range(1, 11))
    full = S.cosine_topk(embeddings, query_ids=qids, k=_MRL_K).select(
        "query_id", "neighbor_id"
    )
    truncated = embeddings.select(
        "vec_id", F.slice("embedding", 1, _MRL_DIMS).alias("embedding")
    )
    trunc = S.cosine_topk(truncated, query_ids=qids, k=_MRL_K).select(
        F.col("query_id").alias("t_qid"), F.col("neighbor_id").alias("t_nid")
    )
    return (
        full.join(
            trunc,
            (F.col("query_id") == F.col("t_qid"))
            & (F.col("neighbor_id") == F.col("t_nid")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count("t_nid").cast("bigint").alias("n_overlap"),
            (F.count("t_nid") * 10000 / _MRL_K)
            .cast("bigint")
            .alias("recall_bp"),
        )
    )


@query(
    "sim_bitext_margin_pairs",
    oracle="""
        WITH base AS (
            SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, d.lang
            FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
        ),
        unit AS (
            SELECT vec_id, lang,
                   CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v
                        ELSE list_transform(v,
                             x -> x / sqrt(list_dot_product(v, v)))
                   END AS u
            FROM base
        ),
        en AS (
            SELECT vec_id AS en_id, u FROM unit
            WHERE lang = 'en'
              AND CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 4 = 0
        ),
        fr AS (SELECT vec_id AS fr_id, u FROM unit WHERE lang = 'fr'),
        scored AS MATERIALIZED (
            SELECT en_id, fr_id,
                   CAST(round(round(list_dot_product(en.u, fr.u), 4)
                        * 10000) AS BIGINT) AS ci
            FROM en CROSS JOIN fr
        ),
        rx AS (
            SELECT en_id, CAST(sum(ci) AS BIGINT) AS rx_sum FROM (
                SELECT en_id, ci, row_number() OVER (PARTITION BY en_id
                       ORDER BY ci DESC, fr_id) AS rn
                FROM scored
            ) WHERE rn <= 4 GROUP BY en_id
        ),
        ry AS (
            SELECT fr_id, CAST(sum(ci) AS BIGINT) AS ry_sum FROM (
                SELECT fr_id, ci, row_number() OVER (PARTITION BY fr_id
                       ORDER BY ci DESC, en_id) AS rn
                FROM scored
            ) WHERE rn <= 4 GROUP BY fr_id
        ),
        best AS (
            SELECT en_id, fr_id, ci FROM (
                SELECT en_id, fr_id, ci,
                       row_number() OVER (PARTITION BY en_id
                           ORDER BY ci DESC, fr_id) AS rn
                FROM scored
            ) WHERE rn = 1
        )
        SELECT b.en_id, b.fr_id,
               round(b.ci / 10000.0, 4) AS cos_sim,
               CAST(floor(1e6 * (8.0 * b.ci)
                    / (rx.rx_sum + ry.ry_sum)) AS BIGINT) AS margin_e6
        FROM best b
        JOIN rx ON rx.en_id = b.en_id
        JOIN ry ON ry.fr_id = b.fr_id
        WHERE rx.rx_sum + ry.ry_sum > 0
          AND floor(1e6 * (8.0 * b.ci) / (rx.rx_sum + ry.ry_sum)) >= 1050000
    """,
    tags=("north-star", "similarity", "text"),
)
def sim_bitext_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext mining by MARGIN scoring (Artetxe & Schwenk 2019 — the
    LASER/CCMatrix recipe that mined the largest public MT corpora):
    candidate en→fr translation pairs are each English document's best
    French cosine neighbor, kept only when the RATIO margin
    2·cos(x,y) / (mean top-4 cos of x + mean top-4 cos of y) clears
    1.05 — absolute cosine thresholds fail under hubness; the margin
    normalizes by each side's neighborhood density.

    Determinism: cosines compare at round-4 (the repo-wide contract),
    then move to the INTEGER lattice ci = round(1e4·cos) so the top-4
    sums — and therefore the margin numerator/denominator — are
    order-free integers; the margin itself is one IEEE divide,
    quantized to margin_e6.  The oracle replays normalization, the
    md5-sampled English panel, both kNN directions, and the margin
    filter in full.

    Scale: the sampled panel bounds this exact tier (~N/4 × |fr|
    dots); the production path blocks the cross join through the
    hyperplane-LSH buckets (sim_lsh_near_pairs) exactly as CCMatrix
    shards by FAISS cells — the margin algebra downstream is
    unchanged."""
    from pyspark.sql import Window

    documents, embeddings = load(spark, sf_dir, "documents", "embeddings")
    unit = S.with_unit_vectors(embeddings).join(
        documents.select(F.col("doc_id").alias("vec_id"), "lang"), "vec_id"
    )
    en = unit.where(
        (F.col("lang") == "en")
        & (
            F.conv(
                F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 4
            == 0
        )
    ).select(F.col("vec_id").alias("en_id"), F.col("unit_vec").alias("eu"))
    fr = unit.where(F.col("lang") == "fr").select(
        F.col("vec_id").alias("fr_id"), F.col("unit_vec").alias("fu")
    )
    ci = F.round(
        F.round(S.dot(F.col("eu"), F.col("fu")), 4) * 10000
    ).cast("bigint")
    scored = (
        en.crossJoin(F.broadcast(fr))
        .select("en_id", "fr_id", ci.alias("ci"))
        .localCheckpoint(eager=True)  # fanned out to rx, ry, and best
    )
    wx = Window.partitionBy("en_id").orderBy(F.desc("ci"), F.asc("fr_id"))
    wy = Window.partitionBy("fr_id").orderBy(F.desc("ci"), F.asc("en_id"))
    # ONE ranking pass over the checkpointed scored frame serves both the
    # en-side kNN sum and the best-pair leg (rn==1)
    rnx = scored.withColumn("rn", F.row_number().over(wx)).localCheckpoint(
        eager=True
    )
    rx = (
        rnx.where(F.col("rn") <= 4)
        .groupBy("en_id")
        .agg(F.sum("ci").alias("rx_sum"))
    )
    ry = (
        scored.withColumn("rn", F.row_number().over(wy))
        .where(F.col("rn") <= 4)
        .groupBy("fr_id")
        .agg(F.sum("ci").alias("ry_sum"))
    )
    best = rnx.where(F.col("rn") == 1)
    margin = F.floor(
        F.lit(1e6)
        * (F.lit(8.0) * F.col("ci"))
        / (F.col("rx_sum") + F.col("ry_sum"))
    ).cast("bigint")
    return (
        best.join(rx, "en_id")
        .join(ry, "fr_id")
        # positivity guard: degenerate neighborhoods (top-4 cosine sums
        # cancelling to <= 0) would divide by zero/negative and invert
        # the margin inequality — both engines exclude them identically
        .where(F.col("rx_sum") + F.col("ry_sum") > 0)
        .select(
            "en_id",
            "fr_id",
            F.round(F.col("ci") / 10000.0, 4).alias("cos_sim"),
            margin.alias("margin_e6"),
        )
        .where(F.col("margin_e6") >= 1050000)
    )


# Integer DCG weight lattice, computed ONCE in Python and inlined as
# literals in BOTH engines — w(i, rel) = floor(1e6·rel/log2(i+1)) for
# rank i and graded relevance rel.  No libm call happens in either
# engine at query time, so the metric cannot drift on a log2 ulp.
_NDCG_K = 5
_NDCG_W = {
    (i, rel): int(1e6 * rel // __import__("math").log2(i + 1))
    if i != 1
    else int(1e6 * rel)
    for i in range(1, _NDCG_K + 1)
    for rel in range(1, _NDCG_K + 1)
}
_NDCG_IDCG = sum(_NDCG_W[(i, _NDCG_K + 1 - i)] for i in range(1, _NDCG_K + 1))
_NDCG_QIDS = (1, 2, 3, 4, 5)
_NDCG_PROBES = (1, 2)


def _ndcg_oracle_sql(num_cells: int = 16, dim: int = 64) -> str:
    """Replay the IVF pipeline (same CTE chain as the tuning report),
    rank both the exact ground truth and each probed top-k, and compute
    nDCG@k / MRR on the inlined integer weight lattice."""
    scr = "((vec_id % 2147483648) * 2654435761) % 4294967296"
    k, pmax = _NDCG_K, max(_NDCG_PROBES)
    qids = ", ".join(str(q) for q in _NDCG_QIDS)
    wvals = ", ".join(
        f"({i}, {rel}, {w})" for (i, rel), w in sorted(_NDCG_W.items())
    )
    parts = [f"""
        wlat(i, rel, w) AS (VALUES {wvals}),
        base AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        unit AS MATERIALIZED (
            SELECT vec_id,
                   CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v
                        ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v)))
                   END AS u
            FROM base
        ),
        seeds AS (
            SELECT u AS su, cell_id FROM (
                SELECT u, row_number() OVER (ORDER BY {scr}, vec_id) - 1 AS cell_id
                FROM unit)
            WHERE cell_id < {num_cells}
        ),
        assign0 AS (
            SELECT vec_id, u, cell_id FROM (
                SELECT un.vec_id, un.u, s.cell_id,
                       row_number() OVER (PARTITION BY un.vec_id
                           ORDER BY list_dot_product(un.u, s.su) DESC, s.cell_id) AS rn
                FROM unit un CROSS JOIN seeds s)
            WHERE rn = 1
        ),
        cmeans AS (
            SELECT cell_id, g.pos AS pos, avg(u[g.pos]) AS m
            FROM assign0, UNNEST(generate_series(1, {dim})) AS g(pos)
            GROUP BY 1, 2
        ),
        cvecs AS (SELECT cell_id, list(m ORDER BY pos) AS cv FROM cmeans GROUP BY cell_id),
        cunit AS MATERIALIZED (
            SELECT cell_id,
                   CASE WHEN sqrt(list_dot_product(cv, cv)) = 0 THEN cv
                        ELSE list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv)))
                   END AS cu
            FROM cvecs
        ),
        assign1 AS MATERIALIZED (
            SELECT vec_id, cell_id FROM (
                SELECT un.vec_id, c.cell_id,
                       row_number() OVER (PARTITION BY un.vec_id
                           ORDER BY list_dot_product(un.u, c.cu) DESC, c.cell_id) AS rn
                FROM unit un CROSS JOIN cunit c)
            WHERE rn = 1
        ),
        qpall AS MATERIALIZED (
            SELECT vec_id AS query_id, cell_id, rn FROM (
                SELECT un.vec_id, c.cell_id,
                       row_number() OVER (PARTITION BY un.vec_id
                           ORDER BY list_dot_product(un.u, c.cu) DESC, c.cell_id) AS rn
                FROM unit un CROSS JOIN cunit c
                WHERE un.vec_id IN ({qids}))
            WHERE rn <= {pmax}
        ),
        extop AS MATERIALIZED (
            SELECT query_id, neighbor_id, rn AS exrank FROM (
                SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
                       row_number() OVER (PARTITION BY q.vec_id
                           ORDER BY round(list_dot_product(q.u, n.u), 4) DESC,
                                    n.vec_id) AS rn
                FROM unit q JOIN unit n ON n.vec_id <> q.vec_id
                WHERE q.vec_id IN ({qids}))
            WHERE rn <= {k}
        )"""]
    for p in _NDCG_PROBES:
        parts.append(f"""
        top_{p} AS MATERIALIZED (
            SELECT query_id, neighbor_id, rn FROM (
                SELECT c.query_id, c.neighbor_id,
                       row_number() OVER (PARTITION BY c.query_id
                           ORDER BY round(list_dot_product(qu.u, nu.u), 4) DESC,
                                    c.neighbor_id) AS rn
                FROM (SELECT DISTINCT q.query_id, a.vec_id AS neighbor_id
                      FROM qpall q JOIN assign1 a ON a.cell_id = q.cell_id
                      WHERE q.rn <= {p} AND a.vec_id <> q.query_id) c
                JOIN unit qu ON qu.vec_id = c.query_id
                JOIN unit nu ON nu.vec_id = c.neighbor_id)
            WHERE rn <= {k}
        ),
        met_{p} AS (
            SELECT t.query_id,
                   CAST(count(e.neighbor_id) AS BIGINT) AS n_hits,
                   CAST(coalesce(min(t.rn) FILTER (e.neighbor_id IS NOT NULL), 0)
                        AS BIGINT) AS first_hit_rank,
                   CAST(coalesce(sum(wl.w), 0) AS BIGINT) AS dcg
            FROM top_{p} t
            LEFT JOIN extop e ON e.query_id = t.query_id
                             AND e.neighbor_id = t.neighbor_id
            LEFT JOIN wlat wl ON wl.i = t.rn
                             AND wl.rel = {k} + 1 - e.exrank
            GROUP BY t.query_id
        )""")
    selects = " UNION ALL ".join(
        f"""SELECT CAST({p} AS BIGINT) AS nprobe,
               CAST(q.q AS BIGINT) AS query_id,
               coalesce(m.n_hits, 0) AS n_hits,
               coalesce(m.first_hit_rank, 0) AS first_hit_rank,
               CASE WHEN coalesce(m.first_hit_rank, 0) > 0
                    THEN 1000000 // m.first_hit_rank ELSE 0 END AS rr_micro,
               coalesce(m.dcg, 0) * 10000 // {_NDCG_IDCG} AS ndcg_bp
        FROM (VALUES {", ".join(f"({q})" for q in _NDCG_QIDS)}) q(q)
        LEFT JOIN met_{p} m ON m.query_id = q.q"""
        for p in _NDCG_PROBES
    )
    return "WITH " + ",".join(parts) + " " + selects


@query(
    "search_ndcg_report",
    oracle=_ndcg_oracle_sql(),
    tags=("north-star", "similarity", "report"),
)
def search_ndcg_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRADED ranking-quality report for the IVF ANN tier: per (nprobe,
    query), nDCG@5 and reciprocal rank of the approximate ranking
    against the exact-cosine ground truth (relevance = 6 − exact rank)
    — recall@k (sim_ann_tuning_report) treats every hit equally; nDCG
    is what tells an operator the index returns the RIGHT neighbors
    FIRST, the metric retrieval-quality regressions actually move.

    All metric arithmetic runs on an integer lattice: the DCG weights
    floor(1e6·rel/log2(i+1)) are Python-computed constants inlined as
    literals in BOTH engines (no query-time libm), so sums are
    order-free and ndcg_bp/rr_micro are exact integer divisions.

    Scale: exact ground truth is one brute-force pass over the query
    panel (k·|Q| rows kept); each probe setting re-ranks only its
    candidate cells — the sim_ivf_topk cost shape; metrics aggregate
    k·|Q| rows."""
    from pyspark.sql import Window

    (embeddings,) = load(spark, sf_dir, "embeddings")
    qids = list(_NDCG_QIDS)
    k = _NDCG_K
    exact = S.cosine_topk(embeddings, qids, k=k)
    exw = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    exranked = exact.withColumn("exrank", F.row_number().over(exw)).select(
        "query_id", "neighbor_id", "exrank"
    )
    wmap = F.create_map(
        *[
            F.lit(x)
            for (i, rel), w in sorted(_NDCG_W.items())
            for x in (i * 10 + rel, w)
        ]
    )
    panel = spark.createDataFrame(
        [(p, q) for p in _NDCG_PROBES for q in qids], "nprobe bigint, query_id bigint"
    )
    # train + assign ONCE (the ivf_tuning_report cost shape): each probe
    # setting reuses the checkpointed corpus assignment and only re-joins
    # its probed cells
    from aws_genaric_datapipeline_spark.operators.similarity import (
        _assign_cells,
        _pair_dot,
        _unit_vectors_np,
        ivf_train_centroids,
    )

    base = _unit_vectors_np(embeddings, "vec_id", "embedding").localCheckpoint(
        eager=True
    )
    centroids = ivf_train_centroids(embeddings, num_cells=16)
    corpus = (
        _assign_cells(base, centroids, nprobe=1)
        .select(
            F.col("vid").alias("nid"), F.col("uvec").alias("nvec"), "cell_id"
        )
        .localCheckpoint(eager=True)
    )
    qbase = base.where(F.col("vid").isin(qids))
    per_probe = []
    for p in _NDCG_PROBES:
        queries = _assign_cells(qbase, centroids, nprobe=p).select(
            F.col("vid").alias("query_id"),
            F.col("uvec").alias("qvec"),
            "cell_id",
        )
        scored_c = (
            F.broadcast(queries)
            .join(corpus, "cell_id")
            .where(F.col("query_id") != F.col("nid"))
            .dropDuplicates(["query_id", "nid"])
            .select(
                "query_id",
                F.col("nid").alias("neighbor_id"),
                F.round(
                    _pair_dot()(F.col("qvec"), F.col("nvec")), 4
                ).alias("cosine_sim"),
            )
        )
        ivf = (
            scored_c.withColumn("rn", F.row_number().over(exw))
            .where(F.col("rn") <= k)
            .drop("rn")
        )
        ranked = ivf.withColumn("rn", F.row_number().over(exw))
        scored = ranked.join(exranked, ["query_id", "neighbor_id"], "left")
        rel = F.coalesce(F.lit(k + 1) - F.col("exrank"), F.lit(0))
        contrib = F.coalesce(
            F.element_at(wmap, (F.col("rn") * 10 + rel).cast("int")), F.lit(0)
        )
        agg = scored.groupBy("query_id").agg(
            F.count(F.col("exrank")).cast("bigint").alias("n_hits"),
            F.coalesce(
                F.min(F.when(F.col("exrank").isNotNull(), F.col("rn"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("first_hit_rank"),
            F.sum(contrib).cast("bigint").alias("dcg"),
        )
        per_probe.append(agg.withColumn("nprobe", F.lit(p).cast("bigint")))
    allp = per_probe[0]
    for more in per_probe[1:]:
        allp = allp.unionByName(more)
    out = panel.join(allp, ["nprobe", "query_id"], "left")
    return out.select(
        "nprobe",
        "query_id",
        F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
        F.coalesce("first_hit_rank", F.lit(0))
        .cast("bigint")
        .alias("first_hit_rank"),
        F.when(
            F.coalesce("first_hit_rank", F.lit(0)) > 0,
            F.expr("1000000 div first_hit_rank"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rr_micro"),
        F.expr(f"coalesce(dcg, 0) * 10000 div {_NDCG_IDCG}")
        .cast("bigint")
        .alias("ndcg_bp"),
    )
