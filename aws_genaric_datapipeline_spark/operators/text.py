"""Text-analysis operators for large-scale document pipelines.

Every function here returns column expressions / DataFrames built purely
from ``pyspark.sql.functions`` — no Python UDFs — so they run inside
whole-stage codegen and scale linearly with document count.  These are the
building blocks for training-data curation at 100 TB: language filtering,
quality filtering, token accounting, and fingerprint-based exact dedup.

One deliberate exception: winnowing fingerprints (bottom of file) need a
rolling hash + sliding minimum per character position — genuinely not
expressible as efficient built-ins — so they use an Arrow-batched pandas
UDF with numpy inner loops (the sanctioned slow-path shape).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

# Tiny per-language stopword marker sets for the heuristic language scorer.
# Deliberately small and deterministic: the point is a cheap, SQL-expressible
# n-gram/stopword heuristic, not a model.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ein"),
    "es": ("el", "los", "las", "una", "y"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (trimmed; empty string → empty array)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """A BPE-ish upper-bound token estimate: split on word boundaries AND
    count ~4-char chunks of long words (mirrors how byte-pair encoders split
    rare long words into multiple pieces)."""
    words = tokens(text)
    per_word = F.transform(
        words, lambda w: F.ceil(F.length(w) / F.lit(4.0)).cast("long")
    )
    return F.coalesce(F.aggregate(per_word, F.lit(0).cast("long"), lambda a, x: a + x), F.lit(0))


def word_ngrams(text: Column, n: int) -> Column:
    """Word n-gram shingles as an array<string> (space-joined windows)."""
    words = tokens(text)
    count = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    # sequence(1, 0) steps BACKWARD to [1, 0] (Spark default step is -1 when
    # start > stop), which feeds slice() an illegal start=0 — docs shorter
    # than n tokens must short-circuit to an empty shingle set.
    return F.when(count == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )


def bm25_scores(
    df: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document for a bag of query terms.

    Classic Okapi BM25 (Robertson/Spärck Jones; the Lucene idf variant
    ln(1 + (N - df + 0.5)/(df + 0.5)) which is always positive).  Returns
    (id, bm25) for documents matching at least one term, score rounded to
    4 decimals.

    Scale: one explode pass produces tokens; doc lengths and term stats are
    two small aggregates.  Corpus-level stats (N, avgdl) are a 1-row frame
    and per-term document frequencies are |terms| rows — both broadcast, so
    the only full shuffles are the two groupBys on doc id.  The tf frame is
    pre-filtered to the query terms BEFORE any shuffle, so scoring cost is
    proportional to matching postings, not corpus size — the same shape as
    scoring against an inverted index.
    """
    toks = df.select(
        F.col(id_col).alias("did"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    dl = toks.groupBy("did").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        toks.where(F.col("tok").isin(*terms))
        .groupBy("did", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("dft"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("dft") + 0.5) / (F.col("dft") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1) / denom
    return (
        tf.join(F.broadcast(dft), "tok")
        .join(dl, "did")
        .crossJoin(F.broadcast(stats))
        .groupBy("did")
        .agg(F.round(F.sum(contrib), 4).alias("bm25"))
        .select(F.col("did").alias(id_col), "bm25")
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetitiousness signals per document: duplicate-token
    ratio (1 - distinct/total) and the fraction of all bigrams taken by the
    single most frequent bigram.  High values on either flag boilerplate /
    degenerate text for removal before training.

    Only documents with at least one token are returned (empty docs have no
    definable ratios).  All ratios derive from integer counts, so values are
    bit-identical across engines.  Scale: two explode+groupBy passes keyed
    on doc id — token strings shuffle once each; at 100 TB hash bigrams to
    xxhash64 before the count to shrink the second shuffle to 8-byte keys.
    """
    base = df.select(
        F.col(id_col).alias("did"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    uni = base.groupBy("did").agg(
        F.count(F.lit(1)).alias("n_tokens"), F.countDistinct("tok").alias("n_distinct")
    )
    bg = df.select(
        F.col(id_col).alias("did"),
        F.explode(word_ngrams(F.col(text_col), 2)).alias("bg"),
    )
    bstats = (
        bg.groupBy("did", "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("did")
        .agg(F.max("c").alias("top_c"), F.sum("c").alias("n_bg"))
    )
    return uni.join(bstats, "did", "left").select(
        F.col("did").alias(id_col),
        "n_tokens",
        F.round(
            F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens").cast("double"), 4
        ).alias("dup_token_ratio"),
        F.round(
            F.coalesce(F.col("top_c") / F.col("n_bg").cast("double"), F.lit(0.0)), 4
        ).alias("top_bigram_frac"),
    )


def stopword_ratio(text: Column, markers: tuple[str, ...]) -> Column:
    """Fraction of tokens that are in the marker set (0 for empty docs)."""
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*markers)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits / F.size(toks).cast("double")
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-ratio scores."""
    return {lang: stopword_ratio(text, markers) for lang, markers in LANG_MARKERS.items()}


def detect_language(text: Column, default: str = "und") -> Column:
    """Heuristic language ID: argmax of marker-stopword ratios, 'und' when no
    marker hits at all.  Deterministic tie-break by language code order."""
    scores = lang_scores(text)
    best_lang = F.lit(default)
    best_score = F.lit(0.0)
    for lang in sorted(scores):  # later wins only on strictly greater → stable
        s = scores[lang]
        take = s > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


def _spread(df: DataFrame) -> DataFrame:
    """Ensure ≥ defaultParallelism input partitions before a char-gram
    explode: a small corpus reads back as ONE parquet split, serializing
    the O(chars·k) gram construction onto a single core (measured: the
    sf0.1 trigram explode alone took 5.8 s single-task vs ~0.3 s spread).
    At real scale inputs are already split into many files and this is a
    no-op — the guard only fires when partitions < cores."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def detect_language_trigram(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "lang",
) -> DataFrame:
    """Char-trigram naive-Bayes language ID (Cavnar & Trenkle 1994
    n-gram text categorization, add-one-smoothed log-likelihood form):
    TRAIN per-language trigram log-prob profiles from the labeled corpus,
    then score every document by Σ count(g)·lp(g|ℓ) and take the argmax —
    with the marker-stopword heuristic (detect_language) as the FALLBACK
    tier for documents too short to contain a trigram.

    Returns (id, lang_pred).  Covers every labeled language (unlike the
    marker heuristic, which only knows the four marker sets — e.g. 'zh'
    is now predictable because its profile is learned from the labels).

    Determinism across engines: per-gram log-probs are INTEGER-quantized
    (floor(1e6·ln((c+1)/(tot+V)))) before any summation, so document
    scores are exact BIGINT sums and the argmax cannot flip on libm
    last-ulp differences — the same quantize-then-compare rule the
    k-center and curriculum operators use.  Ties break to the smallest
    language code.

    Scale shape: the MODEL is (lang × gram) — vocabulary-sized, broadcast
    into the scoring join — and the corpus contributes one (doc, gram)
    aggregation; scoring fans each doc-gram row out by |langs| (a small
    constant), and the per-doc argmax window touches |langs| rows per
    doc.  Unseen-gram mass enters as a per-language scalar times the
    doc's gram count, so unmatched grams never materialize as rows."""
    t = F.lower(F.trim(F.col(text_col)))
    grams = F.when(
        F.length(t) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - 2),
            lambda i: t.substr(i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tg = _spread(df).select(
        F.col(id_col).alias("did"),
        F.col(label_col).alias("lbl"),
        F.explode(grams).alias("gram"),
    )
    # ONE corpus-side aggregation feeds every downstream frame (doc gram
    # counts, doc totals, per-language counts, language totals, vocab
    # size); the eager checkpoint pins the explode+shuffle to a single
    # evaluation — without it each reference re-derives the corpus scan
    # (measured: 11 parquet scans, 14 s → 2 scans at sf0.1).
    dgl = (
        tg.groupBy("did", "lbl", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    dg = dgl.select("did", "gram", "c")
    nd = dg.groupBy("did").agg(F.sum("c").alias("n"))
    # NULL-labeled docs contribute no profile (a null is not a language)
    # — filtering HERE also keeps the unlabeled vocabulary out of the
    # scoring join's fan-out on unlabeled-heavy corpora
    cl = (
        dgl.where(F.col("lbl").isNotNull())
        .groupBy("lbl", "gram")
        .agg(F.sum("c").alias("cg"))
    )
    # The per-language totals and the vocab size are |langs|+1 scalars —
    # collect them once and bake them into LITERAL expressions (a map
    # lookup and an exploded literal array) instead of broadcast-joining
    # three computed micro-frames: each broadcast of a derived frame costs
    # a whole Spark job, and this chain's wall time is job-count-bound,
    # not data-bound (round-10 lesson: literal weights beat joined ones).
    # math.floor(1e6*log(...)) here matches F.floor(F.log(...)) and the
    # oracle's floor(ln(...)) to the shared quantize-then-compare rule.
    import math

    tot_rows = cl.groupBy("lbl").agg(F.sum("cg").alias("tot")).collect()
    v = dgl.agg(F.count_distinct("gram").alias("v")).collect()[0]["v"]
    # unlabeled documents train NO profile (a null is not a language) but
    # still get scored against every real profile below
    tots = {r["lbl"]: int(r["tot"]) for r in tot_rows}
    langs = sorted(tots)
    if not langs:
        # no document carried a single trigram: the whole corpus rides
        # the fallback tier (empty create_map/array literals would not
        # even resolve)
        return df.select(
            F.col(id_col),
            detect_language(F.col(text_col)).alias("lang_pred"),
        )
    uq = {
        lbl: math.floor(1e6 * math.log(1.0 / (tots[lbl] + v)))
        for lbl in langs
    }
    denom_map = F.create_map(
        *[x for lbl in langs for x in (F.lit(lbl), F.lit(float(tots[lbl] + v)))]
    )
    uq_map = F.create_map(
        *[x for lbl in langs for x in (F.lit(lbl), F.lit(uq[lbl]))]
    )
    prof = cl.select(
        "lbl",
        "gram",
        F.floor(
            F.lit(1e6)
            * F.log((F.col("cg") + 1).cast("double") / denom_map[F.col("lbl")])
        ).alias("lpq"),
    )
    match = (
        dg.join(prof, "gram")
        .groupBy("did", "lbl")
        .agg(
            F.sum(
                F.col("c") * (F.col("lpq") - uq_map[F.col("lbl")])
            ).alias("delta")
        )
    )
    scores = (
        nd.select(
            "did", "n", F.explode(F.array(*[F.lit(x) for x in langs])).alias("lbl")
        )
        .join(match, ["did", "lbl"], "left")
        .select(
            "did",
            "lbl",
            (
                F.col("n") * uq_map[F.col("lbl")]
                + F.coalesce("delta", F.lit(0))
            ).alias("sq"),
        )
    )
    w = Window.partitionBy("did").orderBy(F.desc("sq"), F.asc("lbl"))
    pred = (
        scores.select("did", "lbl", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") == 1)
        .select("did", F.col("lbl").alias("tri_pred"))
    )
    base = df.select(F.col(id_col).alias("did"), F.col(text_col).alias("_txt"))
    return base.join(pred, "did", "left").select(
        F.col("did").alias(id_col),
        F.coalesce(
            F.col("tri_pred"), detect_language(F.col("_txt"))
        ).alias("lang_pred"),
    )


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1] from cheap surface statistics:

    - length factor: saturating doc length (chars/500 capped at 1)
    - mean word length in a sane band (2..12 chars)
    - alpha ratio: share of alphabetic characters
    Weights 0.4/0.3/0.3.  All components deterministic and SQL-expressible.
    """
    t = F.trim(text)
    n_chars = F.length(t).cast("double")
    toks = tokens(t)
    n_toks = F.size(toks).cast("double")
    mean_word = F.when(n_toks == 0, F.lit(0.0)).otherwise(
        (n_chars - (n_toks - 1)) / n_toks
    )
    len_factor = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    word_factor = F.when((mean_word >= 2) & (mean_word <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    alpha_chars = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("double")
    alpha_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(alpha_chars / n_chars)
    return F.round(0.4 * len_factor + 0.3 * word_factor + 0.3 * alpha_ratio, 4)


def quality_score_bp(text: Column) -> Column:
    """Quality score as an exact integer in [0, 100000] (basis points × 10).

    Same components as quality_score but in pure integer arithmetic —
    len_factor·4 + word_factor·3 + alpha_ratio·3, each scaled to 10000 —
    so the value is bit-identical across engines (no float rounding
    boundaries).  Prefer this form whenever scores feed thresholds that
    must reproduce exactly (audits, incremental dedup reruns).
    """
    t = F.trim(text)
    n_chars = F.length(t)
    n_toks = F.size(tokens(t))
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    len_bp = F.least(n_chars * 20, F.lit(10000))
    word_len_x_toks = n_chars - (n_toks - 1)  # == mean_word_len * n_toks
    word_bp = F.when(
        (n_toks > 0)
        & (word_len_x_toks >= 2 * n_toks)
        & (word_len_x_toks <= 12 * n_toks),
        F.lit(10000),
    ).otherwise(F.lit(0))
    # integer floor division expressed portably/exactly: (a - a % b) / b — the
    # numerator is divisible by b, so the double quotient is an exact integer.
    scaled = n_alpha.cast("bigint") * 10000
    alpha_bp = F.when(n_chars == 0, F.lit(0).cast("bigint")).otherwise(
        ((scaled - scaled % n_chars) / n_chars).cast("bigint")
    )
    return (4 * len_bp.cast("bigint") + 3 * word_bp.cast("bigint") + 3 * alpha_bp).cast("bigint")


def char_entropy(text: Column) -> Column:
    """Shannon entropy (nats) of the character distribution of trimmed
    text, rounded to 4 decimals — the classic gibberish/boilerplate
    signal: natural prose sits ~2.8-3.2 nats, single-char spam near 0,
    uniform random bytes near ln(alphabet).

    Pure column expression: the per-doc distinct-char count scan is
    O(distinct·len) INSIDE the row (alphabet-bounded), so the operator is
    row-parallel with zero shuffles at any corpus size.  Empty text → 0.0.

    Entropy is computed as ln(n) − (Σ c·ln c)/n over the SORTED per-char
    counts: both engines then fold the identical operand sequence, so the
    float sum is bit-identical cross-engine and the 4-decimal rounding can
    never flip on association order.
    """
    t = F.trim(text)
    n = F.length(t)
    chars = F.split(t, "")
    counts = F.array_sort(
        F.transform(
            F.array_distinct(chars),
            lambda c: F.size(F.filter(chars, lambda x: x == c)),
        )
    )
    clogc = F.aggregate(
        counts,
        F.lit(0.0),
        lambda acc, c: acc + c.cast("double") * F.log(c.cast("double")),
    )
    ent = F.log(n.cast("double")) - clogc / n.cast("double")
    return F.when(n == 0, F.lit(0.0)).otherwise(F.round(ent, 4))


GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 80,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1.1 —
    public heuristics, adapted to exact integer arithmetic so every flag is
    bit-reproducible across engines; no float thresholds anywhere).

    Per document, boolean flags (True = rule passed):
      words_in_range    word count in [min_words, max_words]
      mean_word_len_ok  3 ≤ mean token length ≤ 10   (3·n ≤ Σlen ≤ 10·n)
      stopwords_ok      ≥ 2 distinct common stopwords present
      top_token_ok      most frequent token ≤ 10% of tokens (10·max ≤ n)
      symbol_ratio_ok   ('#' + '...') occurrences ≤ 10% of tokens
      bullet_lines_ok   ≤ 90% of lines start with a bullet (- or *)
      ellipsis_lines_ok ≤ 30% of lines end with '...'
      alpha_words_ok    ≥ 80% of tokens contain a letter (5·alpha ≥ 4·n)
    plus n_failed (count of failed rules) and passed (all rules hold).

    Scale: pure JVM column expressions over one projection — no shuffle at
    all (the output is row-parallel); the per-doc top-token scan is
    O(distinct·n) inside the row, bounded by document length, never a
    corpus aggregation.  Compose with curation funnels as a pre-filter
    ahead of the shuffle-bearing dedup/decontamination passes.
    """
    t = F.trim(F.col(text_col))
    toks = tokens(t)
    n = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    n_stop = F.size(
        F.array_intersect(
            F.transform(toks, F.lower), F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
        )
    )
    top_freq = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda d: F.size(F.filter(toks, lambda x: x == d)),
            )
        ),
        F.lit(0),
    )
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.ltrim(l).startswith("-") | F.ltrim(l).startswith("*"),
        )
    )
    n_ell_lines = F.size(F.filter(lines, lambda l: F.rtrim(l).endswith("...")))
    n_alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))

    rules = {
        "words_in_range": (n >= min_words) & (n <= max_words),
        "mean_word_len_ok": (n > 0) & (3 * n <= sum_len) & (sum_len <= 10 * n),
        "stopwords_ok": n_stop >= 2,
        "top_token_ok": (n > 0) & (10 * top_freq <= n),
        "symbol_ratio_ok": 10 * (n_hash + n_ell.cast("bigint")) <= n,
        "bullet_lines_ok": 10 * n_bullet <= 9 * n_lines,
        "ellipsis_lines_ok": 10 * n_ell_lines <= 3 * n_lines,
        "alpha_words_ok": (n > 0) & (5 * n_alpha_words >= 4 * n),
    }
    n_failed = sum(
        (F.when(c, 0).otherwise(1) for c in rules.values()), F.lit(0)
    ).cast("int")
    return df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in rules.items()],
        n_failed.alias("n_failed"),
        (n_failed == 0).alias("passed"),
    )


def repeated_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Cross-document substring duplication (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): per
    document, the fraction of its character k-gram positions whose k-gram
    also occurs in at least one OTHER document — the exact substring-level
    counterpart of the winnowing sketch (which samples these k-grams;
    this measures them all).

    Returns (id, n_pos, n_shared, shared_frac) for documents of length ≥
    ``k``.  Docs dominated by corpus-repeated spans (boilerplate,
    templates, licence headers) score near 1.

    Scale: one position explode, one k-gram document-frequency
    aggregation, one equi-join back, one per-doc count — all hash
    shuffles on the k-gram key.  At 100 TB, substitute xxhash64(gram) for
    the string key to cut shuffle bytes ~2.5× (kept as strings here for
    oracle replayability); suffix-array construction is what this shape
    replaces — df ≥ 2 on fixed-k grams finds every repeated span of
    length ≥ k, since any such span contains a repeated k-gram.
    """
    t = F.trim(F.col(text_col))
    grams = F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - k + 1),
            lambda i: t.substr(i, F.lit(k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pos = _spread(df).select(
        F.col(id_col).alias("did"), F.explode(grams).alias("gram")
    )
    # One (did, gram) aggregation feeds BOTH the document-frequency side
    # and the join-back side: identical subplans make the shuffle
    # reusable and shrink every downstream row to per-doc-distinct grams
    # — measured 1.35× faster at sf0.1 than the naive pos→dfreq /
    # pos→join shape, which exploded the corpus once per branch.
    pg = pos.groupBy("did", "gram").agg(F.count(F.lit(1)).alias("c"))
    dfreq = pg.groupBy("gram").agg(F.count(F.lit(1)).alias("nd"))
    return (
        pg.join(dfreq, "gram")
        .groupBy("did")
        .agg(
            F.sum("c").alias("n_pos"),
            F.sum(F.when(F.col("nd") >= 2, F.col("c")).otherwise(0)).alias(
                "n_shared"
            ),
        )
        .select(
            F.col("did").alias(id_col),
            "n_pos",
            "n_shared",
            F.round(
                F.col("n_shared") / F.col("n_pos").cast("double"), 4
            ).alias("shared_frac"),
        )
    )


def remove_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Excise cross-document repeated substrings — the DESTRUCTIVE half of
    repeated_span_stats (Lee et al. 2022 "Deduplicating Training Data
    Makes Language Models Better", the ExactSubstr dedup pass): every
    character position covered by a char-k-gram whose gram occurs in ≥ 2
    distinct documents is cut from the (trimmed) text, overlapping and
    adjacent gram hits first merged into maximal spans, and the surviving
    segments reassembled in order.

    Returns one row per input document:
      (id, n_spans, n_removed_chars, cleaned) — documents shorter than
    ``k`` (no grams) and documents with no repeated gram pass through
    unchanged with n_spans = 0.

    Engine shape (all JVM, no Python in the data path):
      1. position explode → (doc, p, gram), one shuffle-free pass;
      2. gram document-frequency groupBy (gram-keyed shuffle) → the df≥2
         gram set — at 100 TB substitute xxhash64(gram) for the string
         key, exactly as repeated_span_stats documents;
      3. hits = positions ⋈ repeated-grams (gram-keyed), then per-doc
         gaps-and-islands with ONE window pass: hits are fixed-length
         intervals [p, p+k), so sorted-by-p ends are monotone and a new
         island starts exactly when p - lag(p) > k (merges overlapping
         AND adjacent spans);
      4. span rebuild per doc: sort_array(collect_list(struct(s, e))) +
         one JVM ``aggregate`` fold emitting the between-span substrings —
         no second window, no per-doc Python.
    Shuffles: gram-df, hit-join, per-doc window/groupBy — all on gram or
    doc keys; skew bounded because a whale gram contributes (docs
    containing it) rows of 16 bytes, and whale DOCS are bounded by
    document size caps upstream (text_gopher_rules words_in_range)."""
    t = F.trim(F.col(text_col))
    grams = F.when(
        F.length(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(t) - k + 1),
            lambda i: t.substr(i, F.lit(k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pos = _spread(df).select(
        F.col(id_col).alias("did"), F.posexplode(grams).alias("p", "gram")
    )
    rep = (
        pos.groupBy("gram")
        .agg(F.count_distinct("did").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    hits = pos.join(rep, "gram").select("did", "p")
    w = Window.partitionBy("did").orderBy("p")
    isl = hits.select(
        "did",
        "p",
        F.sum(
            F.when(
                F.col("p") - F.lag("p").over(w) > F.lit(k), 1
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("isl"),
    )
    spans = (
        isl.groupBy("did", "isl")
        .agg(F.min("p").alias("s"), (F.max("p") + k).alias("e"))
        .groupBy("did")
        .agg(
            F.sort_array(F.collect_list(F.struct("s", "e"))).alias("spans"),
            F.count(F.lit(1)).cast("int").alias("n_spans"),
            F.sum(F.col("e") - F.col("s")).alias("n_removed_chars"),
        )
    )
    doc_t = df.select(F.col(id_col).alias("did"), t.alias("t"))
    folded = F.aggregate(
        F.col("spans"),
        F.struct(F.lit(0).alias("prev"), F.lit("").alias("acc")),
        lambda acc, sp: F.struct(
            sp["e"].cast("int").alias("prev"),
            F.concat(
                acc["acc"],
                F.col("t").substr(
                    acc["prev"] + 1, sp["s"].cast("int") - acc["prev"]
                ),
            ).alias("acc"),
        ),
        lambda acc: F.concat(
            acc["acc"],
            F.col("t").substr(acc["prev"] + 1, F.length("t") - acc["prev"]),
        ),
    )
    return doc_t.join(spans, "did", "left").select(
        F.col("did").alias(id_col),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("n_removed_chars", F.lit(0)).alias("n_removed_chars"),
        F.when(F.col("spans").isNull(), F.col("t"))
        .otherwise(folded)
        .alias("cleaned"),
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 10,
    max_df: int = 1,
) -> DataFrame:
    """Segment-level (CCNet-style) dedup returning the REWRITTEN TEXT —
    the operator form of the text_segment_dedup query (which emits only
    the md5): split each doc into aligned ``seg_words``-word segments,
    drop segments whose distinct-document frequency exceeds ``max_df``,
    reassemble survivors in order.

    Returns (id, n_segments, n_dropped, cleaned) for every input doc
    (token-less docs pass through with cleaned = '').  Same two-shuffle
    shape and skew posture as the query (see text_segment_dedup's
    docstring); built for composition — curate_end_to_end chains it after
    span removal."""
    toks = tokens(F.col(text_col))
    n_seg = F.ceil(F.size(toks) / F.lit(seg_words)).cast("int")
    idx_arr = F.when(n_seg >= 1, F.sequence(F.lit(1), n_seg)).otherwise(
        F.array().cast("array<int>")
    )
    segs = (
        df.select(
            F.col(id_col).alias("did"),
            F.posexplode(
                F.transform(
                    idx_arr,
                    lambda i: F.array_join(
                        F.slice(toks, (i - 1) * seg_words + 1, seg_words), " "
                    ),
                )
            ).alias("pos", "seg"),
        )
        .select("did", (F.col("pos") + 1).alias("idx"), "seg")
    )
    freq = segs.groupBy("seg").agg(F.count_distinct("did").alias("df"))
    keep = F.col("df") <= max_df
    agg = (
        segs.join(freq, "seg")
        .groupBy("did")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.count_if(~keep).alias("n_dropped"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(keep, F.struct("idx", "seg")))
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            ).alias("cleaned"),
        )
    )
    base = df.select(F.col(id_col).alias("did"))
    return base.join(agg, "did", "left").select(
        F.col("did").alias(id_col),
        F.coalesce("n_segments", F.lit(0)).cast("bigint").alias("n_segments"),
        F.coalesce("n_dropped", F.lit(0)).cast("bigint").alias("n_dropped"),
        F.coalesce("cleaned", F.lit("")).alias("cleaned"),
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint (md5 hex of normalized text).

    md5 is engine-portable (same hex in Spark, DuckDB, Python), which makes
    fingerprint-based exact dedup oracle-checkable end to end.
    """
    return F.md5(normalize_text(text))


def profile_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the standard text-analysis columns to a document DataFrame."""
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_tokens_bpe"),
        detect_language(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    )


def winnow_batch_fn(k: int = 25, w: int = 10, slab_chars: int = 4 << 20):
    """The plain (sessionless) batch kernel behind winnow_fingerprints_udf:
    ``pd.Series[str|None] -> pd.Series[list[int]]``.  Split out so
    property-based tests can hammer the guarantee without a SparkSession."""
    B = 1099511628211  # FNV-1a prime; arithmetic wraps mod 2^64
    powers = np.array(
        [pow(B, k - 1 - i, 2**64) for i in range(k)], dtype=np.uint64
    )
    sliding = np.lib.stride_tricks.sliding_window_view

    # Peak Python-worker memory is bounded by slab, not by the Arrow batch:
    # documents are processed in groups of whole docs totalling ≤ _SLAB_CHARS
    # bytes, and the k-gram hash pass is a Horner recurrence (k fused
    # multiply-adds over the slab's hash array) instead of materializing a
    # (chars × k) uint64 window matrix — ~16 B per input character in
    # flight vs ~200 B for the matrix form, and independent of document
    # length or arrow.maxRecordsPerBatch.  Boundary safety is structural:
    # per-doc hash runs only read windows inside [off, off+len-k], which
    # never span documents, so slabbing whole docs is exactly the per-doc
    # computation (property tests pin batch == single-doc and
    # multi-slab == one-slab).
    _SLAB_CHARS = slab_chars

    def _winnow_slab(bufs: list[bytes]) -> list[list[int]]:
        lens = np.array([len(b) for b in bufs], dtype=np.int64)
        cat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        n_h = cat.size - k + 1
        if n_h > 0:
            H = np.zeros(n_h, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(k):
                    H *= np.uint64(B)
                    H += cat[j : j + n_h]
        else:
            H = np.empty(0, dtype=np.uint64)
        offs = np.zeros(len(bufs) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        out: list[list[int]] = []
        for i, length in enumerate(lens):
            if length == 0:
                out.append([])
                continue
            if length < k:
                b = np.frombuffer(bufs[i], dtype=np.uint8)
                with np.errstate(over="ignore"):
                    h1 = (b.astype(np.uint64) * powers[-length:]).sum()
                out.append([int(h1.astype(np.int64))])
                continue
            h = H[offs[i] : offs[i] + length - k + 1]
            mins = h.min() if h.size < w else sliding(h, w).min(axis=1)
            out.append(np.unique(np.atleast_1d(mins).view(np.int64)).tolist())
        return out

    def _winnow(texts: pd.Series) -> pd.Series:
        bufs = [s.encode("utf-8") if s is not None else b"" for s in texts]
        out: list[list[int]] = []
        i, n = 0, len(bufs)
        while i < n:
            j, tot = i, 0
            while j < n and (j == i or tot + len(bufs[j]) <= _SLAB_CHARS):
                tot += len(bufs[j])
                j += 1
            out.extend(_winnow_slab(bufs[i:j]))
            i = j
        return pd.Series(out)

    return _winnow


def winnow_fingerprints_udf(k: int = 25, w: int = 10):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    rolling-hash every character k-gram, then keep the minimum hash of each
    window of ``w`` consecutive k-gram hashes.  Guarantee: any substring
    match of length >= w + k - 1 between two documents shares at least one
    selected fingerprint, while only ~2/(w+1) of hashes are kept.

    Returns an Arrow-batched pandas UDF ``text -> array<bigint>`` (sorted,
    distinct) over winnow_batch_fn's numpy kernel; a JVM
    higher-order-function formulation evaluates the lambda interpreted per
    element — measured ~100x slower on the IVF path, same story here.
    Normalize text (normalize_text) before hashing so case/whitespace don't
    break matches.
    """
    return F.pandas_udf("array<bigint>")(winnow_batch_fn(k, w))


def word_ngrams_udf(n: int, distinct: bool = False):
    """Word n-gram shingles as an Arrow-batched pandas UDF.

    Semantics identical to ``word_ngrams`` (space-joined windows over
    whitespace tokens), but vectorized Python string ops instead of JVM
    higher-order functions: the HOF form evaluates concat_ws/slice lambdas
    interpreted per array element, measured ~3x slower end-to-end on the
    MinHash path at sf0.1.  Use the HOF form only where a column expression
    is required (oracle-SQL parity paths); use this in shingling hot paths.

    ``distinct=True`` dedups shingles inside the batch (first occurrence
    kept) — set-semantics consumers (Jaccard, decontamination) get distinct
    (doc, gram) pairs straight off the map side, with no
    ``dropDuplicates`` shuffle of gram strings at all.
    """

    import re

    # ASCII \s to match the JVM regex in tokens() (and the DuckDB oracles);
    # Python's bare str.split() would also split on unicode whitespace.
    ws = re.compile(r"\s+", re.ASCII)

    def one(s: str | None) -> list[str]:
        w = [t for t in ws.split(s or "") if t]
        if len(w) < n:
            return []
        grams = [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
        return list(dict.fromkeys(grams)) if distinct else grams

    @F.pandas_udf("array<string>")
    def _ngrams(texts: pd.Series) -> pd.Series:
        return texts.map(one)

    return _ngrams


# ------------------------------------------------------------- PII redaction
# Patterns kept to the syntax subset shared by Java regex (Spark) and RE2
# (DuckDB) so the oracle can replay the exact same substitutions: no
# backrefs, no lookaround.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    # ssn (3-2-4) and card (4x4) run BEFORE phone (3-3-4): the groupings
    # are mutually exclusive, but a 16-digit card must not be left for the
    # phone rule to mangle a prefix of.
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("card", r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "<CARD>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def redact_pii(text: Column) -> tuple[Column, Column]:
    """Training-data hygiene: replace emails, IPv4 addresses and NANP-style
    phone numbers with typed placeholder tokens before the corpus reaches a
    training run.

    Returns ``(redacted_text, n_redactions)`` — both pure JVM regexp
    expressions (whole-stage codegen, no Python), applied in declaration
    order so overlapping matches resolve deterministically.  The count is
    computed per pattern BEFORE that pattern's substitution (an email's
    host part would otherwise be double-counted by the IP rule only if it
    matched first — order is part of the contract).
    """
    red = text
    n = F.lit(0).cast("bigint")
    for _, pat, token in PII_PATTERNS:
        n = n + F.coalesce(
            F.size(F.regexp_extract_all(red, F.lit(pat), F.lit(0))), F.lit(0)
        ).cast("bigint")
        red = F.regexp_replace(red, pat, token)
    return red, n


# ------------------------------------------------------- subword tokenization
# Fixed, corpus-independent vocabulary for greedy longest-match (maximal
# munch) subword tokenization — the WordPiece/BPE-apply shape: singles
# guarantee every alphanumeric character tokenizes, multi-character entries
# absorb common English fragments, anything else becomes <unk>.  A literal
# tuple so BOTH engines consume the exact same vocabulary (the DuckDB
# oracle inlines it as VALUES rows).
SUBWORD_VOCAB: tuple[str, ...] = tuple(
    [chr(c) for c in range(ord("a"), ord("z") + 1)]
    + [str(d) for d in range(10)]
    + [
        "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
        "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
        "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
        "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
        "ra", "ce", "li", "ch", "ll", "be", "ma", "si", "om", "ur",
        "the", "and", "ing", "ion", "tio", "ent", "ati", "for", "her",
        "ter", "hat", "tha", "ere", "ate", "his", "con", "res", "ver",
        "all", "ons", "ted", "tion", "atio",
    ]
)
SUBWORD_MAX_LEN = max(len(t) for t in SUBWORD_VOCAB)
SUBWORD_UNK = "<unk>"


def _bpe_merge_fold(syms, a: str, b: str, out: str | None = None):
    """Replace-last fold merging adjacent (a, b) -> ``out`` (default a+b),
    left-to-right non-overlapping (see bpe_learn docstring for the
    equivalence argument; it requires ``out`` to be strictly longer than
    ``a`` so a merged symbol can never re-match as the pair's left — true
    for both the BPE spelling a+b and the WordPiece spelling a+b[2:],
    since a continuation right symbol always carries content past its
    '##' marker)."""
    merged = a + b if out is None else out
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _bpe_accept_batch(
    candidates: list[tuple[str, str, int]], want: int
) -> list[tuple[str, str, int]]:
    """Greedy symbol-disjoint acceptance for one bpe_learn counting round.

    ``candidates`` is the (count desc, left, right) ordered pair histogram
    prefix; accept up to ``want`` pairs such that applying the accepted
    merges in order cannot perturb any other accepted pair's count.  That
    requires disjointness over BOTH the raw symbols and each accepted
    pair's merged OUTPUT symbol ``left+right``: a later candidate whose
    left or right equals an accepted concatenation would gain new
    occurrences mid-batch (e.g. accepting ('a','bc') creates 'abc' tokens
    that a pending ('abc','d') would now match), making its recorded
    pair_count and greedy rank stale — it must wait for the next counting
    round instead."""
    used_syms: set[str] = set()
    accepted: list[tuple[str, str, int]] = []
    for a, b, cnt in candidates:
        if len(accepted) == want:
            break
        if a in used_syms or b in used_syms:
            continue
        accepted.append((a, b, cnt))
        used_syms.update((a, b, a + b))
    return accepted


def byte_syms(word: Column) -> Column:
    """GPT-2-style byte-level symbol init: the word's UTF-8 BYTES, one
    symbol per byte, spelled as its two-hex-digit value ("He" →
    ['48','65'], 'é' → ['C3','A9']).  Hex pairs play the role of GPT-2's
    byte-to-unicode printable alphabet — every possible input is exactly
    representable (256 base symbols, zero <unk>), rare unicode degrades
    to byte pieces instead of unknowns, and the spelling is reproducible
    in any engine with hex() (the DuckDB oracle replays it verbatim).
    Merged symbols concatenate hex pairs, so a base symbol is length 2
    and every merge output is strictly longer than its left side — the
    _bpe_merge_fold precondition."""
    hexstr = F.hex(F.encode(word, "UTF-8"))
    return F.transform(
        F.sequence(F.lit(1), (F.length(hexstr) / 2).cast("int")),
        lambda i: hexstr.substr(i * 2 - 1, F.lit(2)),
    )


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 3,
    batch_merges: int = 1,
    byte_level: bool = False,
) -> DataFrame:
    """Learn the first ``num_merges`` BPE merges from a corpus (Sennrich et
    al. 2016 — vocabulary training, the counterpart of subword_tokenize's
    vocab *apply* pass).

    Classic algorithm: histogram word types, split each into characters,
    then per round (1) count adjacent symbol pairs weighted by word
    frequency, (2) take the most frequent pair (ties broken by (left,
    right) ascending so the result is deterministic cross-engine), and
    (3) merge its non-overlapping occurrences left-to-right in every word.
    Returns (merge_rank, left_sym, right_sym, pair_count) — the ordered
    merge table that IS the trained tokenizer artifact.

    Scale: this is the industrial BPE shape — the corpus contributes ONE
    explode+count shuffle producing the vocabulary-sized word histogram
    (persisted), and the entire training loop runs on that vocab frame:
    pair counting is a vocab-sized aggregation, the arg-max is
    TakeOrdered(1), and the only driver data is one (pair, count) row per
    round — the convergence-probe pattern, same as connected components.
    The merge itself is a JVM ``aggregate`` fold (replace-last formulation:
    merging when the previously emitted symbol equals ``left`` is
    equivalent to the index walk because a merged symbol ``left+right`` is
    strictly longer than ``left`` and can never re-match it), so no Python
    touches data.

    ``batch_merges``: merges accepted per counting round.  N=1 (default)
    is textbook BPE and is what the driver oracle replays.  N>1 is the
    production-scale variant several public tokenizer trainers use: one
    pair histogram accepts up to N pairs, greedily by (count desc, left,
    right), SKIPPING any pair sharing a symbol with an already-accepted
    pair in the round — including the accepted pair's merged OUTPUT
    symbol ``left+right``, since applying the merge creates new tokens of
    that spelling which a pending pair could match — symbol-DISJOINT
    pairs cannot create or destroy each other's occurrences, so each
    accepted pair's recorded count is
    exactly its true count at the moment it is applied, and the emitted
    table is a valid BPE merge table.  A 32k-merge vocabulary drops from
    32k counting rounds (driver round-trips) to ~32k/N.

    ``byte_level``: GPT-2-style byte-level BPE — words split into UTF-8
    byte symbols (see byte_syms) instead of unicode characters, so rare
    unicode never falls out of the alphabet.  The histogram, merge loop,
    incremental refresh (bpe_word_histogram state is spelled in words,
    not symbols), and fold machinery are IDENTICAL — only the symbol
    init differs.
    """
    return bpe_learn_from_histogram(
        bpe_word_histogram(df, text_col),
        num_merges,
        batch_merges,
        byte_level=byte_level,
    )


def bpe_word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The (word, freq) histogram BPE training is a pure function of —
    the ONLY corpus-sized pass in the whole tokenizer chain, and
    therefore the natural INCREMENTAL STATE: a standing corpus
    contributes this one aggregation once, every ingest batch
    contributes its own batch-sized histogram, and
    bpe_merge_histograms folds them (counts are additive).  Persist it
    (e.g. in a TxnTable) and re-deriving the merge table after an
    append costs vocab-sized work, never a corpus re-scan."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_merge_histograms(standing: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold an ingest batch's word histogram into the standing state:
    union + re-sum (word counts are a mergeable aggregate state, the
    same algebra operators/matview.py uses).  Exactness is trivial —
    hist(A) ⊎ hist(B) = hist(A ∪ B) — which is what makes incremental
    tokenizer refresh EQUAL to a full rebuild (pinned by
    tests/test_operators.py::TestTokenizerIncrementalRefresh and the
    tokenizer_incremental_refresh full-replay oracle).  Cost: one
    vocab-sized shuffle, no corpus access."""
    return (
        standing.unionByName(delta)
        .groupBy("word")
        .agg(F.sum("freq").alias("freq"))
    )


def bpe_learn_from_histogram(
    wt: DataFrame,
    num_merges: int = 3,
    batch_merges: int = 1,
    byte_level: bool = False,
) -> DataFrame:
    """BPE training given the (word, freq) histogram — the vocab-sized
    tail of bpe_learn (see its docstring for algorithm + scale notes);
    split out so an incrementally maintained histogram state re-derives
    the merge table without touching the corpus.  ``byte_level`` swaps
    the char split for byte_syms — the byte-level incremental path comes
    free because the histogram state is keyed by WORD."""
    if batch_merges < 1:
        raise ValueError(f"batch_merges must be >= 1, got {batch_merges}")
    if byte_level:
        chars = byte_syms(F.col("word"))
    else:
        chars = F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        )
    vocab = wt.select("word", "freq", chars.alias("syms")).persist()
    spark = wt.sparkSession
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < num_merges:
        want = min(batch_merges, num_merges - len(merges))
        pair_structs = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("a"),
                    F.element_at(F.col("syms"), i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        # Over-fetch: disjointness can reject candidates, so pull a few
        # extra rows per accepted slot (still a vocab-sized TakeOrdered).
        top_rows = (
            vocab.select("freq", F.explode(pair_structs).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(4 * want)
            .collect()
        )
        if not top_rows:
            break
        accepted = _bpe_accept_batch(
            [(r["a"], r["b"], int(r["cnt"])) for r in top_rows], want
        )
        if not accepted:
            break
        col = F.col("syms")
        for a, b, cnt in accepted:
            merges.append((len(merges) + 1, a, b, cnt))
            col = _bpe_merge_fold(col, a, b)
        nxt = vocab.select("word", "freq", col.alias("syms")).persist()
        nxt.count()  # materialize before releasing the previous round
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return spark.createDataFrame(
        merges,
        schema="merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )


# Merge folds nested into a single expression tree per materialization
# chunk in bpe_apply — bounds Catalyst plan depth at production vocab sizes.
_BPE_APPLY_CHUNK = 16


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    byte_level: bool = False,
) -> DataFrame:
    """Apply an ORDERED BPE merge table (bpe_learn's output) to every
    document — the encode pass of the trained tokenizer: each word splits
    to characters, then every merge applies in rank order with the same
    left-to-right non-overlapping fold used during training, so encoding
    a word the trainer saw reproduces the trainer's final segmentation
    exactly (Sennrich et al. 2016 apply-time algorithm).

    Returns one row per document:
      (id, n_words, n_subwords, n_merged_subwords, stream_md5) where
    stream_md5 hashes every subword of the doc in order joined by single
    spaces — pinning the complete segmentation, as subword_tokenize does
    for the fixed-vocab tokenizer.

    Engine shape: the merge folds run over DISTINCT WORD TYPES only
    (vocabulary-sized work, the corpus explode never pays the fold), then
    a word-keyed join carries segments back to positions — AQE broadcasts
    the vocab side when it is small, and at 100 TB the vocab frame is
    still sketch-sized relative to the corpus.  All JVM expressions; no
    Python in the data path.

    Plan depth is bounded: folds nest into ONE expression tree only in
    chunks of ``_BPE_APPLY_CHUNK`` merges, with the (tiny, vocab-sized)
    segmentation frame eagerly materialized between chunks — a 32k-merge
    production vocabulary therefore plans as ~2k shallow passes over the
    word-type frame instead of one 32k-deep tree that would blow the
    analyzer/codegen stack (bpe_learn bounds depth the same way, per
    counting round).

    ``byte_level``: encode with byte_syms symbols (hex pairs) instead of
    characters — a base symbol is then LENGTH 2, so the merged-subword
    count filters on length > 2."""
    toks = tokens(F.col(text_col))
    words = df.select(
        F.col(id_col).alias("did"), F.posexplode(toks).alias("pos", "word")
    )
    base_sym_len = 2 if byte_level else 1
    if byte_level:
        chars = byte_syms(F.col("word"))
    else:
        chars = F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        )
    vocab_seg = words.select("word").distinct().select(
        "word", chars.alias("syms")
    )
    for i in range(0, len(merges), _BPE_APPLY_CHUNK):
        col = F.col("syms")
        for a, b in merges[i : i + _BPE_APPLY_CHUNK]:
            col = _bpe_merge_fold(col, a, b)
        vocab_seg = vocab_seg.select("word", col.alias("syms"))
        if i + _BPE_APPLY_CHUNK < len(merges):
            vocab_seg = vocab_seg.localCheckpoint(eager=True)
    # Explicit broadcast, same reason as unigram_apply: the segmentation
    # side is DISTINCT WORD TYPES (vocabulary-sized by design); relying on
    # the planner's estimate leaves the word join one stats hiccup away
    # from a corpus shuffle on the word string.
    seg = words.join(F.broadcast(vocab_seg), "word")
    per_doc = seg.groupBy("did").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("syms")).alias("n_subwords"),
        F.sum(
            F.size(
                F.filter(
                    F.col("syms"), lambda s: F.length(s) > base_sym_len
                )
            )
        ).alias("n_merged_subwords"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("pos"),
                                F.array_join("syms", " ").alias("seg"),
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            )
        ).alias("stream_md5"),
    )
    base = df.select(F.col(id_col).alias("did"))
    return base.join(per_doc, "did", "left").select(
        F.col("did").alias(id_col),
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce("n_subwords", F.lit(0)).cast("bigint").alias("n_subwords"),
        F.coalesce("n_merged_subwords", F.lit(0))
        .cast("bigint")
        .alias("n_merged_subwords"),
        F.coalesce("stream_md5", F.md5(F.lit(""))).alias("stream_md5"),
    )


# ----------------------------------------------------------- WordPiece tokenizer

WORDPIECE_UNK = "<unk>"


def _wordpiece_init_syms(word: Column) -> Column:
    """WordPiece character split: first char bare, every later char
    '##'-prefixed — the continuation convention (Schuster & Nakajima
    2012 / Devlin et al. 2019)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.when(i == 1, word.substr(i, F.lit(1))).otherwise(
            F.concat(F.lit("##"), word.substr(i, F.lit(1)))
        ),
    )


def wordpiece_word_types(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The (word, freq) word-type histogram WordPiece training runs on —
    exposed so a train→inventory→encode chain can pay the corpus scan
    ONCE (eagerly checkpoint the result and pass it to wordpiece_learn
    and wordpiece_vocab_pieces).  The histogram is objective-agnostic —
    identical to the BPE trainer's input — so this delegates to the one
    shared pass (bpe_word_histogram) rather than keeping two copies of
    the corpus-sized tokenize that could drift apart."""
    return bpe_word_histogram(df, text_col)


def wordpiece_learn(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 3,
    word_types: DataFrame | None = None,
) -> DataFrame:
    """Learn the first ``num_merges`` WordPiece merges (Schuster &
    Nakajima 2012; the BERT tokenizer's trainer, Devlin et al. 2019) —
    the THIRD trained tokenizer family next to bpe_learn (frequency
    objective) and unigram_learn (likelihood prune objective).

    WordPiece differs from BPE in exactly one place: the pair picked each
    round maximizes the LIKELIHOOD GAIN score count(ab)/(count(a)·count(b))
    rather than the raw pair count — merging a pair whose parts rarely
    occur apart beats merging the globally most frequent pair.  Words
    split to a bare first character plus '##'-prefixed continuations; the
    merged spelling of (a, b) is a + b[2:] (the right symbol is never
    word-initial, so it always carries the '##' marker).

    Scores are quantized floor(1e12 · cnt/(cnt_a·cnt_b)) — one IEEE
    divide and one multiply, bit-identical across engines (no libm) — so
    the per-round arg-max (score DESC, pair ASC) can never flip, the same
    determinism contract every trained artifact in this repo carries.

    Returns (merge_rank, left_sym, right_sym, pair_count, score_e12).

    Scale: identical to bpe_learn — the corpus contributes ONE
    explode+count shuffle producing the word-type histogram, each round
    is two vocab-sized aggregations (pair histogram + symbol histogram,
    the one extra aggregate WordPiece's denominator needs) joined and
    TakeOrdered(1); merges fold JVM-side over the persisted vocab frame.
    Pass ``word_types`` (wordpiece_word_types output, ideally
    checkpointed) to skip the corpus scan entirely."""
    wt = (
        word_types
        if word_types is not None
        else wordpiece_word_types(df, text_col)
    )
    vocab = wt.select(
        "word", "freq", _wordpiece_init_syms(F.col("word")).alias("syms")
    ).persist()
    spark = df.sparkSession
    merges: list[tuple[int, str, str, int, int]] = []
    for _ in range(num_merges):
        pair_structs = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("syms"), i).alias("a"),
                    F.element_at(F.col("syms"), i + 1).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        pairs = (
            vocab.select("freq", F.explode(pair_structs).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        symc = (
            vocab.select("freq", F.explode("syms").alias("sym"))
            .groupBy("sym")
            .agg(F.sum("freq").alias("c"))
        )
        top = (
            pairs.join(
                F.broadcast(
                    symc.select(F.col("sym").alias("a"), F.col("c").alias("ca"))
                ),
                "a",
            )
            .join(
                F.broadcast(
                    symc.select(F.col("sym").alias("b"), F.col("c").alias("cb"))
                ),
                "b",
            )
            .withColumn(
                "score_e12",
                F.floor(
                    F.lit(1e12)
                    * (
                        F.col("cnt")
                        / (
                            F.col("ca").cast("double")
                            * F.col("cb").cast("double")
                        )
                    )
                ).cast("bigint"),
            )
            .orderBy(F.desc("score_e12"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        a, b = r["a"], r["b"]
        merged = a + b[2:]
        merges.append(
            (len(merges) + 1, a, b, int(r["cnt"]), int(r["score_e12"]))
        )
        nxt = vocab.select(
            "word", "freq", _bpe_merge_fold(F.col("syms"), a, b, merged).alias("syms")
        ).persist()
        nxt.count()
        vocab.unpersist()
        vocab = nxt
    vocab.unpersist()
    return spark.createDataFrame(
        merges,
        schema="merge_rank int, left_sym string, right_sym string,"
        " pair_count bigint, score_e12 bigint",
    )


def wordpiece_vocab_pieces(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    word_types: DataFrame | None = None,
) -> list[str]:
    """The trained WordPiece vocabulary: the training corpus's initial
    alphabet (bare first characters + '##' continuation characters of
    every word type) plus each merge's output spelling a + b[2:] — the
    piece inventory greedy longest-match encodes against (HF WordPiece
    semantics: merge ORDER is discarded after training; only the piece
    set survives into the tokenizer artifact).

    One distinct-explode aggregation; the result is artifact-sized
    (≤ alphabet + num_merges) and rides in the encode UDF's closure.
    Pass ``word_types`` to derive the alphabet from an already-built
    histogram instead of re-scanning the corpus."""
    words = (
        word_types.select("word")
        if word_types is not None
        else df.select(
            F.explode(tokens(F.col(text_col))).alias("word")
        ).distinct()
    )
    alpha = [
        r["sym"]
        for r in words.select(
            F.explode(_wordpiece_init_syms(F.col("word"))).alias("sym")
        )
        .distinct()
        .collect()
    ]
    return sorted(set(alpha) | {a + b[2:] for a, b in merges})


def wordpiece_apply(
    df: DataFrame,
    pieces: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode every document with a trained WordPiece vocabulary by
    greedy LONGEST-MATCH-FIRST (maximal munch) — the BERT tokenizer's
    apply pass, and the defining difference from bpe_apply: WordPiece
    discards merge order after training and re-segments against the
    final piece set, so a word can encode differently than the trainer
    segmented it.  A word with any unmatchable position encodes as ONE
    ``<unk>`` token (whole-word unk, HF WordPieceTokenizer semantics),
    not per-character unks.

    Returns (id, n_words, n_pieces, n_unk_words, stream_md5) where
    stream_md5 hashes the complete in-order piece stream — pinning the
    full segmentation like the BPE/unigram chains do.

    Engine shape: the greedy scan runs in ONE Arrow-batched pandas UDF
    over DISTINCT WORD TYPES (vocabulary-sized work; segmentation is a
    pure function of the word), then a word-keyed join carries segments
    back to positions — the exact subword_tokenize/bpe_apply scale shape;
    the piece set is a broadcast closure constant."""
    import pandas as pd

    # Pieces are classified by the literal '##' prefix test on BOTH
    # engines (the oracle uses LIKE '##%'): bare pieces match only at
    # word start, '##' pieces only as continuations, and a zero-content
    # continuation ('##' alone, constructible only from words that
    # themselves start with '#') is unmatchable on both sides — the
    # classification is the cross-engine determinism contract.
    init_set = frozenset(p for p in pieces if not p.startswith("##"))
    cont_set = frozenset(
        p[2:] for p in pieces if p.startswith("##") and len(p) > 2
    )
    max_content = max(
        [len(p) for p in init_set] + [len(c) for c in cont_set] + [1]
    )

    def segment(w: str) -> tuple[list[str], bool]:
        out: list[str] = []
        i, n, first = 0, len(w), True
        while i < n:
            sset = init_set if first else cont_set
            for ln in range(min(max_content, n - i), 0, -1):
                c = w[i : i + ln]
                if c in sset:
                    out.append(c if first else "##" + c)
                    i += ln
                    first = False
                    break
            else:
                return [WORDPIECE_UNK], True
        return out, False

    @F.pandas_udf("pieces array<string>, failed boolean")
    def _seg(words: pd.Series) -> pd.DataFrame:
        memo: dict[str, tuple[list[str], bool]] = {}
        ps, fs = [], []
        for w in words:
            if w not in memo:
                memo[w] = segment(w)
            p, f = memo[w]
            ps.append(p)
            fs.append(f)
        return pd.DataFrame({"pieces": ps, "failed": fs})

    words = df.select(
        F.col(id_col).alias("did"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "word"),
    )
    vocab_seg = (
        words.select("word")
        .distinct()
        .select("word", _seg(F.col("word")).alias("s"))
        .select("word", "s.pieces", "s.failed")
    )
    # Explicit broadcast, same reason as unigram_apply: the Arrow UDF in
    # vocab_seg's plan defeats the planner's size estimate; the word join
    # must broadcast the vocabulary-sized side, never shuffle the corpus.
    seg = words.join(F.broadcast(vocab_seg), "word")
    per_doc = seg.groupBy("did").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("pieces")).alias("n_pieces"),
        F.sum(F.col("failed").cast("bigint")).alias("n_unk_words"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("pos"),
                                F.array_join("pieces", " ").alias("seg"),
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            )
        ).alias("stream_md5"),
    )
    base = df.select(F.col(id_col).alias("did"))
    return base.join(per_doc, "did", "left").select(
        F.col("did").alias(id_col),
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce("n_pieces", F.lit(0)).cast("bigint").alias("n_pieces"),
        F.coalesce("n_unk_words", F.lit(0)).cast("bigint").alias("n_unk_words"),
        F.coalesce("stream_md5", F.md5(F.lit(""))).alias("stream_md5"),
    )


# --------------------------------------------------------- unigram-LM tokenizer

# Cost of an out-of-vocabulary piece in the Viterbi DP.  Real piece costs
# are bounded by ~1e6·|ln(1/(tot+K))| ≈ 3e7, and a word contributes at
# most 63 pieces, so any path through an OOV piece always loses; the
# encode step multiplies by 64, keeping everything far inside int64.
UNIGRAM_OOV_COST = 1_000_000_000_000


def viterbi_pieces(
    word: Column, costs: dict[str, int], max_piece_len: int = 4
) -> Column:
    """Minimum-cost segmentation of ``word`` into vocabulary pieces — the
    Viterbi decode of a unigram language model over subword pieces (Kudo
    2018, SentencePiece), with costs = integer-quantized negative
    log-probs so the DP runs entirely on BIGINT sums and the argmin can
    never flip on libm last-ulp differences (the lang-ID / k-center
    quantize-then-compare rule).

    DP, all-JVM: best[p] = min over j in [max(0, p-L), p-1] of
    best[j] + cost(word[j+1..p]); each candidate encodes as
    (best[j]+cost)·64 + (64 - piece_len), so ONE integer array_min picks
    the minimum cost with ties broken to the LARGEST piece length — the
    standard longest-piece greedy preference — deterministically.  The
    encoded tail is the RELATIVE offset (piece length ≤ max_piece_len ≤
    63), never the absolute position, so words of any length stay exact;
    the backpointer array stores the winning piece length.  A second
    bounded fold unwinds it into the piece array.  Out-of-vocab spans
    cost UNIGRAM_OOV_COST; single characters in the vocab guarantee a
    finite path for any trained corpus.

    Work is O(len·L) integer ops per WORD TYPE (callers segment distinct
    words only); the vocabulary rides along as a literal map — model-
    artifact-sized, never a join."""
    if max_piece_len > 63:
        raise ValueError("tie-break encoding supports pieces up to 63 chars")
    cost_map = (
        F.create_map(
            *[
                x
                for p in sorted(costs)
                for x in (F.lit(p), F.lit(int(costs[p])).cast("bigint"))
            ]
        )
        if costs
        else None
    )
    n = F.length(word)
    inf = F.lit(UNIGRAM_OOV_COST).cast("bigint")

    def piece_cost(start, length):  # 1-based start, char count
        if cost_map is None:
            return inf
        return F.coalesce(
            F.try_element_at(cost_map, word.substr(start, length)), inf
        )

    def step(acc, p):
        lo = F.greatest(F.lit(0), p - F.lit(max_piece_len))
        cands = F.transform(
            F.sequence(lo, p - 1),
            lambda j: (
                F.element_at(acc["best"], (j + 1).cast("int"))
                + piece_cost((j + 1).cast("int"), (p - j).cast("int"))
            )
            * 64
            + (F.lit(64) - (p - j)).cast("bigint"),
        )
        enc = F.array_min(cands)
        return F.struct(
            F.concat(acc["best"], F.array(F.shiftright(enc, 6))).alias("best"),
            F.concat(
                acc["back"],
                F.array(
                    (F.lit(64) - enc.bitwiseAND(F.lit(63))).cast("int")
                ),
            ).alias("back"),
        )

    dp = F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(
            F.array(F.lit(0).cast("bigint")).alias("best"),
            F.array().cast("array<int>").alias("back"),
        ),
        step,
    )
    back = dp["back"]

    def unwind(acc, _):
        plen = F.try_element_at(back, acc["i"])  # winning piece length
        j = acc["i"] - plen
        return F.when(
            acc["i"] > 0,
            F.struct(
                j.alias("i"),
                F.concat(
                    F.array(word.substr(j + 1, plen)), acc["pieces"]
                ).alias("pieces"),
            ),
        ).otherwise(acc)

    bt = F.aggregate(
        F.sequence(F.lit(1), n),
        F.struct(
            n.cast("int").alias("i"),
            F.array().cast("array<string>").alias("pieces"),
        ),
        unwind,
    )
    return F.when(n >= 1, bt["pieces"]).otherwise(
        F.array().cast("array<string>")
    )


def _viterbi_segment_py(
    word: str, costs: dict[str, int], max_piece_len: int = 4
) -> list[str]:
    """Pure-Python twin of the viterbi_pieces expression — the SAME
    integer DP, candidate encoding (best[j]+cost)·64 + (64-piece_len),
    array-min tie-break to the longest piece, and backpointer unwind —
    so the two paths are bit-identical by construction (the unit test
    pins them against each other).  This is the hot-path form: the
    expression version re-compiles a vocabulary-sized nested-lambda
    tree through whole-stage codegen on EVERY query run (three
    multi-second Janino compilations per tokenizer_unigram_apply run
    dominated its wall time at sf0.1 — r14 verdict), while this one is
    a constant-cost closure."""
    n = len(word) if word else 0
    best = [0] * (n + 1)
    back = [0] * (n + 1)
    for p in range(1, n + 1):
        e = min(
            (best[j] + costs.get(word[j:p], UNIGRAM_OOV_COST)) * 64
            + (64 - (p - j))
            for j in range(max(0, p - max_piece_len), p)
        )
        best[p] = e >> 6
        back[p] = 64 - (e & 63)
    pieces: list[str] = []
    i = n
    while i > 0:
        plen = back[i]
        pieces.insert(0, word[i - plen : i])
        i -= plen
    return pieces


def _viterbi_seg_udf(costs: dict[str, int], max_piece_len: int):
    """Arrow-batched Viterbi segmenter over word types with a per-batch
    memo — the wordpiece_apply engine shape.  The vocabulary rides in
    the UDF closure (model-artifact-sized, a broadcast constant at
    100 TB); callers apply it to DISTINCT word types only, so the work
    is vocabulary-sized regardless of corpus size."""
    import pandas as pd

    cost_map = {p: int(c) for p, c in costs.items()}

    @F.pandas_udf("array<string>")
    def _seg(words: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}
        out = []
        for w in words:
            s = memo.get(w)
            if s is None:
                s = _viterbi_segment_py(w, cost_map, max_piece_len)
                memo[w] = s
            out.append(s)
        return pd.Series(out)

    return _seg


def _unigram_quantized_costs(counts: dict[str, int]) -> dict[str, int]:
    """Add-one-smoothed integer-quantized piece costs from Viterbi counts:
    cost = -floor(1e6·ln((c+1)/(tot+K))).  math.floor∘math.log here
    matches DuckDB's floor∘ln and Spark's F.floor∘F.log to the shared
    quantize-then-compare rule (the lang-ID precedent, text.py:205)."""
    import math

    tot = sum(counts.values())
    k = len(counts)
    return {
        p: -math.floor(1e6 * math.log((c + 1.0) / (tot + k)))
        for p, c in counts.items()
    }


def unigram_learn(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    seed_multi: int = 48,
    em_iters: int = 2,
    keep_multi: int = 24,
) -> DataFrame:
    """Train a unigram-LM subword vocabulary (Kudo 2018 — the
    SentencePiece-unigram family, the counterpart of bpe_learn) with
    hard (Viterbi) EM over word types:

      1. SEED: count every substring of length 1..``max_piece_len`` over
         the word-type histogram (frequency-weighted); the seed vocab is
         ALL single characters plus the top ``seed_multi`` multi-char
         substrings by (count desc, piece asc).
      2. EM ×``em_iters``: E-step Viterbi-segments every word type under
         the current integer-quantized piece costs (viterbi_pieces);
         piece counts are the frequency-weighted piece occurrences on
         those best paths.  M-step re-quantizes costs from the counts.
         Pieces with zero Viterbi count drop out (the pruning step of
         unigram training); single characters always survive so every
         word stays segmentable.
      3. PRUNE: keep all single characters plus the top ``keep_multi``
         multi-char pieces by (final count desc, piece asc), and emit
         the final add-one-smoothed quantized log-probs.

    Returns (piece, piece_len, vit_count, logprob_q) — the trained
    tokenizer artifact; ``-logprob_q`` is the Viterbi cost unigram_apply
    consumes.  Hard-EM (Viterbi counts instead of full forward-backward
    expectations) is the standard deterministic variant; full soft EM
    would put float log-sum-exp on the cross-engine compare path, which
    the integer-quantized design deliberately avoids.

    Scale shape (the bpe_learn posture): the corpus contributes ONE
    explode+count shuffle (the word-type histogram, persisted); every EM
    iteration is vocabulary-sized work — a Viterbi fold over word types
    and a piece-count aggregation — and the only driver data is the
    model-artifact-sized count table (≤ chars + seed_multi rows)."""
    spark = df.sparkSession
    wt = (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .persist()
    )
    subs = (
        wt.select(
            "freq",
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.length("word")),
                        lambda s: F.transform(
                            F.sequence(
                                F.lit(1),
                                F.least(
                                    F.lit(max_piece_len),
                                    F.length("word") - s + 1,
                                ),
                            ),
                            lambda ln: F.col("word").substr(
                                s.cast("int"), ln.cast("int")
                            ),
                        ),
                    )
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    # chars + top-multi seed in ONE collect job (the two sides are both
    # model-artifact-sized; a second action would re-shuffle the corpus)
    seed_rows = (
        subs.where(F.length("piece") == 1)
        .unionAll(
            subs.where(F.length("piece") > 1)
            .orderBy(F.desc("cnt"), F.asc("piece"))
            .limit(seed_multi)
        )
        .collect()
    )
    chars = {
        r["piece"]: int(r["cnt"]) for r in seed_rows if len(r["piece"]) == 1
    }
    counts = {r["piece"]: int(r["cnt"]) for r in seed_rows}
    costs = _unigram_quantized_costs(counts)
    for _ in range(em_iters):
        vc = (
            wt.select(
                "freq",
                F.explode(
                    _viterbi_seg_udf(costs, max_piece_len)(F.col("word"))
                ).alias("piece"),
            )
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
            .collect()
        )
        counts = {r["piece"]: int(r["cnt"]) for r in vc}
        for ch in chars:  # coverage: zero-count chars stay in the model
            counts.setdefault(ch, 0)
        costs = _unigram_quantized_costs(counts)
    wt.unpersist()
    multi_final = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:keep_multi]
    pruned = {p: c for p, c in counts.items() if len(p) == 1}
    pruned.update(dict(multi_final))
    final_costs = _unigram_quantized_costs(pruned)
    rows = [
        (p, len(p), int(pruned[p]), -int(final_costs[p]))
        for p in sorted(pruned)
    ]
    return spark.createDataFrame(
        rows,
        schema="piece string, piece_len int, vit_count bigint, logprob_q bigint",
    )


def unigram_apply(
    df: DataFrame,
    costs: dict[str, int],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 4,
) -> DataFrame:
    """Encode every document with a trained unigram-LM vocabulary
    (unigram_learn's artifact; ``costs`` maps piece → -logprob_q) — the
    Viterbi decode pass of the SentencePiece-unigram tokenizer, mirroring
    bpe_apply's contract: one row per document,
    (id, n_words, n_pieces, n_multi_pieces, stream_md5) where stream_md5
    hashes the complete in-order piece stream joined by single spaces.

    Engine shape (same as wordpiece_apply): the Viterbi DP runs in ONE
    Arrow-batched pandas UDF over DISTINCT WORD TYPES only
    (vocabulary-sized work; the pure-Python DP is bit-identical to the
    viterbi_pieces expression, unit-pinned); a word-keyed join carries
    segmentations back to token positions, and the vocabulary rides in
    the UDF closure — no corpus-sized driver data."""
    toks = tokens(F.col(text_col))
    words = df.select(
        F.col(id_col).alias("did"), F.posexplode(toks).alias("pos", "word")
    )
    vocab_seg = (
        words.select("word")
        .distinct()
        .select(
            "word",
            _viterbi_seg_udf(costs, max_piece_len)(F.col("word")).alias(
                "pieces"
            ),
        )
    )
    # Explicit broadcast: the segmentation side is DISTINCT WORD TYPES —
    # vocabulary-sized by design — but the Arrow UDF in its plan defeats
    # the planner's size estimate, so without the hint the word join
    # falls back to a corpus shuffle on the word string (the exact scale
    # failure the plan gate forbids).
    seg = words.join(F.broadcast(vocab_seg), "word")
    per_doc = seg.groupBy("did").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.size("pieces")).alias("n_pieces"),
        F.sum(
            F.size(F.filter(F.col("pieces"), lambda s: F.length(s) > 1))
        ).alias("n_multi_pieces"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("pos"),
                                F.array_join("pieces", " ").alias("seg"),
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
                " ",
            )
        ).alias("stream_md5"),
    )
    base = df.select(F.col(id_col).alias("did"))
    return base.join(per_doc, "did", "left").select(
        F.col("did").alias(id_col),
        F.coalesce("n_words", F.lit(0)).cast("bigint").alias("n_words"),
        F.coalesce("n_pieces", F.lit(0)).cast("bigint").alias("n_pieces"),
        F.coalesce("n_multi_pieces", F.lit(0))
        .cast("bigint")
        .alias("n_multi_pieces"),
        F.coalesce("stream_md5", F.md5(F.lit(""))).alias("stream_md5"),
    )


def subword_tokenize(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Greedy longest-match subword tokenization against the fixed
    SUBWORD_VOCAB — the deterministic core of a BPE/WordPiece *apply*
    pass (vocab application, not vocab training): lowercase, split on
    ASCII whitespace, then per word repeatedly emit the LONGEST vocab
    entry prefixing the remainder (a character outside the vocabulary
    emits <unk> and advances one position).

    Returns (id, n_words, n_subwords, subword_stream) where
    ``subword_stream`` is every subword of the document joined by single
    spaces in order — hashing it checks the full segmentation, which is
    how the driver query pins the semantics against the DuckDB replay.

    Engine shape: one Arrow-batched pandas UDF with a per-batch
    distinct-word memo (segmentation is a pure function of the word, and
    real corpora repeat words heavily), then JVM-side md5/aggregation.
    The greedy loop is pure python-per-WORD, not per character pair —
    maximal munch needs backtracking-free linear scanning that SQL
    higher-order functions cannot express without quadratic explodes; the
    oracle replays it with a precomputed best-match table + recursive
    pointer chase.  At 100 TB the vocab is a broadcast constant and the
    pass is map-side only.
    """
    import pandas as pd

    import pyspark.sql.functions as F

    from aws_genaric_datapipeline_spark.operators.partitioning import (
        ensure_parallelism,
    )

    vocab = set(SUBWORD_VOCAB)
    maxlen = SUBWORD_MAX_LEN

    def segment_word(w: str) -> list[str]:
        out, i, n = [], 0, len(w)
        while i < n:
            for l in range(min(maxlen, n - i), 0, -1):
                if w[i : i + l] in vocab:
                    out.append(w[i : i + l])
                    i += l
                    break
            else:
                out.append(SUBWORD_UNK)
                i += 1
        return out

    import re

    # Explicit class, NOT \s: Python-ASCII \s includes \x0b (vertical tab)
    # while RE2 (the DuckDB oracle's engine) excludes it — the explicit
    # class is the engine-identical whitespace definition on both sides.
    ws = re.compile(r"[ \t\n\r\f\v]+")

    def one(text: str | None, memo: dict) -> tuple[int, int, str]:
        words = [w for w in ws.split((text or "").lower()) if w]
        toks: list[str] = []
        for w in words:
            got = memo.get(w)
            if got is None:
                got = segment_word(w)
                memo[w] = got
            toks.extend(got)
        return len(words), len(toks), " ".join(toks)

    @F.pandas_udf("struct<n_words: bigint, n_subwords: bigint, stream: string>")
    def _tok(texts: pd.Series) -> pd.DataFrame:
        memo: dict = {}
        rows = [one(t, memo) for t in texts]
        return pd.DataFrame(rows, columns=["n_words", "n_subwords", "stream"])

    out = ensure_parallelism(df).select(
        F.col(id_col), _tok(F.col(text_col)).alias("t")
    )
    return out.select(
        id_col,
        F.col("t.n_words").alias("n_words"),
        F.col("t.n_subwords").alias("n_subwords"),
        F.col("t.stream").alias("subword_stream"),
    )


def nfc_normalize_udf() -> Column:
    """Unicode NFC normalization as an Arrow-batched pandas UDF.

    Spark SQL has no built-in Unicode normalizer; NFC is the standard
    ingest hygiene pass for web corpora (decomposed sequences like
    'e' + U+0301 must compare/hash equal to the composed 'é', or every
    downstream exact-dedup fingerprint and join key silently splits).
    Both Python's unicodedata and DuckDB's nfc_normalize implement the
    Unicode-standard NFC, so the operator is oracle-checkable."""
    import pandas as pd

    def _norm(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    return F.pandas_udf(_norm, "string")
