"""Entity resolution / record linkage: blocking → pairwise compare →
transitive closure → canonical entity ids.

The classic Fellegi-Sunter shape, re-expressed for Spark at scale:

1. **Blocking** — candidate pairs are generated ONLY within blocks that
   agree on cheap deterministic keys (nation × market segment here;
   phonetic codes / sorted-neighborhood keys in general).  The all-pairs
   O(n²) compare becomes Σ O(block²), and the self-join shuffles on the
   block key alone — no row ever leaves its block's partition.
2. **Block-width guard** — a skewed block (one giant city, one default
   segment) would re-introduce the quadratic blowup, so blocks wider than
   ``max_block_width`` are excluded from pairing (the standard production
   mitigation: oversized blocks get a finer key in a later pass).  The
   guard is part of the operator's CONTRACT, replayed by the DuckDB
   oracle, not a silent cap.
3. **Pairwise verify** — Levenshtein edit distance on the compare column,
   JVM-side (`F.levenshtein`), no UDF.
4. **Closure** — matched pairs rarely form clean cliques (a~b, b~c but
   a≁c), so entities are the connected components of the match graph
   (operators/graph.py hash-min + path halving), with the canonical
   entity id = min member id and unmatched records as singletons.

The reference has no linkage surface; this is north-star scope (joining
customer/account/profile tables without a shared key is the canonical
"prepared layer" enrichment task its Glue jobs stop short of —
cf. glue src/prepared_layer_job.py:80-208, which joins on exact keys
only).

At 100 TB: the block key shuffle is the only data-sized movement; the
match-pair frame is tiny relative to the input (bounded by
blocks × width² × match rate) and the CC rounds run over pairs, not
records.  Width guard + blocking-key choice keep the pair stage from
ever materializing a quadratic intermediate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from aws_genaric_datapipeline_spark.operators.graph import connected_components


def blocked_match_pairs(
    df: DataFrame,
    id_col: str,
    block_cols: tuple[str, ...],
    compare_col: str,
    max_edit: int = 1,
    max_block_width: int = 500,
) -> DataFrame:
    """Candidate match pairs ``(id_a, id_b, edit_dist)`` with ``id_a <
    id_b``: records agreeing on every blocking column whose compare
    column is within ``max_edit`` Levenshtein distance.

    Blocks wider than ``max_block_width`` produce NO pairs (quadratic
    guard — see module docstring); the width check is one aggregation on
    the block key, reusing the same shuffle partitioning as the pair
    join itself.
    """
    rows = df.select(
        F.col(id_col).alias("rid"),
        F.col(compare_col).alias("cmp_txt"),
        *[F.col(c).alias(f"bk{i}") for i, c in enumerate(block_cols)],
    )
    keys = [f"bk{i}" for i in range(len(block_cols))]
    narrow = (
        rows.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("block_width"))
        .where(F.col("block_width") <= max_block_width)
        .select(*keys)
    )
    blocked = rows.join(narrow, keys)
    a = blocked.select(
        *keys,
        F.col("rid").alias("id_a"),
        F.col("cmp_txt").alias("txt_a"),
    )
    b = blocked.select(
        *keys,
        F.col("rid").alias("id_b"),
        F.col("cmp_txt").alias("txt_b"),
    )
    return (
        a.join(b, keys)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist", F.levenshtein("txt_a", "txt_b"))
        .where(F.col("edit_dist") <= max_edit)
        .select("id_a", "id_b", "edit_dist")
    )


def resolve_entities(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Entity assignment for EVERY input record: ``(id, entity_id,
    entity_size)`` where ``entity_id`` is the minimum record id of the
    record's match-graph component (the canonical survivor) and
    unmatched records are their own singleton entity.

    The closure runs over the pair graph only (operators/graph.py);
    the full record set joins in once at the end, so CC round cost is
    proportional to matches, not corpus size.
    """
    comp = connected_components(pairs, src="id_a", dst="id_b")
    assigned = (
        df.select(F.col(id_col).alias("rid"))
        .join(comp.withColumnRenamed("node", "rid"), "rid", "left")
        .select(
            "rid", F.coalesce("component", F.col("rid")).alias("entity_id")
        )
    )
    return assigned.withColumn(
        "entity_size",
        F.count(F.lit(1)).over(Window.partitionBy("entity_id")).cast("bigint"),
    )


def edit_distance_pairs(
    df: DataFrame,
    col: str,
    max_edits: int = 2,
) -> DataFrame:
    """Similarity self-join on STRING edit distance: all distinct-value
    pairs with levenshtein <= ``max_edits`` — the string-similarity
    counterpart of the set-similarity joins (Jaccard/containment) in
    operators/dedup.py, generalizing entity_resolution's within-block
    Levenshtein-1 verify to an unblocked, index-driven join.

    Shape (the production ed-join recipe):
    1. DISTINCT-value reduction — an ed-join is a function of the string
       SET; low-cardinality columns (names, categories, addresses)
       collapse from N rows to |values| strings before any pairing.
    2. Bigram-index candidates: pairs must share a distinct bigram.
       Sound for k <= 2 whenever both strings have at least 5 bigram
       tokens (>= 6 chars): two edits destroy at most 4 bigram tokens,
       so a token — hence its type — survives in both strings.  Shorter
       strings get a sentinel gram (emitted by every string under 8
       chars, the longest a <6-char string can pair with at k = 2),
       pairing the short tail exhaustively — a bounded bucket for
       name-like data; adversarially short corpora band it by length
       instead.
    3. Length filter abs(len_a - len_b) <= k prunes before the verify.
    4. JVM ``F.levenshtein`` verifies candidates exactly — no UDF.

    Returns (name_a, name_b, edit_distance), name_a < name_b.

    Scale: the join shuffles (gram, name) pairs over DISTINCT values
    only; a ubiquitous gram fans out at most |values-sharing-gram| **2,
    which length-banding bounds in adversarial cases — never N**2 of
    the table.
    """
    if not 1 <= max_edits <= 2:
        # The bigram-survival candidate guarantee (step 2) and the <8-char
        # sentinel bucket are derived for k <= 2; a larger k would silently
        # return an INCOMPLETE pair set.  Fail loudly instead.
        raise ValueError(
            f"edit_distance_pairs supports max_edits in {{1, 2}} (bigram "
            f"candidate completeness proof holds only there); got {max_edits}"
        )
    names = (
        df.select(F.col(col).alias("s"))
        .where(F.col("s").isNotNull())
        .distinct()
        .withColumn("len", F.length("s"))
    )
    bigrams = names.select(
        "s",
        "len",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(len - 1, 1)),"
                    " i -> substring(s, i, 2))"
                )
            )
        ).alias("g"),
    )
    sentinel = names.where(F.col("len") < 8).select(
        "s", "len", F.lit(" short").alias("g")
    )
    grams = bigrams.unionByName(sentinel)
    a = grams.select(F.col("s").alias("a"), F.col("len").alias("la"), "g")
    b = grams.select(F.col("s").alias("b"), F.col("len").alias("lb"), "g")
    cand = (
        a.join(b, "g")
        .where(F.col("a") < F.col("b"))
        .where(F.abs(F.col("la") - F.col("lb")) <= max_edits)
        .select("a", "b")
        .dropDuplicates()
    )
    return (
        cand.select(
            F.col("a").alias("name_a"),
            F.col("b").alias("name_b"),
            F.levenshtein("a", "b").alias("edit_distance"),
        )
        .where(F.col("edit_distance") <= max_edits)
    )
