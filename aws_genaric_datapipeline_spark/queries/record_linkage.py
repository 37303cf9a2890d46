"""Record linkage / entity resolution + graph reachability queries.

Two capabilities the curation stack had not yet exposed as driver-checked
queries:

* ``link_entity_resolution`` — Fellegi-Sunter-shaped linkage over the
  customer table (blocking → Levenshtein verify → connected-component
  closure → canonical entity ids), the schema-level twin of document
  near-dup: same closure machinery, structured records instead of text.
* ``graph_bfs_hops`` — multi-source breadth-first hop distance over the
  document near-duplicate graph (seeds = every 50th doc), the
  reachability primitive under "how far is this record from a trusted
  seed set" provenance scoring.

Both oracles replay the FULL pipeline declaratively in DuckDB: the
blocking + edit-distance match and the recursive-CTE closure for
linkage; the trigram-Jaccard edge build and a hop-bounded recursive CTE
(min-over-paths ≡ BFS level) for reachability.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from aws_genaric_datapipeline_spark.operators import dedup as D
from aws_genaric_datapipeline_spark.operators import linkage as L
from aws_genaric_datapipeline_spark.operators.graph import bfs_hops, sssp_weighted
from aws_genaric_datapipeline_spark.queries.north_star import _DUCK_TRIGRAMS
from aws_genaric_datapipeline_spark.queries.registry import query
from aws_genaric_datapipeline_spark.tables import load

_MAX_BLOCK = 500  # linkage quadratic guard, replayed by the oracle


@query(
    "link_entity_resolution",
    oracle=f"""
        WITH RECURSIVE r AS (
            SELECT c_custkey AS rid, c_nationkey AS b1, c_mktsegment AS b2,
                   c_name AS txt
            FROM customer
        ),
        narrow AS (
            SELECT b1, b2 FROM r GROUP BY 1, 2
            HAVING count(*) <= {_MAX_BLOCK}
        ),
        rb AS (SELECT r.* FROM r JOIN narrow USING (b1, b2)),
        pairs AS (
            SELECT a.rid AS s, b.rid AS d
            FROM rb a JOIN rb b
              ON a.b1 = b.b1 AND a.b2 = b.b2 AND a.rid < b.rid
            WHERE levenshtein(a.txt, b.txt) <= 1
        ),
        edges AS (
            SELECT s, d FROM pairs UNION ALL SELECT d, s FROM pairs
        ),
        reach(node, label) AS (
            SELECT s, s FROM edges
            UNION
            SELECT e.d, r2.label FROM reach r2 JOIN edges e ON e.s = r2.node
        ),
        comp AS (SELECT node, min(label) AS ent FROM reach GROUP BY node),
        asg AS (
            SELECT r.rid, coalesce(comp.ent, r.rid) AS entity_id
            FROM r LEFT JOIN comp ON comp.node = r.rid
        )
        SELECT CAST(rid AS BIGINT) AS c_custkey,
               CAST(entity_id AS BIGINT) AS entity_id,
               CAST(count(*) OVER (PARTITION BY entity_id) AS BIGINT)
                   AS entity_size
        FROM asg
    """,
    tags=("north-star", "linkage", "graph"),
)
def link_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution over customers: block on (nation, market
    segment), match names within Levenshtein 1, close matches
    transitively (operators/linkage.py + operators/graph.py), canonical
    entity id = min member key, singletons included.  The oracle replays
    blocking, the width guard, the edit-distance verify, and the closure
    as a recursive CTE — the distributed iterative algorithm is checked
    against a declarative fixpoint."""
    (customer,) = load(spark, sf_dir, "customer")
    pairs = L.blocked_match_pairs(
        customer,
        id_col="c_custkey",
        block_cols=("c_nationkey", "c_mktsegment"),
        compare_col="c_name",
        max_edit=1,
        max_block_width=_MAX_BLOCK,
    )
    out = L.resolve_entities(customer, pairs, id_col="c_custkey")
    return out.select(
        F.col("rid").cast("bigint").alias("c_custkey"),
        F.col("entity_id").cast("bigint").alias("entity_id"),
        F.col("entity_size").cast("bigint").alias("entity_size"),
    )


@query(
    "graph_bfs_hops",
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
        reach(node, hop) AS (
            SELECT doc_id, 0 FROM documents WHERE doc_id % 50 = 0
            UNION
            SELECT e.d, r.hop + 1
            FROM reach r JOIN edges e ON e.s = r.node
            WHERE r.hop < 6
        )
        SELECT CAST(node AS BIGINT) AS doc_id,
               CAST(min(hop) AS INT) AS hops
        FROM reach GROUP BY node
    """,
    tags=("north-star", "graph"),
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the trigram-Jaccard near-dup graph: minimum
    hop distance from the seed set (every 50th document) within 6 hops —
    frontier expansion with one join + one anti-join + one count per
    round (operators/graph.py bfs_hops).  The oracle's hop-bounded
    recursive CTE computes min-over-paths, which equals the BFS level."""
    (documents,) = load(spark, sf_dir, "documents")
    edges = D.jaccard_pairs(documents, n=3, threshold=0.5, hash_tokens=True)
    seeds = documents.where(F.col("doc_id") % 50 == 0).select("doc_id")
    out = bfs_hops(edges, seeds, src="id_a", dst="id_b", max_hops=6)
    return out.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("hops").cast("int").alias("hops"),
    )


def _ppr_oracle(iterations: int = 5, damping: float = 0.85) -> str:
    """Unrolled personalized-PageRank oracle: same chained-CTE replay as
    north_star._pagerank_oracle but the teleport distribution
    concentrates on the seed set (doc_id % 50 = 0, restricted to graph
    nodes) — (1-d)·tele(x) term-for-term with the engine."""
    tele = "CASE WHEN {x} % 50 = 0 THEN 1.0 / ns.k ELSE 0.0 END"
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
        ns AS (SELECT count(*) AS k FROM nodes WHERE node % 50 = 0),
        deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        r0 AS (SELECT node, {tele.format(x='node')} AS rank
               FROM nodes CROSS JOIN ns)"""
    for i in range(1, iterations + 1):
        base += f""",
        r{i} AS (
            SELECT x.node,
                   (1 - {damping}) * ({tele.format(x='x.node')})
                   + {damping} * coalesce(s.c, 0) AS rank
            FROM nodes x
            CROSS JOIN ns
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
    "graph_personalized_pagerank",
    oracle=_ppr_oracle(),
    tags=("north-star", "graph"),
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (Haveliwala 2002) over the near-dup graph:
    teleport mass concentrates uniformly on the seed set (every 50th
    document, the same seeds as graph_bfs_hops), so rank measures
    provenance-weighted centrality — how much trust flows to each
    document from the seeds through similarity edges, the seed-anchored
    complement of uniform centrality (graph_pagerank_centrality).  Same
    per-round cost model as pagerank; the oracle unrolls all five
    synchronous updates with the seed-teleport term."""
    from aws_genaric_datapipeline_spark.operators.graph import pagerank

    (documents,) = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(
        documents, n=3, threshold=0.5, hash_tokens=True
    ).localCheckpoint(eager=True)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    seeds = documents.where(F.col("doc_id") % 50 == 0).select("doc_id")
    ranks = pagerank(edges, iterations=5, personalization=seeds)
    return ranks.select(
        F.col("node").cast("bigint").alias("node"),
        F.round("rank", 6).alias("rank"),
    )


@query(
    "graph_sssp_weighted",
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
        wpairs AS (
            SELECT id_a, id_b,
                   10000 - CAST(round(
                       round(n_inter / CAST(sa.ss + sb.ss - n_inter AS DOUBLE), 4)
                       * 10000) AS BIGINT) AS w
            FROM inter
            JOIN sizes sa ON inter.id_a = sa.did
            JOIN sizes sb ON inter.id_b = sb.did
            WHERE round(n_inter / CAST(sa.ss + sb.ss - n_inter AS DOUBLE), 4) >= 0.5
        ),
        edges AS (
            SELECT id_a AS s, id_b AS d, w FROM wpairs
            UNION ALL
            SELECT id_b, id_a, w FROM wpairs
        ),
        reach(node, dist, hop) AS (
            SELECT doc_id, CAST(0 AS BIGINT), 0
            FROM documents WHERE doc_id % 50 = 0
            UNION
            SELECT e.d, r.dist + e.w, r.hop + 1
            FROM reach r JOIN edges e ON e.s = r.node
            WHERE r.hop < 4
        )
        SELECT CAST(node AS BIGINT) AS doc_id,
               CAST(min(dist) AS BIGINT) AS dist_bp
        FROM reach GROUP BY node
    """,
    tags=("north-star", "graph"),
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source WEIGHTED shortest paths over the near-dup graph:
    edge weight = dissimilarity in integer basis points
    (10000 − 10000·jaccard), so the distance to the seed set measures
    accumulated content drift, not just hop count (a chain of 0.99-
    similar rewrites stays 'near', a chain of 0.5-similar ones does
    not — the provenance-distance readout BFS hops cannot express).
    Bellman-Ford relaxations (operators/graph.py sssp_weighted, 4
    rounds) in pure integer arithmetic; the oracle's hop-capped
    recursive CTE computes the same min-over-paths fixpoint."""
    (documents,) = load(spark, sf_dir, "documents")
    edges = D.jaccard_pairs(documents, n=3, threshold=0.5, hash_tokens=True)
    weighted = edges.select(
        "id_a",
        "id_b",
        (F.lit(10000) - F.round(F.col("jaccard") * 10000).cast("bigint")).alias(
            "w_bp"
        ),
    )
    seeds = documents.where(F.col("doc_id") % 50 == 0).select("doc_id")
    out = sssp_weighted(
        weighted, seeds, src="id_a", dst="id_b", weight="w_bp", rounds=4
    )
    return out.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("dist").cast("bigint").alias("dist_bp"),
    )


@query(
    "link_edit_distance_join",
    oracle="""
        WITH n AS (SELECT DISTINCT p_name AS s FROM part)
        SELECT a.s AS name_a, b.s AS name_b,
               CAST(levenshtein(a.s, b.s) AS INT) AS edit_distance
        FROM n a JOIN n b
          ON a.s < b.s
         AND abs(length(a.s) - length(b.s)) <= 2
         AND levenshtein(a.s, b.s) <= 2
    """,
    tags=("linkage", "similarity", "string"),
)
def link_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-similarity self-join: all part-name pairs within edit
    distance 2 (typo/variant detection — the string counterpart of the
    Jaccard/containment set-similarity joins).  operators/linkage.py
    edit_distance_pairs: distinct-value reduction, then a shared-bigram
    candidate index (sound for k<=2 on >=6-char strings; sentinel bucket
    for the short tail), length filter, JVM levenshtein verify.  The
    oracle affords the O(|values|^2) declarative form at test scale —
    exactly what makes it trustworthy ground truth for the index-driven
    join."""
    from aws_genaric_datapipeline_spark.operators.linkage import (
        edit_distance_pairs,
    )

    (part,) = load(spark, sf_dir, "part")
    return edit_distance_pairs(part, "p_name", max_edits=2)


@query(
    "link_fellegi_sunter_scores",
    oracle=f"""
        WITH r AS (
            SELECT c_custkey AS rid, c_nationkey AS b1, c_mktsegment AS b2,
                   substr(c_name, -2) AS name_code,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
            FROM customer
        ),
        narrow AS (
            SELECT b1, b2 FROM r GROUP BY 1, 2
            HAVING count(*) <= {_MAX_BLOCK}
        ),
        rb AS (SELECT r.* FROM r JOIN narrow USING (b1, b2)),
        n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM r),
        u1 AS (
            SELECT sum(c * c) / (SELECT n * n FROM n) AS u
            FROM (SELECT count(*) AS c FROM r GROUP BY name_code)
        ),
        u2 AS (
            SELECT sum(c * c) / (SELECT n * n FROM n) AS u
            FROM (SELECT count(*) AS c FROM r GROUP BY bal_band)
        ),
        pairs AS (
            SELECT a.rid AS id_a, b.rid AS id_b,
                   a.name_code = b.name_code AS agr1,
                   a.bal_band = b.bal_band AS agr2
            FROM rb a JOIN rb b
              ON a.b1 = b.b1 AND a.b2 = b.b2 AND a.rid < b.rid
        )
        SELECT id_a, id_b, agr1 AS name_code_agree, agr2 AS bal_band_agree,
               round(
                   (CASE WHEN agr1 THEN log2(0.9 / (SELECT u FROM u1))
                         ELSE log2(0.1 / (1 - (SELECT u FROM u1))) END)
                 + (CASE WHEN agr2 THEN log2(0.7 / (SELECT u FROM u2))
                         ELSE log2(0.3 / (1 - (SELECT u FROM u2))) END), 4)
                   AS fs_score
        FROM pairs
    """,
    tags=("linkage", "probabilistic"),
)
def link_fellegi_sunter_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic record linkage scoring (Fellegi & Sunter 1969): each
    blocked candidate pair gets a log-likelihood-ratio score
    sum_i log2(m_i/u_i) over agreeing fields and log2((1-m_i)/(1-u_i))
    over disagreeing ones — the calibrated upgrade over
    link_entity_resolution's binary edit-distance rule.  u-probabilities
    (chance agreement between NON-matches) are estimated FROM THE DATA as
    the random-pair agreement rate sum_v f_v^2 / N^2 per field — exactly
    the frequency-based estimator production linkage uses — while
    m-probabilities are documented priors (EM refinement iterates the
    same score computation).  Comparison fields are a name-suffix code
    (phonetic-code stand-in on these synthetic names) and an account-
    balance band.

    Scale: u estimation is one grouped count per field; pair scoring
    rides the same blocked self-join as entity resolution (never
    all-pairs, width-guarded); the score arithmetic is per-pair
    map-side."""
    (customer,) = load(spark, sf_dir, "customer")
    r = customer.select(
        F.col("c_custkey").alias("rid"),
        F.col("c_nationkey").alias("b1"),
        F.col("c_mktsegment").alias("b2"),
        F.substring("c_name", -2, 2).alias("name_code"),
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    )
    n_total = r.count()
    m1, m2 = 0.9, 0.7

    def u_of(col: str) -> float:
        row = (
            r.groupBy(col)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.sum(F.col("c") * F.col("c")).alias("s"))
            .collect()[0]
        )
        return float(row["s"]) / (float(n_total) * float(n_total))

    u1, u2 = u_of("name_code"), u_of("bal_band")
    wide = r.groupBy("b1", "b2").agg(F.count(F.lit(1)).alias("bw"))
    rb = r.join(
        F.broadcast(wide.where(F.col("bw") <= _MAX_BLOCK).select("b1", "b2")),
        ["b1", "b2"],
    )
    a = rb.select(
        F.col("rid").alias("id_a"), "b1", "b2",
        F.col("name_code").alias("nc_a"), F.col("bal_band").alias("bb_a"),
    )
    b = rb.select(
        F.col("rid").alias("id_b"),
        F.col("b1").alias("b1_b"), F.col("b2").alias("b2_b"),
        F.col("name_code").alias("nc_b"), F.col("bal_band").alias("bb_b"),
    )
    import math

    w1a, w1d = math.log2(m1 / u1), math.log2((1 - m1) / (1 - u1))
    w2a, w2d = math.log2(m2 / u2), math.log2((1 - m2) / (1 - u2))
    pairs = a.join(
        b,
        (F.col("b1") == F.col("b1_b"))
        & (F.col("b2") == F.col("b2_b"))
        & (F.col("id_a") < F.col("id_b")),
    )
    agr1 = F.col("nc_a") == F.col("nc_b")
    agr2 = F.col("bb_a") == F.col("bb_b")
    return pairs.select(
        "id_a",
        "id_b",
        agr1.alias("name_code_agree"),
        agr2.alias("bal_band_agree"),
        F.round(
            F.when(agr1, F.lit(w1a)).otherwise(F.lit(w1d))
            + F.when(agr2, F.lit(w2a)).otherwise(F.lit(w2d)),
            4,
        ).alias("fs_score"),
    )


_SNM_WINDOW = 3


@query(
    "link_sorted_neighborhood",
    oracle=f"""
        WITH r AS (
            SELECT c_custkey AS rid, c_name AS nm,
                   row_number() OVER (ORDER BY c_name, c_custkey) AS pos
            FROM customer
        ),
        cand AS (
            SELECT a.rid AS id_a, a.nm AS nm_a, b.rid AS id_b, b.nm AS nm_b
            FROM r a JOIN r b
              ON b.pos > a.pos AND b.pos <= a.pos + {_SNM_WINDOW - 1}
        )
        SELECT id_a, id_b,
               CAST(levenshtein(nm_a, nm_b) AS INT) AS edit_distance
        FROM cand
        WHERE levenshtein(nm_a, nm_b) <= 1
    """,
    tags=("linkage", "blocking"),
)
def link_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate generation (Hernandez & Stolfo 1995)
    — the THIRD blocking strategy alongside hash blocking
    (link_entity_resolution) and gram indexing (link_edit_distance_join):
    sort records by a discriminating key and pair each record with the
    next w-1 in sort order, catching near-matches that hash blocks split
    (a typo in the BLOCK key breaks hash blocking; the sort keeps
    typo-neighbors adjacent).

    The global rank is computed WITHOUT a single-partition window:
    range-partition on the sort key, per-partition row_number, plus a
    broadcast per-partition offset (cumulative counts over the tiny
    partition census).  Because the sort key is unique, the resulting
    rank is a pure function of the DATA — identical whatever the
    sampled range boundaries — which is what lets the declarative
    single-window oracle replay it.  Pairing is equi-ized: each row
    emits its w-1 backward-target ranks and hash-joins on rank —
    a plain equi join shuffling (rank, id, key) rows, never a
    nested-loop band.

    Scale: one range shuffle + in-partition sort (the cost class of any
    global-order op, cf. layout_range_partition_bounds); candidates are
    N·(w-1), linear in the table."""
    (customer,) = load(spark, sf_dir, "customer")
    from pyspark.sql import Window

    r = customer.select(
        F.col("c_custkey").alias("rid"), F.col("c_name").alias("nm")
    )
    parts = r.repartitionByRange(8, "nm", "rid").sortWithinPartitions(
        "nm", "rid"
    ).withColumn("pid", F.spark_partition_id())
    census = (
        parts.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("pid", "offset")
    )
    lw = Window.partitionBy("pid").orderBy("nm", "rid")
    pos = (
        parts.withColumn("local", F.row_number().over(lw))
        .join(F.broadcast(census), "pid")
        .select("rid", "nm", (F.col("local") + F.col("offset")).alias("pos"))
    )
    a = pos.select(
        F.col("rid").alias("id_a"), F.col("nm").alias("nm_a"),
        F.col("pos").alias("pos_a"),
    )
    # equi-ized band join: each row emits w-1 backward-target ranks, so
    # the pairing is a plain hash join on rank — never a nested loop
    b = pos.select(
        F.col("rid").alias("id_b"),
        F.col("nm").alias("nm_b"),
        F.explode(
            F.array(*[F.lit(d) for d in range(1, _SNM_WINDOW)])
        ).alias("delta"),
        "pos",
    ).select("id_b", "nm_b", (F.col("pos") - F.col("delta")).alias("pos_a"))
    cand = a.join(b, "pos_a")
    return cand.select(
        "id_a",
        "id_b",
        F.levenshtein("nm_a", "nm_b").alias("edit_distance"),
    ).where(F.col("edit_distance") <= 1)
