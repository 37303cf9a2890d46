"""Distributed connected components — the clustering step of a dedup
pipeline.

Near-duplicate detection (dedup.py: MinHash-LSH / SimHash / exact Jaccard)
emits PAIRS.  Turning pairs into deletion decisions needs the transitive
closure: if a~b and b~c, then {a,b,c} is one duplicate cluster even when
a~c was never emitted.  That closure is exactly connected components over
the pair graph, with the canonical document per cluster = min doc id.

The reference has no graph surface at all; this is north-star scope
(training-data curation at 100 TB routinely runs CC over billions of
near-dup edges — cf. the map-reduce CC literature: hash-min with pointer
jumping, large-star/small-star).

Algorithm: hash-min label propagation + path-halving pointer jump.

* ``label(v)`` starts as ``v``; each round takes the min over the
  neighborhood, then jumps ``label(v) <- label(label(v))``.  Labels only
  decrease, so ``sum(label)`` is a strictly-decreasing convergence
  certificate — one scalar aggregate per round, no change-join.
* The pointer jump gives union-find-style path halving: convergence in
  O(log(diameter)) rounds instead of O(diameter) — a 1M-node chain
  converges in ~20 rounds, not 1M.
* Per round: one shuffle of the (static) edge list on ``nbr`` + two
  shuffles of the node-sized label table.  ``localCheckpoint`` after every
  round caps lineage (iterative plans otherwise nest each pass inside the
  next — see operators/similarity.py ivf_train_centroids for the same
  discipline).

At 100 TB scale: |edges| >> |nodes|; pre-partition the edge list by
``nbr`` (repartition or bucketed write) so the per-round propagation join
co-locates with the label table and only the label side reshuffles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iters: int = 25,
) -> DataFrame:
    """Return ``(node, component)`` where ``component`` is the minimum node
    id reachable from ``node`` over the undirected edge set.

    ``edges`` is directed input; it is symmetrized internally.  Nodes with
    no edges appear only if supplied via ``nodes`` (single-column frame) —
    they come back as their own singleton component.  Raises if the graph
    has not converged after ``max_iters`` rounds (pointer jumping makes
    that ~2^25-diameter territory, i.e. never for real data).
    """
    # Materialize the input FIRST: the caller's edge frame is typically an
    # expensive pipeline (e.g. an exact-Jaccard self-join), and fwd/rev
    # below reference it twice — checkpointing up front evaluates it once
    # and symmetrization runs over the materialized rows.
    edges = edges.localCheckpoint(eager=True)
    fwd = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
    rev = edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    sym = fwd.unionByName(rev).where(F.col("node") != F.col("nbr")).distinct()
    sym = sym.localCheckpoint(eager=True)

    # Initialize with the FIRST hash-min pass fused in: label(v) =
    # min(v, min(neighbors(v))).  One aggregation over the (already
    # materialized) edge list replaces what would otherwise be the loop's
    # first full round (join + union + aggregate + jump + two checkpoints)
    # — on near-dup graphs, whose clusters are small, this converges most
    # components immediately and the loop's job is just confirmation.
    labels = sym.groupBy("node").agg(F.least(F.col("node"), F.min("nbr")).alias("label"))
    if nodes is not None:
        extra = (
            nodes.select(F.col(nodes.columns[0]).alias("node"))
            .distinct()
            .join(labels.select("node"), "node", "left_anti")
            .withColumn("label", F.col("node"))
        )
        labels = labels.unionByName(extra)
    # Lazy checkpoint: the convergence aggregate below is the action that
    # materializes it, so init costs ONE job, not checkpoint-job + sum-job.
    labels = labels.localCheckpoint(eager=False)

    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(max_iters):
        # hash-min: candidate label for `node` from every neighbor's label
        nbr_labels = sym.join(
            labels.select(F.col("node").alias("nbr"), F.col("label")), "nbr"
        ).select("node", "label")
        merged = (
            labels.select("node", "label")
            .unionByName(nbr_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # Path halving, THROUGH THE PREVIOUS round's table: label <-
        # prev_label(label).  Every label value is a node id present in the
        # table (labels start as ids and only copy existing values), so the
        # join is total; coalesce is belt.  Jumping via the stale table
        # instead of `merged` itself is still a sound accelerator — labels
        # only decrease, and any copy of an existing label preserves the
        # invariant — and it buys the round's whole cost model: no
        # mid-round checkpoint of `merged` (the old self-join also tripped
        # Catalyst constraint inference on the union+aggregate subtree),
        # and the round's single lazy checkpoint is materialized by the
        # convergence aggregate.  One job per round, vs three.
        #
        # Convergence is unaffected: a round that leaves sum(label) fixed
        # means hash-min changed nothing, so labels are edge-constant —
        # every edge (u,v) has label(u) == label(v) — and since labels
        # propagate only inside a component from init values ≤ the member
        # ids, the constant is the component minimum: the true fixpoint.
        jumped = (
            merged.join(
                labels.select(
                    F.col("node").alias("label"), F.col("label").alias("ll")
                ),
                "label",
                "left",
            )
            .select(
                "node",
                F.coalesce(F.least("label", "ll"), F.col("label")).alias("label"),
            )
        )
        labels = jumped.localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select("node", F.col("label").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no convergence in {max_iters} rounds")


def incremental_components(
    state: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Merge a batch of NEW edges into an existing ``(node, component)``
    assignment without re-closing untouched components.

    Contract: given ``state = connected_components(old_edges)``, returns a
    frame equal to ``connected_components(old_edges ∪ new_edges)`` — the
    incremental-maintenance identity the driver oracle verifies by full
    recompute.  Correctness rests on two facts: (1) a component's label is
    the min member id, and that member is linked to every other member by
    the state rows themselves, so replaying ``node→component`` state rows
    as edges preserves exactly the old connectivity inside each touched
    component; (2) components not touched by any new-edge endpoint cannot
    change, so their rows pass through verbatim.

    Scale shape (the reason this exists): at 100 TB the standing component
    state is billions of rows while a daily edge batch touches a sliver of
    it.  The two state splits are broadcast semi/anti joins against the
    (small) touched-component list — ZERO shuffle of the standing state —
    and the iterative hash-min loop runs only over new edges plus the
    members of touched components.  Re-running full CC per batch would
    re-shuffle the entire edge history every day instead.
    """
    new_edges = new_edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=True)
    batch_nodes = (
        new_edges.select(F.col("src").alias("node"))
        .unionByName(new_edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # Components with at least one endpoint in the batch.  Small by the
    # incremental premise — broadcast into both state splits below.
    touched = (
        state.join(F.broadcast(batch_nodes), "node", "left_semi")
        .select("component")
        .distinct()
    )
    active = state.join(F.broadcast(touched), "component", "left_semi")
    inert = state.join(F.broadcast(touched), "component", "left_anti")
    # Prior membership replayed as edges keeps every old member — and the
    # old min-id — reachable inside the mini-graph, so merged components
    # relabel to the true global minimum (same fixpoint as full recompute).
    member_edges = active.select(
        F.col("node").alias("src"), F.col("component").alias("dst")
    )
    relabeled = connected_components(
        new_edges.unionByName(member_edges), nodes=batch_nodes
    )
    return inert.select("node", "component").unionByName(
        relabeled.select("node", "component")
    )


def k_core(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 2,
    max_iters: int = 30,
) -> DataFrame:
    """k-core decomposition by iterative peel: repeatedly delete nodes of
    degree < k (undirected; input symmetrized) until the survivor set is
    stable; return ``(node, core_degree)`` — each survivor's degree WITHIN
    the core, ≥ k by the fixpoint.

    On a near-dup graph the k-core separates dense boilerplate families
    (template spam, mirrored sites — every member near-dups many others)
    from incidental chains of pairwise matches: chain links peel away,
    cliques survive.  Curation treats core membership as a
    delete-aggressively signal where chains get keep-best handling.

    Scale shape: each round is one degree aggregation plus two semi-joins
    of the (static-schema) edge list against the survivor set — the
    standard distributed peel.  Edge count is a strictly-decreasing
    convergence certificate, checked as one scalar per round; lineage is
    capped by per-round localCheckpoint exactly like connected_components.
    Rounds ≈ peel depth, which is tiny for the flat graphs dedup emits
    (the theoretical worst case is O(n) on a path, but a path has no
    2-core at all — it peels in ⌈n/2⌉ rounds of mass deletion only when
    k exceeds every degree, and the loop exits on the empty graph long
    before max_iters).
    """
    fwd = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
    rev = edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    sym = fwd.unionByName(rev).where(F.col("node") != F.col("nbr")).distinct()
    sym = sym.localCheckpoint(eager=True)
    n_edges = sym.count()
    for _ in range(max_iters):
        deg = sym.groupBy("node").agg(F.count(F.lit(1)).alias("core_degree"))
        keep = deg.where(F.col("core_degree") >= k).select("node")
        pruned = sym.join(keep, "node", "left_semi").join(
            keep.withColumnRenamed("node", "nbr"), "nbr", "left_semi"
        )
        pruned = pruned.localCheckpoint(eager=False)
        n_new = pruned.count()
        if n_new == n_edges:
            return deg.where(F.col("core_degree") >= k)
        sym, n_edges = pruned, n_new
        if n_edges == 0:
            return deg.where(F.lit(False))  # empty core, typed schema
    raise RuntimeError(f"k_core: no convergence in {max_iters} rounds")


def dedup_cluster_assignments(
    pair_df: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Near-dup pairs → per-doc cluster assignment with cluster size.

    ``component`` (min doc id in the cluster) is the canonical survivor:
    a curation pipeline keeps ``doc_id == cluster_id`` rows and drops the
    rest.  Only documents that participate in at least one pair appear.
    """
    from pyspark.sql import Window

    comp = connected_components(pair_df, src=id_a, dst=id_b)
    w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cluster_size"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
    personalization: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list; returns
    ``(node, rank)`` after ``iterations`` synchronous updates from a
    uniform 1/N start:

        rank(v) = (1-d)/N + d * Σ_{u→v} rank(u) / outdeg(u)

    The simple variant: dangling-node mass is dropped, not redistributed
    (documented so the oracle can reproduce it exactly).  Within a dedup
    pipeline this ranks documents by similarity-graph centrality — a
    centrality-based canonical pick, vs connected_components' min-id pick.

    With ``personalization`` (a single-column frame of seed node ids,
    restricted internally to nodes present in the graph), the teleport
    distribution concentrates uniformly on the seeds instead of 1/N —
    personalized PageRank (Haveliwala 2002): rank mass flows outward
    from a trusted seed set, the provenance-weighted centrality used for
    seed-anchored dedup picks and trust propagation.

    Scale: the edge list and out-degrees are static — computed once,
    localCheckpointed, and re-joined each round; only the node-sized rank
    table updates.  Each round is one join shuffle on ``src`` plus one
    aggregation shuffle on ``dst``; lineage is cut per round so the plan
    stays flat across iterations (same discipline as
    connected_components / ivf_train_centroids).  At 100 TB pre-partition
    edges by ``src`` so the per-round join co-locates.
    """
    # Checkpoint discipline (the sssp_weighted lesson): the EDGE list is
    # eagerly pinned — everything else derives from it and it re-enters
    # every round — while nodes/outdeg/tele are LAZY checkpoints whose
    # materialization rides an action that must run anyway (the node
    # count, the first iteration).  The old shape paid one synchronous
    # job per eager checkpoint (4 of them) before the first iteration
    # even started.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    e = e.where(F.col("src") != F.col("dst")).distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()  # materializes the lazy checkpoint
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=False
    )
    if personalization is None:
        tele = nodes.withColumn("tele", F.lit(1.0 / n))
    else:
        seeds = (
            personalization.select(
                F.col(personalization.columns[0]).alias("node")
            )
            .distinct()
            .join(nodes, "node")  # teleport only to nodes in the graph
        )
        k = seeds.count()
        if k == 0:
            raise ValueError("personalization has no nodes in the graph")
        tele = nodes.join(
            seeds.withColumn("_s", F.lit(1.0)), "node", "left"
        ).select(
            "node", (F.coalesce("_s", F.lit(0.0)) / k).alias("tele")
        )
    tele = tele.localCheckpoint(eager=False)
    ranks = tele.select("node", F.col("tele").alias("rank"))
    for i in range(iterations):
        contribs = (
            e.join(ranks, e["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(F.col("dst"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = tele.join(contribs, tele["node"] == contribs["dst"], "left").select(
            "node",
            (
                (1.0 - damping) * F.col("tele")
                + damping * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("rank"),
        )
        # Periodic (not per-round) lineage cut: e/outdeg/nodes are already
        # checkpointed leaves, so the only thing that grows is the rank
        # chain — a few joins per round.  Materializing every round costs a
        # full job per iteration (~0.3 s each on local[32]); every 8th
        # keeps the plan shallow at a fraction of that.
        if (i + 1) % 8 == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007) with a
    DETERMINISTIC update: each round every node adopts the most frequent
    label among its neighbors, ties broken by the smallest label; isolated
    rounds keep the current label.  Labels start as node ids, so after k
    rounds a node's label is a function of its k-hop neighborhood only —
    fixed ``iterations`` (no convergence probe) keeps the whole run a
    pure, replayable function of the edge set.

    Communities differ from connected components on bridge topologies:
    LPA splits weakly-joined dense clusters that CC necessarily merges.

    Scale: per round, one groupBy over (node, neighbor-label) pairs and a
    per-node arg-max window — both keyed by node ids only; the undirected
    doubling is a projection, not a shuffle.  Hub skew: the (node, label)
    pre-aggregation combines map-side, so a hub's updates arrive as
    partial counts, never raw neighbor rows.
    """
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    # und re-enters every round's join: persist so the (possibly
    # expensive) edge lineage computes once — intra-job cache reuse;
    # callers/bench release via clearCache.
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionAll(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .persist()
    )
    labels = (
        und.select(F.col("u").alias("node"))
        .dropDuplicates()
        .select("node", F.col("node").alias("label"))
    )
    for _ in range(iterations):
        nbr = und.join(
            labels.select(F.col("node").alias("v"), "label"), "v"
        ).select(F.col("u").alias("node"), "label")
        counts = nbr.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        w = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 6,
) -> DataFrame:
    """Multi-source breadth-first search: ``(node, hops)`` giving each
    node's minimum hop distance to ANY seed over the undirected edge set,
    exploring at most ``max_hops`` levels (unreached nodes are absent).

    Classic frontier expansion — the per-round work is ONE join of the
    static symmetrized edge list against the CURRENT frontier (not the
    whole visited set), an anti-join to drop already-visited nodes, and a
    count that doubles as the round's materializing action.  Frontiers
    shrink as the reachable set saturates, so total cost is
    O(edges × rounds-touched), the standard Pregel BFS cost model; as in
    :func:`connected_components`, ``localCheckpoint`` caps lineage so
    round N's plan does not nest rounds 1..N-1.

    Seeds outside the edge set still return ``hops = 0`` (distance to
    themselves), matching the declarative min-over-paths semantics a
    recursive-CTE oracle computes.
    """
    edges = edges.localCheckpoint(eager=True)
    fwd = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    rev = edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))
    sym = fwd.unionByName(rev).where(F.col("s") != F.col("d")).distinct()
    sym = sym.localCheckpoint(eager=True)

    visited = (
        seeds.select(F.col(seeds.columns[0]).cast("bigint").alias("node"))
        .distinct()
        .withColumn("hops", F.lit(0).cast("int"))
        .localCheckpoint(eager=True)
    )
    frontier = visited.select("node")
    for hop in range(1, max_hops + 1):
        nxt = _bfs_round(sym, frontier, visited, hop).localCheckpoint(
            eager=False
        )
        # The count materializes the lazy checkpoint AND is the
        # termination probe — one job per round.
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return visited


def _bfs_round(
    sym: DataFrame, frontier: DataFrame, visited: DataFrame, hop: int
) -> DataFrame:
    """One BFS expansion round — the unit the SCALING.md claim and its
    plan gate (TestRound14Plans) hold to: the static edge list joins
    against the FRONTIER (never the visited set, whose size only grows),
    then one anti-join drops already-visited nodes.  Split out of
    bfs_hops so the round's plan shape is machine-checkable."""
    return (
        sym.join(frontier.withColumnRenamed("node", "s"), "s")
        .select(F.col("d").alias("node"))
        .distinct()
        .join(visited.select("node"), "node", "left_anti")
        .withColumn("hops", F.lit(hop).cast("int"))
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    max_iters: int = 30,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components by LARGE-STAR / SMALL-STAR alternation
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the HUB-SAFE fallback to hash-min ``connected_components``.

    Why a second algorithm: hash-min keeps the EDGE SET static and joins
    the label table against it every round — on a hub-heavy graph (one
    shingle/chunk shared by millions of documents) the propagation join
    concentrates that hub's entire neighborhood into one task every
    round.  The star algorithms instead REWRITE the edge set each round:

    - large-star(u): attach every neighbor v > u to m = min(N(u) ∪ {u})
    - small-star(u): orient edges high→low; attach every low-neighbor
      and u itself to the minimum

    Each phase is one map-side-combinable min aggregate plus one
    co-partitioned self-join on u, and a hub's neighborhood collapses to
    direct root edges after the first alternation — the edge list only
    shrinks toward the final star forest, so later rounds get CHEAPER
    on exactly the graphs that hurt hash-min.  Convergence in
    O(log n) alternations with high probability (paper Thm 3).

    Same contract as ``connected_components``: (node, component) with
    component = min reachable id; singletons via ``nodes``.  Equivalence
    against hash-min and a recursive-CTE closure is pinned on planted-hub
    fixtures in tests/test_operators.py::TestStarComponents, including a
    round-count bound."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("lo"),
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
        )
        .where(F.col("lo") != F.col("hi"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = nodes

    def _cert(frame: DataFrame) -> tuple:
        row = frame.agg(
            F.count(F.lit(1)), F.sum("lo"), F.sum("hi")
        ).collect()[0]
        return tuple(row)

    prev = _cert(e)
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # ---- large-star: symmetric adjacency, attach big neighbors to min
        adj = e.select(F.col("lo").alias("u"), F.col("hi").alias("v")).unionByName(
            e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        )
        m = adj.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least("u", "mn").alias("m"))
        e1 = (
            adj.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
            .where(F.col("lo") != F.col("hi"))
            .distinct()
        )
        # ---- small-star: high->low orientation, attach low side + self
        adj2 = e1.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        m2 = adj2.groupBy("u").agg(F.min("v").alias("m"))
        sm = (
            adj2.join(m2, "u")
            .select(F.col("m").alias("lo"), F.col("v").alias("hi"))
            .unionByName(
                m2.select(F.col("m").alias("lo"), F.col("u").alias("hi"))
            )
            .where(F.col("lo") != F.col("hi"))
            .select(
                F.least("lo", "hi").alias("lo"), F.greatest("lo", "hi").alias("hi")
            )
            .distinct()
        )
        e = sm.localCheckpoint(eager=False)
        cur = _cert(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components_star: no convergence in {max_iters} rounds"
        )
    if stats is not None:
        stats["rounds"] = rounds

    # Star forest -> labels: every hi points at its root lo; roots and
    # isolated nodes label themselves.
    member = e.groupBy(F.col("hi").alias("node")).agg(F.min("lo").alias("component"))
    roots = (
        e.select(F.col("lo").alias("node"))
        .distinct()
        .join(member.select("node"), "node", "left_anti")
        .withColumn("component", F.col("node"))
    )
    labels = member.unionByName(roots)
    if all_nodes is not None:
        extra = (
            all_nodes.select(F.col(all_nodes.columns[0]).alias("node"))
            .distinct()
            .join(labels.select("node"), "node", "left_anti")
            .withColumn("component", F.col("node"))
        )
        labels = labels.unionByName(extra)
    return labels


def sssp_weighted(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    rounds: int = 4,
) -> DataFrame:
    """Multi-source weighted shortest paths, Bellman-Ford style: after
    ``rounds`` relaxations, ``(node, dist)`` is the exact minimum path
    weight from ANY seed over paths of at most ``rounds`` edges
    (unreached nodes absent).  Weights must be non-negative integers —
    integer distance arithmetic keeps every relaxation and the final
    min bit-deterministic across engines and partitionings, which is
    what lets a recursive-CTE oracle replay the fixpoint.

    Each round is ONE join of the static symmetrized edge list against
    the current distance frame + a min-aggregate — the Pregel SSSP cost
    model, O(edges) per round with map-side-combining mins.

    Checkpoint discipline (measured at sf0.1, quiet-window A/B): the
    symmetrized edge list is EAGERLY localCheckpoint'ed — it re-enters
    every round, and pinning it as one up-front job truncates the
    (large) edge-build subtree out of every later plan; each ROUND's
    frame is LAZILY localCheckpoint'ed — dist_r is referenced TWICE by
    round r+1 (the relax branch and the union branch), so without a
    lineage cut the logical tree doubles per round, but eager per-round
    cuts cost one blocking job per round (pure overhead: 6.7-7.6 s vs
    ~4.2 s for the lazy form; a plain persist() is worst of all, 10-26 s
    — the exponential analyzed tree survives and every action pays
    cache-manager canonicalization over it).

    The edge list is NOT pre-deduplicated: the per-round min-fold
    absorbs multi-edges (a duplicate (s,d,w) row can never change a
    minimum), so a groupBy(s,d).min(w) before the loop would be one
    full shuffle of the edge list bought back only when callers pass
    heavy multi-edge inputs — the near-dup-graph callers pass unique
    pairs.  The hop cap is the distributed-world contract (bounded
    rounds, like the fixed-round PageRank/LPA); diameter-unbounded
    graphs iterate until a round changes nothing.
    """
    fwd = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d"), F.col(weight).alias("w")
    )
    rev = edges.select(
        F.col(dst).alias("s"), F.col(src).alias("d"), F.col(weight).alias("w")
    )
    sym = (
        fwd.unionByName(rev)
        .where(F.col("s") != F.col("d"))
        .localCheckpoint(eager=True)
    )
    dist = (
        seeds.select(F.col(seeds.columns[0]).cast("bigint").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("bigint"))
    )
    for _ in range(rounds):
        relaxed = (
            sym.join(dist.withColumnRenamed("node", "s"), "s")
            .select(
                F.col("d").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return dist
