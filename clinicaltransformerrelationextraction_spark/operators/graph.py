"""Graph analytics over the materialized (subj, pred, obj) triple table —
what a consumer of the KG runs after materialization (the 'graph
materialize' leg of the north rule).

All queries read the LINKED triples (canonical entity ids from the
broadcast alias dictionary, operators/linking.py J4 pattern), so edges are
entity-level, not mention-level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import PipelineConfig

__all__ = [
    "q_graph_degree", "q_graph_two_hop", "q_graph_pagerank",
    "q_graph_components", "q_graph_triangles",
]

PR_ITERS = 3  # fixed iteration count (cross-engine: both run exactly K)
PR_UNIT = 1_000_000  # micro-unit fixed point; all arithmetic is integer


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
    side is the standard edge-join power iteration with lineage cut per
    round; dangling nodes simply contribute nothing (their mass exits,
    the usual simplification)."""
    edges = (
        _linked(spark, sf)
        .select(
            F.col("subj_canonical").alias("src"),
            F.col("obj_canonical").alias("dst"),
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("entity"))
        .unionByName(edges.select(F.col("dst").alias("entity")))
        .distinct()
        .localCheckpoint()
    )
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
        ranks = (
            nodes.join(contrib, "entity", "left")
            .select(
                "entity",
                (
                    F.lit(150_000).cast("long")
                    + F.expr("(85 * coalesce(s, 0L)) div 100")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks


def q_graph_two_hop(spark: SparkSession, sf: str) -> DataFrame:
    """Two-hop path census: count paths s -p1-> m -p2-> o per (p1, p2)
    predicate pair, DISTINCT edges first (the multigraph has one edge per
    doc mention; path semantics are entity-level). The self-join keys on
    the shared middle entity — at scale this is the classic edge-table
    self-join that AQE plans from edge-count stats (never broadcast: edges
    grow with the corpus)."""
    t = _linked(spark, sf).select(
        "subj_canonical", "pred", "obj_canonical"
    ).distinct()
    a = t.alias("a")
    b = t.alias("b")
    return (
        a.join(b, F.col("a.obj_canonical") == F.col("b.subj_canonical"))
        .groupBy(
            F.col("a.pred").alias("p1"), F.col("b.pred").alias("p2")
        )
        .agg(F.count("*").alias("n_paths"))
    )


def _undirected(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical undirected edge set (a < b, self-loops dropped) of the
    entity graph."""
    t = _linked(spark, sf)
    return (
        t.select(
            F.least("subj_canonical", "obj_canonical").alias("a"),
            F.greatest("subj_canonical", "obj_canonical").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def q_graph_components(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components of the (undirected) canonical entity graph:
    every entity labeled with the lexicographic-min entity of its
    component (the canonical cluster representative), plus an is_root
    flag — the same keeper-assignment shape as near-dup dedup clusters.

    Iterative min-label propagation with a per-round lineage cut
    (localCheckpoint); rounds = component diameter. At 10^9+ nodes the
    same join primitive runs as large-star/small-star contraction
    (O(log n) rounds). The DuckDB oracle computes the identical fixpoint
    as a recursive transitive closure + min."""
    und = _undirected(spark, sf)
    edges = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("entity")).distinct().localCheckpoint()
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
            .localCheckpoint()
        )
        changed = step.filter(F.col("changed") == 1).count()
        labels = step.select("entity", "component")
        if changed == 0:
            break
    return labels.withColumn(
        "is_root", (F.col("entity") == F.col("component")).cast("int")
    )


def q_graph_triangles(spark: SparkSession, sf: str) -> DataFrame:
    """Triangle census of the canonical entity graph: count closed
    triples a < b < c with all three edges present — two self-joins over
    the ordered edge list (the standard ordered-wedge plan: each triangle
    is generated exactly once, no /6 correction; AQE sizes the joins from
    edge stats; never broadcast — edges grow with the corpus)."""
    e = _undirected(spark, sf)
    ab = e.select(F.col("a"), F.col("b"))
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = e.select(F.col("a"), F.col("b").alias("c"))
    return (
        ab.join(bc, "b")
        .join(ac, ["a", "c"])
        .agg(F.count("*").alias("n_triangles"))
    )
