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

__all__ = ["q_graph_degree", "q_graph_two_hop"]


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
