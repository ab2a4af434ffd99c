"""Incremental knowledge-graph + crawl-snapshot maintenance
(operators/incremental.py merge_components / merge_latest).

Equivalence contracts, each pinned against the from-scratch computation
whose corpus queries are oracle-verified (q_graph_components for
min_label_components, q_pages_latest for latest_partial) — the same
transitive-verification pattern as incremental dedup
(tests/test_incremental.py): for ANY split into old ∪ delta,

    merge_components(components(old), delta_edges) == components(old ∪ delta)
    merge_latest(latest_partial(old), delta_pages)  == latest_partial(all)

both exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clinicaltransformerrelationextraction_spark.functions.util import (
    ensure_parallelism,
)
from clinicaltransformerrelationextraction_spark.operators.dedup import (
    latest_partial,
    pages_with_crawl_ts,
)
from clinicaltransformerrelationextraction_spark.operators.graph import (
    min_label_components,
    undirected_edges,
)
from clinicaltransformerrelationextraction_spark.operators.incremental import (
    merge_components,
    merge_latest,
)
from clinicaltransformerrelationextraction_spark.plans.pipeline import (
    load_documents,
    run_linked,
)
from tests.conftest import SF_SMOKE


def _same(a, b) -> None:
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(x, y), max(x, y)) for x, y in pairs], "a string, b string"
    ).distinct()


def test_merge_components_synthetic_adversarial_split(spark):
    """Every merge shape at once: a delta edge bridging two old
    components, a brand-new component, a new entity attaching to an old
    component, an exact duplicate of an old edge, a redundant
    intra-component edge, and a new entity chaining THREE old components
    together — the contracted fixpoint must match the full recompute."""
    old = _edges(spark, [
        ("a1", "a2"), ("a2", "a3"),          # component A
        ("b1", "b2"),                          # component B
        ("c1", "c2"), ("c2", "c3"),          # component C
        ("d1", "d2"),                          # component D
    ])
    delta = _edges(spark, [
        ("a3", "b1"),                           # old-old bridge (A+B)
        ("n1", "n2"), ("n2", "n3"),          # new-only component
        ("c3", "n4"),                           # new node onto C
        ("a1", "a2"),                           # duplicate old edge
        ("c1", "c3"),                           # redundant intra-C edge
        ("d1", "n5"), ("n5", "b2"),          # new node chains D into A+B
    ])
    full = old.unionByName(delta).distinct()
    got = merge_components(min_label_components(old), delta)
    _same(got, min_label_components(full))
    # the chained merge really collapsed A, B and D into one component
    comps = {r.entity: r.component for r in got.collect()}
    assert comps["d2"] == comps["b2"] == comps["a3"] == "a1"
    assert comps["n1"] == "n1" and comps["n4"] == "c1"


def test_merge_components_new_entity_becomes_min_label(spark):
    """The relabel direction the adversarial test above never hits: a
    NEW entity that sorts below every old label must become the merged
    component's label, relabeling all historical members — the
    label-is-min-entity invariant has to hold in this direction too, or
    the NEXT ingest's contraction would be inexact."""
    old = _edges(spark, [("m1", "m2"), ("m2", "m3"), ("q1", "q2")])
    delta = _edges(spark, [("0x", "m2"), ("0a", "q1"), ("0a", "0b")])
    full = old.unionByName(delta).distinct()
    base = min_label_components(old)
    got = merge_components(base, delta)
    _same(got, min_label_components(full))
    comps = {r.entity: r.component for r in got.collect()}
    assert comps["m1"] == comps["m3"] == comps["0x"] == "0x"
    assert comps["q2"] == comps["0b"] == "0a"
    # and the merge COMPOSES from this state: a second delta contracting
    # against the new-entity labels is still exact
    delta2 = _edges(spark, [("m3", "q2")])
    _same(
        merge_components(got, delta2),
        min_label_components(full.unionByName(delta2).distinct()),
    )


def test_merge_components_degenerate_splits(spark):
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    empty = edges.limit(0)
    base = min_label_components(edges)
    # empty delta: labels unchanged
    _same(merge_components(base, empty), base)
    # empty old state: merge IS the from-scratch computation
    _same(
        merge_components(min_label_components(empty), edges),
        base,
    )


def test_merge_components_composes_across_ingests(spark):
    """Three sequential merges (the state-dir life cycle) end at the
    full recompute — the label-is-min-member invariant survives each
    merge, which is what makes contraction exact on the NEXT one."""
    rounds = [
        [("a", "b"), ("c", "d")],
        [("b", "c")],                    # bridges the two
        [("e", "f"), ("d", "e"), ("g", "h")],  # extends + new comp
    ]
    labels = min_label_components(_edges(spark, rounds[0]).limit(0))
    seen: list = []
    for r in rounds:
        labels = merge_components(labels, _edges(spark, r))
        seen += r
        _same(labels, min_label_components(_edges(spark, seen)))


def test_merge_components_real_entity_graph_doc_split(spark):
    """Triples are per-doc facts, so a doc-level corpus split induces an
    edge split; merging the delta docs' edges into the old docs' labeling
    equals components over the full corpus extraction."""
    docs = ensure_parallelism(load_documents(spark, SF_SMOKE))
    old_docs = docs.filter(F.col("doc_id") % 2 == 0)
    new_docs = docs.filter(F.col("doc_id") % 2 == 1)
    old_e = undirected_edges(run_linked(old_docs))
    delta_e = undirected_edges(run_linked(new_docs))
    full_e = undirected_edges(run_linked(docs))
    got = merge_components(min_label_components(old_e), delta_e)
    _same(got, min_label_components(full_e))
    assert got.count() > 0


def test_merge_latest_matches_full_aggregate(spark):
    """Folding three delta crawl logs sequentially equals the one-shot
    aggregate (q_pages_latest's oracle-verified shape) — counts sum, the
    (ts, doc_id) struct max re-maxes, and url groups that span deltas
    (RECRAWL_FANOUT siblings land in different doc_id % 3 classes) are
    exactly the interesting case."""
    docs = ensure_parallelism(load_documents(spark, SF_SMOKE))
    pages = pages_with_crawl_ts(docs)
    state = latest_partial(pages.limit(0))
    for i in range(3):
        state = merge_latest(
            state, pages.filter(F.col("doc_id") % 3 == i)
        )
    want = latest_partial(pages)
    _same(state, want)
    # recrawled urls really have multi-crawl counts (nonvacuous)
    assert want.filter(F.col("n_crawls") > 1).count() > 0


def test_merge_components_user_graph_day_split(spark):
    """Star co-action edges are per-(k, day) facts — a (k, day) group
    never spans days — so an events DAY DELTA yields exactly its own
    edges and the persisted user-component labeling folds it by
    contraction: the steady-state maintenance mode of
    q_graph_user_components (and the shape bench.py measures)."""
    from clinicaltransformerrelationextraction_spark.operators.graph import (
        user_star_edges_from_events,
    )

    ev = ensure_parallelism(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    )
    days = [r.d for r in ev.select(
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d")
    ).distinct().orderBy("d").collect()]
    assert len(days) >= 3  # the split must be nonvacuous
    cutoff = days[int(len(days) * 0.8)]
    is_new = F.date_trunc("day", F.col("ts").cast("timestamp")) >= F.lit(
        cutoff
    )
    old_e = user_star_edges_from_events(ev.filter(~is_new))
    delta_e = user_star_edges_from_events(ev.filter(is_new))
    assert delta_e.count() > 0
    got = merge_components(min_label_components(old_e), delta_e)
    _same(got, min_label_components(user_star_edges_from_events(ev)))
