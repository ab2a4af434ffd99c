"""Incremental (delta-vs-index) deduplication — the operational mode of
dedup at 100 TB.

A production corpus is never re-deduped from scratch: the historical
state is two persisted tables — the LSH band index ``(doc_id, band,
bkey)`` (``dedup.bands_frame`` output, bucketed by ``(band, bkey)`` in a
real deployment) and the cluster labels ``(doc_id, cluster_id)``
(``q_dedup_clusters`` output) — and each new crawl delta is deduped in
three delta-bounded steps:

1. ``incremental_candidate_pairs``: band the DELTA only and equi-join its
   bands against (index ∪ delta bands). Every emitted pair has at least
   one new side — old-old pairs were already found when the old docs were
   themselves the delta. One shuffle on (band, bkey); with the index
   bucketed on that key only the delta moves.
2. ``incremental_verified_pairs``: exact-Jaccard verify, recomputing
   shingles ONLY for the delta plus the old docs that actually appear in
   a candidate pair (a delta-sized set — unlike the corpus-wide query,
   where the same semi-join was measured to lose because ~96% of docs
   participate, here restricting IS the point).
3. ``merge_clusters``: fold the verified delta edges into the existing
   labels by CONTRACTION — each old cluster enters the fixpoint as ONE
   node (its keeper id), so min-label propagation runs on a graph bounded
   by the delta size, never the corpus. Two old clusters bridged by a new
   doc merge exactly as they would in a full recompute, because an old
   cluster's label is already the min doc_id of its members.

Equivalence contract (pytest-pinned in tests/test_incremental.py): for
any split of a corpus into old ∪ delta,

    full-corpus pairs   == old-only pairs  ∪  incremental pairs
    full-corpus clusters == merge_clusters(old clusters, verified delta
                            edges, delta)

both exactly (same hash discipline, same JACCARD_MIN threshold).

Reference anchor: the reference has no incremental path (it re-reads the
full corpus per run, src/relation_extraction.py); this is the beyond-
reference scale surface the north rule's crawl setting requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    bands_frame,
    jaccard_verify,
    min_label_components,
    pair_shingle_stats,
    shingle_frame,
)


def incremental_candidate_pairs(
    old_index: DataFrame, new_docs: DataFrame
) -> DataFrame:
    """LSH candidate pairs with at least one side in the delta:
    ``(doc_a, doc_b, n_shared_bands)``, doc_a < doc_b.

    The delta's bands drive the join; the (index ∪ delta-bands) side is
    tagged so each pair is emitted exactly once per shared band:
    delta-old pairs only from the delta row, delta-delta pairs only from
    the lower doc_id. No bucket-group pass over the historical index —
    the corpus never re-bands."""
    new_b = bands_frame(new_docs).localCheckpoint()
    all_b = old_index.select("doc_id", "band", "bkey").withColumn(
        "is_new", F.lit(False)
    ).unionByName(new_b.withColumn("is_new", F.lit(True)))
    n, a = new_b.alias("n"), all_b.alias("a")
    j = n.join(
        a,
        (F.col("n.band") == F.col("a.band"))
        & (F.col("n.bkey") == F.col("a.bkey"))
        & (
            (~F.col("a.is_new") & (F.col("n.doc_id") != F.col("a.doc_id")))
            | (F.col("a.is_new") & (F.col("n.doc_id") < F.col("a.doc_id")))
        ),
    )
    return (
        j.select(
            F.least("n.doc_id", "a.doc_id").alias("doc_a"),
            F.greatest("n.doc_id", "a.doc_id").alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def incremental_verified_pairs(
    cand_pairs: DataFrame, old_docs: DataFrame, new_docs: DataFrame
) -> DataFrame:
    """Exact-Jaccard verify of the incremental candidate pairs:
    ``(doc_a, doc_b, inter, uni, jaccard)`` at or above JACCARD_MIN.

    Shingles are recomputed only for the delta and the old docs that
    appear in some candidate pair (left-semi join) — the delta-bounded
    restriction that makes the verify O(delta), not O(corpus)."""
    member = (
        cand_pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand_pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    involved = (
        old_docs.select("doc_id", "text")
        .join(member, "doc_id", "left_semi")
        .unionByName(new_docs.select("doc_id", "text"))
    )
    stats = pair_shingle_stats(
        cand_pairs.select("doc_a", "doc_b"), shingle_frame(involved)
    )
    return jaccard_verify(stats)


def merge_clusters(
    old_labels: DataFrame, verified_pairs: DataFrame, new_docs: DataFrame
) -> DataFrame:
    """Fold verified delta edges into existing cluster labels, returning
    the same shape as ``q_dedup_clusters``: ``(doc_id, cluster_id,
    is_keeper)`` covering every old AND new doc.

    Contraction: each endpoint is mapped to its representative — an old
    doc to its existing cluster_id (already the min doc_id of that
    cluster), a new doc to itself — and min-label propagation runs over
    the contracted edges only. The corpus-sized ``old_labels`` table is
    touched by exactly two single-pass joins (representative lookup, and
    the final label rewrite); the iterative loop never sees it."""
    e = verified_pairs.select("doc_a", "doc_b")
    rep = old_labels.select("doc_id", F.col("cluster_id").alias("rep"))
    # endpoint -> representative; a doc absent from old_labels is a delta
    # doc and represents itself
    ea = e.join(
        rep.withColumnRenamed("doc_id", "doc_a").withColumnRenamed(
            "rep", "rep_a"
        ),
        "doc_a",
        "left",
    ).join(
        rep.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
            "rep", "rep_b"
        ),
        "doc_b",
        "left",
    ).select(
        F.coalesce("rep_a", F.col("doc_a")).alias("doc_a"),
        F.coalesce("rep_b", F.col("doc_b")).alias("doc_b"),
    ).filter(F.col("doc_a") != F.col("doc_b"))
    merged, _ = min_label_components(ea)
    relabel = merged.withColumnRenamed("doc_id", "rep").withColumnRenamed(
        "cluster_id", "merged_cid"
    )
    out_old = (
        old_labels.select("doc_id", "cluster_id")
        .join(
            relabel.withColumnRenamed("rep", "cluster_id"),
            "cluster_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("merged_cid", F.col("cluster_id")).alias("cluster_id"),
        )
    )
    out_new = (
        new_docs.select("doc_id")
        .join(relabel.withColumnRenamed("rep", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("merged_cid", F.col("doc_id")).alias("cluster_id"),
        )
    )
    return out_old.unionByName(out_new).withColumn(
        "is_keeper", (F.col("doc_id") == F.col("cluster_id")).cast("int")
    )


def incremental_dedup(
    old_docs: DataFrame,
    old_index: DataFrame,
    old_labels: DataFrame,
    new_docs: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One delta ingestion step: returns ``(pairs, labels, index_delta)``
    — the verified new pairs, the updated full label table, and the
    delta's band index rows (append these to the persisted index; the
    historical rows are immutable)."""
    cand = incremental_candidate_pairs(old_index, new_docs)
    verified = incremental_verified_pairs(
        cand, old_docs, new_docs
    ).localCheckpoint()
    labels = merge_clusters(old_labels, verified, new_docs)
    return verified, labels, bands_frame(new_docs)
