"""Scale features: salting equivalence, candidate-cap accounting, MLlib
MinHashLSH canonicalization, alias linking."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinicaltransformerrelationextraction_spark.config import PipelineConfig
from clinicaltransformerrelationextraction_spark.operators.candidates import (
    candidate_cap_stats,
    candidates,
)
from clinicaltransformerrelationextraction_spark.operators.linking import (
    alias_link,
    canonical_clusters_mllib,
)
from clinicaltransformerrelationextraction_spark.plans.pipeline import (
    load_documents,
    run_pipeline,
)
from tests.conftest import SF_SMOKE

KEY = ["doc_id", "rel_id", "subj_id", "obj_id", "pred"]


def test_salted_pipeline_equivalence(spark):
    """Salted repartition before scoring must not change a single triple."""
    docs = load_documents(spark, SF_SMOKE)
    plain = run_pipeline(docs, PipelineConfig(), salt=False).triples
    salted = run_pipeline(docs, PipelineConfig(), salt=True).triples
    assert plain.count() == salted.count()
    assert (
        plain.select(*KEY).exceptAll(salted.select(*KEY)).count() == 0
    )


def test_candidate_cap_accounting(spark):
    docs = load_documents(spark, SF_SMOKE)
    # uncapped accounting: nothing dropped, totals match actual candidates
    cfg = PipelineConfig(max_pairs_per_doc=10_000)
    stats = candidate_cap_stats(docs, cfg).collect()[0]
    assert stats.n_pairs_dropped == 0 and stats.n_docs_capped == 0
    assert stats.n_pairs_total == candidates(docs, cfg).count()

    # tight cap: dropped count exactly accounts for the reduction
    tight = PipelineConfig(max_pairs_per_doc=5)
    tstats = candidate_cap_stats(docs, tight).collect()[0]
    kept = candidates(docs, tight).count()
    assert tstats.n_pairs_total - tstats.n_pairs_dropped == kept
    assert tstats.n_docs_capped > 0


def test_mlp_scorer_backend(spark):
    """The compute-realistic MLP backend shares all plumbing with the stub:
    same schema, deterministic, valid labels, probability scores."""
    from clinicaltransformerrelationextraction_spark.config import LABELS
    from clinicaltransformerrelationextraction_spark.operators.scoring import (
        score_candidates,
    )

    docs = load_documents(spark, SF_SMOKE).limit(100)
    cfg = PipelineConfig(scorer="mlp")
    scored = score_candidates(candidates(docs, cfg), cfg)
    rows = scored.collect()
    assert rows and all(r.pred_label in LABELS for r in rows)
    assert all(0.0 < r.score <= 1.0 for r in rows)
    rows2 = score_candidates(candidates(docs, cfg), cfg).collect()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_hf_scorer_gated(spark):
    """The production HF backend raises the documented NotImplementedError
    in this container (transformers absent) — through the Spark surface."""
    import pytest

    from clinicaltransformerrelationextraction_spark.operators.scoring import (
        score_candidates,
    )

    docs = load_documents(spark, SF_SMOKE).limit(5)
    cfg = PipelineConfig(scorer="hf")
    with pytest.raises(Exception, match="transformers|NotImplemented"):
        score_candidates(candidates(docs, cfg), cfg).collect()


def test_alias_link_broadcast(spark):
    surf = spark.createDataFrame(
        [("Spark",), ("HASH",), ("unknown_word",)], ["surface"]
    )
    aliases = spark.createDataFrame(
        [("spark", "E_drug_spark"), ("hash", "E_drug_hash")],
        ["surface_norm", "canonical_id"],
    )
    out = {r.surface: r.canonical_id for r in alias_link(
        surf, aliases, "surface").collect()}
    assert out["Spark"] == "E_drug_spark"
    assert out["HASH"] == "E_drug_hash"
    assert out["unknown_word"] == "E_unknown_word"  # deterministic fallback


def test_mllib_minhash_canonicalization(spark):
    surfaces = spark.createDataFrame(
        [("penicillin",), ("penicilin",), ("penicillin vk",),
         ("warfarin",), ("aspirin",), ("asprin",)],
        ["surface"],
    )
    pairs = canonical_clusters_mllib(surfaces, jaccard_max=0.75).collect()
    got = {(r.surface_a, r.surface_b) for r in pairs}
    assert ("penicilin", "penicillin") in got
    assert ("aspirin", "asprin") in got
    # dissimilar surfaces must not merge
    assert not any("warfarin" in p and "aspirin" in p for p in got)


def test_simhash_band_pairs_superset_of_hamming3(spark):
    """Pigeonhole guarantee: 4 nibble bands catch every pair within
    hamming distance 3 — the banded equi-join is a superset of the
    close-pair set the brute cross join would find."""
    from clinicaltransformerrelationextraction_spark.operators.dedup import (
        q_simhash,
        q_simhash_band_pairs,
    )

    sh = dict(q_simhash(spark, SF_SMOKE).collect())
    band_pairs = {
        (r.doc_a, r.doc_b)
        for r in q_simhash_band_pairs(spark, SF_SMOKE).collect()
    }
    ids = sorted(sh)
    close = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sh[a] ^ sh[b]).count("1") <= 3
    }
    assert close <= band_pairs
    # hamming on the pair rows matches the fingerprints
    for r in q_simhash_band_pairs(spark, SF_SMOKE).collect():
        assert r.hamming == bin(sh[r.doc_a] ^ sh[r.doc_b]).count("1")


def test_embed_neardup_lsh_recall(spark):
    """Banded hyperplane LSH: candidates verified with the exact cosine are
    a SUBSET of the brute-force pairs; recall follows the LSH S-curve —
    on this corpus every pair with cos >= 0.5 is caught, and overall
    recall at the marginal 0.4 threshold stays above 0.5."""
    from clinicaltransformerrelationextraction_spark.operators.similarity import (
        q_embed_neardup,
        q_embed_neardup_lsh,
    )

    brute = {
        (r.vec_a, r.vec_b): r.cos
        for r in q_embed_neardup(spark, SF_SMOKE).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b) for r in q_embed_neardup_lsh(spark, SF_SMOKE).collect()
    }
    assert lsh <= set(brute)
    strong = {p for p, c in brute.items() if c >= 0.5}
    assert strong <= lsh, "high-similarity pair missed by the band join"
    assert len(lsh) / len(brute) >= 0.5


def test_ann_ivf_recall_vs_brute(spark):
    """IVF (nprobe=1 on the centroid codebook) trades recall for scan
    scope; on this clustered corpus recall@10 vs the brute top-k stays
    high. Also: every IVF hit must carry the same cosine the brute path
    computed (exact re-ranking within the cell)."""
    from clinicaltransformerrelationextraction_spark.operators.similarity import (
        q_ann_ivf_topk,
        q_ann_topk,
    )

    brute = {}
    for r in q_ann_topk(spark, SF_SMOKE).collect():
        brute.setdefault(r.query_id, {})[r.neighbor_id] = r.cos
    ivf = {}
    for r in q_ann_ivf_topk(spark, SF_SMOKE).collect():
        ivf.setdefault(r.query_id, {})[r.neighbor_id] = r.cos

    assert set(ivf) == set(brute)  # every query answered
    hits = total = 0
    for qid, want in brute.items():
        got = ivf.get(qid, {})
        inter = set(want) & set(got)
        hits += len(inter)
        total += len(want)
        for n in inter:
            assert abs(want[n] - got[n]) < 1e-12
    recall = hits / total
    assert recall >= 0.6, recall  # measured 0.65 at N_PROBE=4 of 10 cells


def test_ann_ivf_nprobe_dial(spark):
    """PipelineConfig.ann_nprobe is the IVF recall/cost dial: probing
    every cell must reproduce the brute top-k EXACTLY (IVF with full
    probe scope is exhaustive search), and recall must be monotone
    non-decreasing in nprobe."""
    from clinicaltransformerrelationextraction_spark.config import PipelineConfig
    from clinicaltransformerrelationextraction_spark.operators.similarity import (
        q_ann_ivf_topk,
        q_ann_topk,
    )

    brute = {
        (r.query_id, r.neighbor_id): r.rank
        for r in q_ann_topk(spark, SF_SMOKE).collect()
    }

    def recall_at(nprobe: int) -> float:
        cfg = PipelineConfig(ann_nprobe=nprobe)
        ivf = {
            (r.query_id, r.neighbor_id)
            for r in q_ann_ivf_topk(spark, SF_SMOKE, cfg).collect()
        }
        return len(ivf & set(brute)) / len(brute)

    r1, r4, r10 = recall_at(1), recall_at(4), recall_at(10)
    assert r10 == 1.0, r10  # full probe scope == exhaustive
    assert r1 <= r4 <= r10, (r1, r4, r10)
    assert r1 < 1.0, "nprobe=1 recalling everything means the dial is dead"


def test_pq_adc_recall_vs_exact_l2(spark):
    """PQ ADC is approximate by construction; recall@10 is measured
    against the EXACT squared-L2 top-k (PQ approximates L2, so cosine
    brute is the wrong baseline) and floor-asserted at the value the
    committed (PQ_M, PQ_SUB, PQ_SPLIT) parameters bought in the sweep
    (see similarity.py's parameter note). Codes must also round-trip:
    every vector gets exactly PQ_M codes."""
    from pyspark.sql import Window

    from clinicaltransformerrelationextraction_spark.operators.similarity import (
        N_QUERIES,
        PQ_M,
        TOPK,
        _q,
        _sq_l2,
        q_pq_ann_topk,
        q_pq_codes,
    )
    from pyspark.sql import functions as F

    codes = q_pq_codes(spark, SF_SMOKE)
    per_vec = codes.groupBy("vec_id").count().collect()
    assert all(r["count"] == PQ_M for r in per_vec)
    # and NO vector dropped: absent vec_ids would make the per-group
    # assertion vacuous
    assert len(per_vec) == _q(spark, SF_SMOKE).count()

    q = _q(spark, SF_SMOKE)
    qs = q.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("qe").alias("qv")
    )
    c = q.filter(F.col("vec_id") >= N_QUERIES).select(
        F.col("vec_id").alias("neighbor_id"), F.col("qe").alias("cv")
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    exact = (
        F.broadcast(qs).crossJoin(c)
        .select(
            "query_id", "neighbor_id",
            _sq_l2(F.col("qv"), F.col("cv")).alias("dist"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
    )
    want: dict[int, set] = {}
    for r in exact.collect():
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict[int, set] = {}
    for r in q_pq_ann_topk(spark, SF_SMOKE).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got) == set(want)
    hits = sum(len(want[k] & got[k]) for k in want)
    total = sum(len(v) for v in want.values())
    recall = hits / total
    # r6 exact re-rank stage: ADC-only measured 0.59 at (32, 2, 80
    # codes); the PQ_RERANK=40 shortlist + exact-L2 re-rank must clear
    # the production-grade floor
    assert recall >= 0.9, recall
