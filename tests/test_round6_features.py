"""Round-6 additions beyond the driver registry: the composed IVF-PQ
ANN operator (cell-pruned ADC scan + exact re-rank) — registered as a
driver query when window slots open; until then its evidence is the
equality pin against the driver-verified q_pq_ann_topk and the recall
dial tests below."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinicaltransformerrelationextraction_spark.config import PipelineConfig
from tests.conftest import SF_SMOKE


def _exact_l2_topk(spark):
    from pyspark.sql import Window

    from clinicaltransformerrelationextraction_spark.operators.similarity import (
        N_QUERIES,
        TOPK,
        _q,
        _sq_l2,
    )

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
    return want


def _recall(got_rows, want):
    got: dict[int, set] = {}
    for r in got_rows:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got) == set(want)
    return sum(len(want[k] & got[k]) for k in want) / sum(
        len(v) for v in want.values()
    )


def test_ivf_pq_full_probe_equals_pq_rerank(spark):
    """At nprobe = n_cells the IVF cell restriction is vacuous, so the
    composed operator must equal the driver-verified q_pq_ann_topk
    EXACTLY — rows, ranks, and both distance columns."""
    from clinicaltransformerrelationextraction_spark.operators.similarity import (
        ann_ivf_pq_topk,
        q_pq_ann_topk,
    )

    n_cells = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .select("label").distinct().count()
    )
    full = sorted(
        map(tuple, ann_ivf_pq_topk(
            spark, SF_SMOKE, PipelineConfig(ann_nprobe=n_cells)
        ).collect())
    )
    ref = sorted(map(tuple, q_pq_ann_topk(spark, SF_SMOKE).collect()))
    assert full == ref
    assert len(full) > 0


def test_ivf_pq_recall_dial(spark):
    """Recall@10 vs the exact squared-L2 top-k: monotone in nprobe, a
    real dial (nprobe=1 prunes), and the default config clears a floor
    worth shipping — the composition must not lose the re-rank's
    quality on the probed cells."""
    from clinicaltransformerrelationextraction_spark.operators.similarity import (
        ann_ivf_pq_topk,
    )

    want = _exact_l2_topk(spark)
    rec = {
        n: _recall(
            ann_ivf_pq_topk(
                spark, SF_SMOKE, PipelineConfig(ann_nprobe=n)
            ).collect(),
            want,
        )
        for n in (1, 4, 10)
    }
    # near-monotone, with a small tolerance: strict monotonicity in
    # nprobe is NOT structurally guaranteed — the fixed PQ_RERANK-deep
    # adist shortlist can evict a true neighbor when newly probed cells
    # contribute vectors with smaller approximate but worse exact
    # distance (review finding, r6). On the current fixture it is
    # strictly monotone; the tolerance keeps a regenerated embeddings
    # table from flaking a correct operator.
    assert rec[1] <= rec[4] + 0.05 and rec[4] <= rec[10] + 0.05, rec
    assert rec[1] < 1.0, "nprobe=1 recalling everything means a dead dial"
    # measured at the shipped (PQ_M=32, PQ_SUB=2, PQ_RERANK=40) params:
    # the full-probe composition equals the PQ re-rank path (0.94 at
    # sf0.001); the default nprobe=4 floor is asserted below
    assert rec[4] >= 0.5, rec
    assert rec[10] >= 0.9, rec


def test_ivf_pq_plan_broadcasts_everything_small(spark):
    """The cell-pruned ADC scan must stay broadcast-only: codebook,
    probed-cell list, distance tables, shortlist, and query vectors all
    broadcast — no SortMergeJoin anywhere, so the only corpus-sized
    frames ever shuffled are the code/cell rows themselves."""
    from clinicaltransformerrelationextraction_spark.operators.similarity import (
        ann_ivf_pq_topk,
    )

    plan = (
        ann_ivf_pq_topk(spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 5, plan
