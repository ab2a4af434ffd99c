"""The npt backend: a deterministic numpy transformer executing the
reference's scheme-gather classifier head (reference src/models.py:62-94,
--classification_scheme default 2) — the runtime shape the env-gated hf
backend can't exercise without torch wheels.

Key properties pinned here:
- the gather really reads the hidden state at each marker's position;
- partition invariance: since r6 the scorer runs the forward per row at
  that row's own width, so a row's logits are a function of its tokens
  alone — EXACT invariance to Arrow batch boundaries and partitionings
  by construction (verified end-to-end: repartitioning the candidates
  does not change a single emitted triple or score). The batched
  forward's padding invariance (masked keys carry exactly zero
  attention weight; residual BLAS drift ≤1e-12 over the padded width)
  is still pinned separately — it is what makes the per-row and batched
  paths agree;
- entity-centered truncation keeps all four markers, so the head's
  one-occurrence precondition holds for every pipeline-produced row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from clinicaltransformerrelationextraction_spark.config import (
    SPEC_TAGS, PipelineConfig,
)
from clinicaltransformerrelationextraction_spark.operators.minibert import (
    CLS_ID, HIDDEN, SEP_ID, TAG_IDS, NptModel, encode_batch,
    make_npt_scorer,
)

S1 = "the drug [s1] aspirin [e1] was given"
S2 = "for [s2] headache [e2] relief"


def test_sep_mode_encoding_shape_and_markers():
    ids, mask, segs = encode_batch([S1], [S2], 0, 512)
    row = ids[0]
    assert row[0] == CLS_ID
    assert (row == SEP_ID).sum() == 2
    # each marker appears exactly once, with its dedicated id
    for tag in SPEC_TAGS:
        assert (row == TAG_IDS[tag]).sum() == 1
    # segment 0 covers [CLS] s1 [SEP], segment 1 the rest
    first_sep = int(np.flatnonzero(row == SEP_ID)[0])
    assert segs[0, : first_sep + 1].max() == 0
    assert segs[0, first_sep + 1 :][mask[0, first_sep + 1 :] > 0].min() == 1


def test_uni_mode_encoding():
    ids, mask, segs = encode_batch([S1], [S2], 1, 512)
    row = ids[0]
    assert row[0] == CLS_ID and (row == SEP_ID).sum() == 1
    assert segs.max() == 0


def test_scheme2_gather_reads_marker_positions():
    ids, mask, segs = encode_batch([S1, S1], [S2, "x [s2] y [e2] z"], 0, 512)
    model = NptModel(5, scheme=2)
    seq_output, pooled = model.forward(ids, mask, segs)
    for tag in SPEC_TAGS:
        rep = model.gather_tag(seq_output, ids, tag)
        for r in range(ids.shape[0]):
            p = int(np.flatnonzero(ids[r] == TAG_IDS[tag])[0])
            assert np.array_equal(rep[r], seq_output[r, p])


def test_scheme_head_shapes_match_reference():
    # models.py:49-57 — h*3 (1), h*5 (2), h*2 (3), h (0)
    for scheme, parts in {0: 1, 1: 3, 2: 5, 3: 2}.items():
        assert NptModel(7, scheme).wc.shape == (parts * HIDDEN, 7)
    with pytest.raises(ValueError, match="classification_scheme"):
        NptModel(7, scheme=4)


def test_scheme_changes_logits():
    ids, mask, segs = encode_batch([S1], [S2], 0, 512)
    outs = [NptModel(5, s).logits(ids, mask, segs) for s in (0, 1, 2, 3)]
    for a in range(len(outs)):
        for b in range(a + 1, len(outs)):
            assert not np.allclose(outs[a], outs[b])


def test_padding_invariance():
    long_s1 = "tok " * 80 + "[s1] aspirin [e1] end"
    ids_a, m_a, s_a = encode_batch([S1], [S2], 0, 512)
    ids_b, m_b, s_b = encode_batch([S1, long_s1], [S2, S2], 0, 512)
    assert ids_b.shape[1] > ids_a.shape[1]  # row 0 really is padded in b
    model = NptModel(5, scheme=2)
    alone = model.logits(ids_a, m_a, s_a)[0]
    batched = model.logits(ids_b, m_b, s_b)[0]
    # identical up to BLAS accumulation order over the padded width;
    # far inside the scorer's 9-decimal rounding
    assert np.allclose(alone, batched, rtol=0, atol=1e-10)
    assert alone.argmax() == batched.argmax()


def test_missing_marker_raises():
    ids, mask, segs = encode_batch(["no markers here"], ["none"], 0, 512)
    model = NptModel(5, scheme=2)
    with pytest.raises(ValueError, match=r"\[s1\] occurs 0x"):
        model.logits(ids, mask, segs)


def test_dirty_text_with_literal_marker_survives():
    """Web text can itself contain a marker-like token; the reference
    crashes on such rows (misaligned rep stack) — the npt gather
    resolves duplicates to the occurrence consistent with the clean
    marker layout (minimal-span open/close pairing, r6) so one dirty
    row can't kill a corpus job AND the gathered representation is the
    real entity's, not the prose lookalike's."""
    from clinicaltransformerrelationextraction_spark.operators.minibert import (  # noqa: E501
        resolve_marker_position,
    )

    dirty_s2 = "prose mentions [s2] twice for [s2] headache [e2] relief"
    ids, mask, segs = encode_batch([S1, S1], [S2, dirty_s2], 0, 512)
    model = NptModel(5, scheme=2)
    out = model.logits(ids, mask, segs)
    assert out.shape == (2, 5) and np.isfinite(out).all()
    # clean row unaffected by sharing a batch with the dirty one
    solo = model.logits(*encode_batch([S1], [S2], 0, 512))
    assert np.allclose(out[0], solo[0], rtol=0, atol=1e-10)
    # the resolved [s2] is the SECOND occurrence — the one whose span to
    # [e2] is minimal (the marker truncation actually wrote), not the
    # prose lookalike that appears first
    row = ids[1]
    s2_positions = np.flatnonzero(row == TAG_IDS["[s2]"])
    assert len(s2_positions) == 2
    assert resolve_marker_position(row, "[s2]") == int(s2_positions[1])
    # the close tag is unique, so it resolves to itself either way
    e2_positions = np.flatnonzero(row == TAG_IDS["[e2]"])
    assert resolve_marker_position(row, "[e2]") == int(e2_positions[0])
    # partner entirely absent -> deterministic first-occurrence fallback
    no_close = np.array([TAG_IDS["[s2]"], 99, TAG_IDS["[s2]"], 98])
    assert resolve_marker_position(no_close, "[s2]") == 0


def test_unfittable_marker_cores_raise_descriptively():
    # both sides are pure marker cores wider than the budget: encode must
    # raise the shared budget error, not emit an over-budget row that
    # would crash later in forward (or silently violate max_seq_len)
    core_a = "[s1] " + "e " * 30 + "[e1]"
    core_b = "[s2] " + "d " * 30 + "[e2]"
    with pytest.raises(ValueError, match="cannot fit"):
        encode_batch([core_a.strip()], [core_b.strip()], 0, 16)


def test_max_seq_len_beyond_position_table_raises():
    from clinicaltransformerrelationextraction_spark.operators.minibert import (  # noqa: E501
        MAX_POS,
    )

    with pytest.raises(ValueError, match=str(MAX_POS)):
        make_npt_scorer(
            PipelineConfig(scorer="npt", max_seq_len=MAX_POS + 1), ["a"]
        )


def test_bad_npt_config_fails_fast_on_driver():
    """_resolve_factory runs the factory's validate hook at plan time —
    a bad config must raise on the driver, not as retried executor task
    errors (no Spark session involved here at all)."""
    from clinicaltransformerrelationextraction_spark.operators.minibert import (  # noqa: E501
        MAX_POS,
    )
    from clinicaltransformerrelationextraction_spark.operators.scoring import (  # noqa: E501
        _resolve_factory,
    )

    with pytest.raises(ValueError, match=str(MAX_POS)):
        _resolve_factory(PipelineConfig(scorer="npt",
                                        max_seq_len=MAX_POS + 1))
    with pytest.raises(ValueError, match="classification_scheme"):
        _resolve_factory(PipelineConfig(scorer="npt",
                                        classification_scheme=9))
    # a good config resolves without building anything
    assert _resolve_factory(PipelineConfig(scorer="npt")) is not None


def test_truncation_keeps_all_markers():
    huge = "w " * 600 + "[s1] aspirin [e1] " + "v " * 600
    ids, mask, segs = encode_batch([huge.strip()], [S2], 0, 128)
    assert ids.shape[1] <= 128
    for tag in SPEC_TAGS:
        assert (ids[0] == TAG_IDS[tag]).sum() == 1


def test_scorer_batch_contract():
    pdf = pd.DataFrame({"s1_marked": [S1] * 3, "s2_marked": [S2] * 3})
    scorer = make_npt_scorer(PipelineConfig(scorer="npt"), ["a", "b", "c"])
    idx, score = scorer(pdf)
    assert idx.shape == (3,) and score.shape == (3,)
    assert ((score > 0) & (score <= 1)).all()
    # identical rows -> identical outputs (deterministic weights)
    assert len(set(idx.tolist())) == 1 and len(set(score.tolist())) == 1


def test_npt_pipeline_partition_invariant(spark):
    """End-to-end through run_pipeline, and the distributed property the
    padding invariance buys: batch/partition boundaries don't change any
    emitted triple or score."""
    from pyspark.sql import functions as F

    from clinicaltransformerrelationextraction_spark.plans.pipeline import (
        load_documents, run_pipeline,
    )
    from tests.conftest import SF_SMOKE

    docs = load_documents(spark, SF_SMOKE).filter(F.col("doc_id") < 30)
    cfg = PipelineConfig(scorer="npt", batch_size=64)
    base = run_pipeline(docs, cfg).triples
    repart = run_pipeline(docs.repartition(7), cfg).triples
    rows_a = sorted(map(tuple, base.collect()))
    rows_b = sorted(map(tuple, repart.collect()))
    assert rows_a == rows_b
    assert len(rows_a) > 0
    # uni mode + non-default scheme also run end-to-end
    alt = run_pipeline(
        docs,
        PipelineConfig(scorer="npt", data_format_mode=1,
                       classification_scheme=3),
    ).triples
    assert alt.count() >= 0


def test_scorer_exact_rowwise_invariance():
    """r6: the scorer's per-row forward makes batch invariance EXACT —
    scoring rows together is bit-identical (==, not allclose) to scoring
    each row alone, including rows of very different lengths (the shape
    that maximized padded-width drift in the batched path)."""
    long_s1 = ("w " * 80).strip() + " [s1] aspirin [e1] " + ("v " * 80).strip()
    pdf = pd.DataFrame(
        {
            "s1_marked": [S1, long_s1, "[s1] a [e1]"],
            "s2_marked": [S2, S2, "[s2] b [e2]"],
        }
    )
    scorer = make_npt_scorer(PipelineConfig(scorer="npt"), ["a", "b", "c"])
    idx_all, score_all = scorer(pdf)
    for r in range(len(pdf)):
        idx_one, score_one = scorer(pdf.iloc[[r]].reset_index(drop=True))
        assert idx_all[r] == idx_one[0]
        assert score_all[r] == score_one[0]  # bit-exact, not approx


def test_scorer_empty_batch():
    """Empty Arrow batches are a legal scorer input (register_scorer
    contract): encode_batch early-returns (0, 0) arrays and the scorer
    yields empty outputs instead of raising (r6 advice item)."""
    pdf = pd.DataFrame({"s1_marked": [], "s2_marked": []})
    scorer = make_npt_scorer(PipelineConfig(scorer="npt"), ["a", "b"])
    idx, score = scorer(pdf)
    assert idx.shape == (0,) and score.shape == (0,)


def test_model_logits_empty_batch():
    """The BATCHED model API honors the empty-input contract too (r7,
    advice item): NptModel.logits on (0, 0) encode output returns a
    (0, n_labels) logit matrix instead of raising on a zero-size
    reduction inside forward/gather."""
    import numpy as np

    from clinicaltransformerrelationextraction_spark.operators.minibert import (
        NptModel,
    )

    model = NptModel(n_labels=3, scheme=2)
    ids = np.zeros((0, 0), dtype=np.int64)
    out = model.logits(ids, ids.astype(np.float64), ids)
    assert out.shape == (0, 3)
