"""U2 tokenize/truncate semantics vs a slow pure-Python port of the
reference (_truncate_helper / _process_seq_len, sep + uni modes,
src/data_utils.py:330-370,420-445)."""

from __future__ import annotations

import random

import pytest

from clinicaltransformerrelationextraction_spark.config import (
    PipelineConfig,
    SPEC_TAGS,
)
from clinicaltransformerrelationextraction_spark.operators.scoring import (
    truncate_pair,
)
from clinicaltransformerrelationextraction_spark.operators.tokenize import (
    CLS_ID,
    SEP_ID,
    encode_pair,
    tokenize_features,
    truncate_uni,
)
from tests.conftest import SF_SMOKE

_TAGS = {t.lower() for t in SPEC_TAGS}


# --- slow reference port (whitespace tokenizer) ------------------------------

def _ref_truncate_helper(tokens: list[str]) -> list[str]:
    """Port of _truncate_helper: pop head iff head gap strictly larger."""
    spec = [i for i, tk in enumerate(tokens) if tk.lower() in _TAGS]
    i1, i2 = spec[0], spec[-1]
    head, tail = i1, (len(tokens) - 1) - i2
    if head == tail == 0:
        return tokens
    if head > tail:
        return tokens[1:]
    return tokens[:-1]


def _ref_process_seq_len(a: list[str], b: list[str], budget: int):
    """Port of RelationDataFormatSepProcessor._process_seq_len: alternate
    sides starting with a."""
    flag = True
    while len(a) + len(b) > budget:
        if flag:
            a = _ref_truncate_helper(a)
        else:
            b = _ref_truncate_helper(b)
        flag = not flag
    return a, b


def _ref_uni(toks: list[str], budget: int) -> list[str]:
    """Port of RelationDataFormatUniProcessor._process_seq_len."""
    toks = list(toks)
    while len(toks) > budget:
        t1, t2, t3, t4 = [
            i for i, w in enumerate(toks) if w.lower() in _TAGS
        ]
        mid = (len(toks) - 1) // 2
        a1, b1 = t1, (len(toks) - 1) - t4
        c1, d1 = mid - t2, t3 - mid
        m = max(a1, b1, c1, d1)
        if a1 == m:
            toks.pop(0)
        elif b1 == m:
            toks.pop(-1)
        elif c1 == m:
            toks.pop(t2 + c1 // 2)
        else:
            toks.pop(t3 - d1 // 2)
    return toks


def _mk_pair(rng, la_head, la_tail, lb_head, lb_tail):
    a = [f"a{i}" for i in range(la_head)] + ["[s1]", "ent", "[e1]"] + [
        f"A{i}" for i in range(la_tail)
    ]
    b = [f"b{i}" for i in range(lb_head)] + ["[s2]", "drug", "[e2]"] + [
        f"B{i}" for i in range(lb_tail)
    ]
    return a, b


def test_truncate_pair_tie_pops_tail():
    # entity exactly centered: head gap == tail gap -> reference pops TAIL
    a = ["w1", "w2", "[s1]", "e", "[e1]", "w3", "w4"]
    b = ["[s2]", "d", "[e2]"]
    got_a, got_b = truncate_pair(a, b, budget=len(a) + len(b) - 1)
    assert got_a == ["w1", "w2", "[s1]", "e", "[e1]", "w3"]
    assert got_b == b


def test_truncate_pair_fuzz_vs_reference_port():
    rng = random.Random(13)
    for _ in range(300):
        la_head, la_tail = rng.randint(3, 25), rng.randint(3, 25)
        lb_head, lb_tail = rng.randint(3, 25), rng.randint(3, 25)
        a, b = _mk_pair(rng, la_head, la_tail, lb_head, lb_tail)
        total = len(a) + len(b)
        # FULL input space down to budget=6 (= both [s] ent [e] cores):
        # the reference never pops past a side's marker core (its
        # head==tail==0 early return), so below 6 its loop would never
        # return — that boundary is the one case ours handles differently
        # (it stops; covered by test_truncate_pair_exhausted_sides)
        budget = rng.randint(6, total)
        want = _ref_process_seq_len(list(a), list(b), budget)
        got = truncate_pair(a, b, budget)
        assert got == tuple(want) or [list(got[0]), list(got[1])] == list(
            want
        ), (budget, a, b)
        assert len(got[0]) + len(got[1]) <= budget


def test_truncate_pair_exhausted_sides():
    # one side already at its marker core: every pop must come from the
    # other side, and the core is never touched (the reference's
    # head==tail==0 early return — previously ours popped the tail marker
    # once a side reached 3 tokens)
    core_b = ["[s2]", "d", "[e2]"]
    a = [f"a{i}" for i in range(40)] + ["[s1]", "e", "[e1]"] + [
        f"A{i}" for i in range(40)
    ]
    got_a, got_b = truncate_pair(list(a), list(core_b), budget=20)
    assert got_b == core_b
    assert len(got_a) + len(got_b) <= 20
    assert "[s1]" in got_a and "[e1]" in got_a
    # budget below both cores: stop at the cores instead of looping/eating
    got_a2, got_b2 = truncate_pair(list(a), list(core_b), budget=3)
    assert got_a2 == ["[s1]", "e", "[e1]"] and got_b2 == core_b


def test_encode_pair_raises_when_cores_cannot_fit():
    # the budget owner (encode layer) must never emit an over-budget ids
    # row: marker cores wider than max_seq_len - 3 raise descriptively
    from clinicaltransformerrelationextraction_spark.operators.tokenize import (  # noqa: E501
        encode_pair,
    )

    a = ["[s1]"] + ["e"] * 20 + ["[e1]"]
    b = ["[s2]"] + ["d"] * 20 + ["[e2]"]
    with pytest.raises(ValueError, match="cannot fit"):
        encode_pair(a, b, max_seq_len=16)
    # fits exactly at the boundary: len == budget emits, no error
    ids = encode_pair(a, b, max_seq_len=len(a) + len(b) + 3)
    assert len(ids) == len(a) + len(b) + 3


def test_fit_budget_dirty_marker_rows_survive():
    """Web prose containing literal marker tokens defeats the
    entity-centered loops (the reference CRASHES on such rows); the fit
    layer must keep the job alive: marker-preserving force fit, never an
    over-budget row, never a dropped marker."""
    from clinicaltransformerrelationextraction_spark.operators.tokenize import (  # noqa: E501
        fit_pair_budget, fit_uni_budget,
    )

    # uni: a 5th marker-like token in prose stalls the 4-way loop
    dirty = (
        ["w"] * 30 + ["[s2]"] + ["w"] * 30
        + ["[s1]", "e", "[e1]"] + ["w"] * 30 + ["[s2]", "d", "[e2]"]
        + ["w"] * 30
    )
    out = fit_uni_budget(list(dirty), max_seq_len=40)
    assert len(out) <= 38
    assert sum(t in ("[s1]", "[e1]", "[s2]", "[e2]") for t in out) == 5
    # the ENTITY WORDS survive (distance-ranked fit keeps marker-adjacent
    # tokens over far prose)
    assert "e" in out and "d" in out

    # pair: a dirty side whose prose marker widens the protected span
    a = ["x"] * 10 + ["[s1]", "e", "[e1]"] + ["x"] * 10
    b = ["[s2]"] + ["y"] * 40 + ["[s2]", "d", "[e2]"] + ["y"] * 40
    fa, fb = fit_pair_budget(list(a), list(b), max_seq_len=30)
    assert len(fa) + len(fb) <= 27
    assert "[s1]" in fa and "[e1]" in fa and "e" in fa
    assert fb.count("[s2]") == 2 and "[e2]" in fb and "d" in fb


def test_fit_budget_clean_side_keeps_entity_despite_dirty_sibling():
    from clinicaltransformerrelationextraction_spark.operators.tokenize import (  # noqa: E501
        fit_pair_budget,
    )

    # a tiny CLEAN side must never lose its entity mention to a huge
    # dirty sibling: its in-span tokens are protected
    a = ["[s1]", "aspirin", "[e1]"]
    b = ["[s2]"] + ["y"] * 80 + ["[s2]", "warfarin", "[e2]"]
    fa, fb = fit_pair_budget(list(a), list(b), max_seq_len=11)
    assert fa == ["[s1]", "aspirin", "[e1]"]
    assert len(fa) + len(fb) <= 8
    assert "warfarin" in fb  # distance-1 token outlives far prose


def test_fit_uni_clean_oversize_cores_raise():
    from clinicaltransformerrelationextraction_spark.operators.tokenize import (  # noqa: E501
        fit_uni_budget,
    )

    # clean census (4 markers) whose cores genuinely exceed the budget:
    # the actionable error, same contract as the sep path — not a whole
    # corpus of silently gutted encodings
    toks = (["[s1]"] + ["e"] * 10 + ["[e1]"]
            + ["[s2]"] + ["d"] * 10 + ["[e2]"])
    with pytest.raises(ValueError, match="cannot fit"):
        fit_uni_budget(list(toks), max_seq_len=12)
    # at-budget rows pass through untouched
    assert fit_uni_budget(list(toks), max_seq_len=len(toks) + 2) == toks


def test_truncate_uni_fuzz_vs_reference_port():
    rng = random.Random(29)
    for _ in range(300):
        seg = [rng.randint(8, 20) for _ in range(5)]
        toks = (
            [f"h{i}" for i in range(seg[0])]
            + ["[s1]"] + [f"x{i}" for i in range(seg[1])] + ["[e1]"]
            + [f"m{i}" for i in range(seg[2])]
            + ["[s2]"] + [f"y{i}" for i in range(seg[3])] + ["[e2]"]
            + [f"t{i}" for i in range(seg[4])]
        )
        budget = len(toks) - rng.randint(0, 5)
        want = _ref_uni(toks, budget)
        got = truncate_uni(toks, budget)
        assert got == want
        assert len(got) <= budget
        for tag in ("[s1]", "[e1]", "[s2]", "[e2]"):
            assert tag in got


def test_truncate_uni_marker_guard():
    # degenerate input where the reference would pop a marker: we stop
    toks = ["[s1]", "e", "[e1]", "[s2]", "d", "[e2]"]
    got = truncate_uni(toks, 4)
    assert all(t in got for t in ("[s1]", "[e1]", "[s2]", "[e2]"))


def test_encode_pair_contract():
    ids = encode_pair(["[s1]", "e", "[e1]"], ["[s2]", "d", "[e2]"], 512)
    assert ids[0] == CLS_ID and ids[4] == SEP_ID and ids[-1] == SEP_ID
    assert len(ids) == 3 + 3 + 3  # both sides + specials
    # deterministic
    assert ids == encode_pair(["[s1]", "e", "[e1]"], ["[s2]", "d", "[e2]"], 512)


def test_tokenize_features_budget(spark):
    """With a tiny max_seq_len the truncation loop actually runs on real
    candidate windows and every encoded row respects the budget."""
    from clinicaltransformerrelationextraction_spark.operators.candidates import (
        candidates,
    )
    from clinicaltransformerrelationextraction_spark.plans.pipeline import (
        load_documents,
    )

    cfg = PipelineConfig(max_seq_len=16)
    cand = candidates(load_documents(spark, SF_SMOKE), cfg)
    feats = tokenize_features(cand, cfg)
    rows = feats.collect()
    assert rows and all(r.n_ids <= 16 for r in rows)
    assert feats.count() == cand.count()


def test_lenient_paredown_matches_reference_greedy(spark):
    """q_span_eval_lenient vs a direct port of the reference's nested-loop
    pare-down (brat_eval.py:225-243) run per doc in plain Python."""
    from clinicaltransformerrelationextraction_spark.operators.evalqueries import (
        _gold,
        _system,
        q_span_eval_lenient,
    )

    gold = {}
    for r in _gold(spark, SF_SMOKE).collect():
        gold.setdefault(r.doc_id, []).append((r.ent_type, r.start, r.end))
    sys_ = {}
    for r in _system(spark, SF_SMOKE).collect():
        sys_.setdefault(r.doc_id, []).append((r.ent_type, r.start, r.end))

    def overlaps(g, s):
        return g[0] == s[0] and g[2] > s[1] and g[1] < s[2]

    want = {}
    for doc_id, gol in gold.items():
        sys_tags = sorted(sys_.get(doc_id, []), key=lambda t: (t[1], t[2], t[0]))
        sys_check = list(sys_tags)
        gol_matched = []
        for s in sys_tags:
            for g in gol:
                if overlaps(g, s):
                    if g not in gol_matched:
                        gol_matched.append(g)
                    elif s in sys_check:
                        sys_check.remove(s)
        tp = len({i for i, s in enumerate(sys_check)
                  if any(overlaps(g, s) for g in gol)})
        want[doc_id] = (tp, len(sys_check) - tp, len(gol) - tp)

    got = {
        r.doc_id: (r.tp, r.fp, r.fn)
        for r in q_span_eval_lenient(spark, SF_SMOKE).collect()
    }
    assert got == want
    # the pare-down must actually bite somewhere on this corpus
    strict_overlap_tp = sum(
        min(len([s for s in sys_.get(d, []) if any(overlaps(g, s) for g in gs)]),
            len(gs))
        for d, gs in gold.items()
    )
    assert sum(t for t, _, _ in got.values()) <= strict_overlap_tp


def test_tokenize_uni_budget(spark):
    """Uni-mode at a tiny max_seq_len drives the 4-way truncation on real
    concatenated windows; budget respected everywhere."""
    from pyspark.sql import functions as F
    from clinicaltransformerrelationextraction_spark.operators.candidates import (
        candidates,
    )
    from clinicaltransformerrelationextraction_spark.operators.tokenize import (
        tokenize_features_uni,
    )
    from clinicaltransformerrelationextraction_spark.plans.pipeline import (
        load_documents,
    )

    cfg = PipelineConfig(max_seq_len=18)
    cand = candidates(load_documents(spark, SF_SMOKE), cfg)
    uni = cand.select(
        "doc_id", "i1", "i2",
        F.concat_ws(" ", "s1_marked", "s2_marked").alias("uni_marked"),
    )
    rows = tokenize_features_uni(uni, cfg).collect()
    assert rows and all(r.n_ids <= 18 for r in rows)
