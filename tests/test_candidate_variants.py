"""All four candidate-generation formulations must be byte-identical —
they are the measured design space recorded in BENCH.md; `candidates` (the
product path) dispatches to the indexed form."""

from __future__ import annotations

import pytest

from clinicaltransformerrelationextraction_spark.config import PipelineConfig
from clinicaltransformerrelationextraction_spark.operators import (
    candidates as C,
)
from clinicaltransformerrelationextraction_spark.plans.pipeline import (
    load_documents,
)
from tests.conftest import SF_SMOKE

COLS = [
    "doc_id", "ent_id_1", "ent_id_2", "ent_type_1", "ent_type_2",
    "s1_marked", "s2_marked", "sent_diff", "i1", "i2",
]

VARIANTS = [
    C.candidates_indexed,
    C.candidates_inrow,
    C.candidates_join,
    C.candidates_relational,
]


@pytest.mark.parametrize("variant", VARIANTS[1:], ids=lambda f: f.__name__)
def test_variant_equals_product_path(spark, variant):
    docs = load_documents(spark, SF_SMOKE).limit(150)
    cfg = PipelineConfig()
    a = C.candidates(docs, cfg).select(*COLS)
    b = variant(docs, cfg).select(*COLS)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


@pytest.mark.parametrize(
    "variant", [C.candidates_inrow, C.candidates_join],
    ids=lambda f: f.__name__,
)
def test_variant_equal_under_cap(spark, variant):
    """The cap keeps the same deterministic pair set in every formulation
    (first N in (i1, i2) order)."""
    rows = [(1, " ".join(["join", "spark"] * 120))]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = PipelineConfig(max_pairs_per_doc=37)
    a = C.candidates(docs, cfg).select(*COLS)
    b = variant(docs, cfg).select(*COLS)
    assert a.count() == b.count() == 37
    assert a.exceptAll(b).count() == 0


def test_non_cross_product_comb_config(spark):
    """Exact tuple membership (ADVICE): with a combo set that is NOT the
    cross product of its projected type sets, every formulation must keep
    only the listed tuples — verified against an itertools reference over
    the raw mention lists."""
    from itertools import permutations

    from pyspark.sql import functions as F

    cfg = PipelineConfig(
        valid_combs=[("ADE", "Drug"), ("Reason", "Form")]
    )
    docs = load_documents(spark, SF_SMOKE).limit(150)

    # itertools reference straight from the token stream
    want = set()
    for r in docs.select("doc_id", "text").collect():
        toks = r.text.split(" ")
        ms = [
            (i + 1, cfg.ent_vocab.get(t), i // cfg.sent_len)
            for i, t in enumerate(toks)
            if t in cfg.ent_vocab
        ]
        for a, b in permutations(ms, 2):
            if (
                (a[1], b[1]) in cfg.valid_combs
                and abs(a[2] - b[2]) <= cfg.cutoff
            ):
                want.add((r.doc_id, a[0], b[0]))

    for variant in VARIANTS:
        got = {
            (r.doc_id, r.i1, r.i2)
            for r in variant(docs, cfg).select("doc_id", "i1", "i2").collect()
        }
        assert got == want, variant.__name__
    # the cross product of projected type sets would ALSO admit
    # (ADE, Form) / (Reason, Drug) pairs — prove the corpus has some, so
    # this test actually discriminates
    cross_only = set()
    for r in docs.select("doc_id", "text").collect():
        toks = r.text.split(" ")
        ms = [
            (i + 1, cfg.ent_vocab.get(t), i // cfg.sent_len)
            for i, t in enumerate(toks)
            if t in cfg.ent_vocab
        ]
        for a, b in permutations(ms, 2):
            if (
                (a[1], b[1]) in {("ADE", "Form"), ("Reason", "Drug")}
                and abs(a[2] - b[2]) <= cfg.cutoff
            ):
                cross_only.add((r.doc_id, a[0], b[0]))
    assert cross_only, "corpus lacks discriminating pairs"
    assert not (cross_only & want)
