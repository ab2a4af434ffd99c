"""North-rule gates:

1. (subj, pred, obj) P/R >= 0.95 vs the pure-Python reference
   reimplementation (tests/reference_impl.py) on the synthetic corpus.
2. Byte-identical extracted text per url through the pages adapter.
"""

from __future__ import annotations

import duckdb

from clinicaltransformerrelationextraction_spark.config import PipelineConfig
from clinicaltransformerrelationextraction_spark.operators.evaluation import (
    relation_match_prf,
)
from clinicaltransformerrelationextraction_spark.plans.pipeline import (
    documents_as_pages,
    extract_text,
    load_documents,
    run_pipeline,
)
from tests.conftest import SF_SMOKE
from tests.reference_impl import reference_corpus_triples


def test_triple_pr_vs_reference(spark):
    docs = load_documents(spark, SF_SMOKE)
    sys_triples = run_pipeline(docs, PipelineConfig()).triples

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{SF_SMOKE}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    gold = reference_corpus_triples(rows)
    gold_df = spark.createDataFrame(
        gold, ["doc_id", "rel_id", "pred", "subj_id", "obj_id", "score"]
    )

    prf = relation_match_prf(sys_triples, gold_df).collect()[0]
    assert prf.precision >= 0.95, f"precision {prf.precision} < 0.95"
    assert prf.recall >= 0.95, f"recall {prf.recall} < 0.95"
    # with the deterministic stub the match must in fact be exact
    assert prf.fp == 0 and prf.fn == 0, (prf.fp, prf.fn)

    # R-numbering parity too (rel_id included in the key)
    prf_full = relation_match_prf(
        sys_triples, gold_df,
        keys=("doc_id", "rel_id", "subj_id", "obj_id", "pred"),
    ).collect()[0]
    assert prf_full.f1 == 1.0


def test_byte_identical_extraction_per_url(spark):
    docs = load_documents(spark, SF_SMOKE)
    pages = documents_as_pages(docs)
    extracted = extract_text(pages).select("url", "text")
    orig = pages.select("url", "text")
    # per-row invariant: extractor(html) == text, byte for byte, per url
    diff = (
        extracted.alias("e")
        .join(orig.alias("o"), "url")
        .filter("e.text <> o.text")
        .count()
    )
    assert diff == 0
    assert extracted.count() == docs.count()
