"""S6 ordered prediction sink + brat parse∘render round-trip property."""

from __future__ import annotations

from pyspark.sql import functions as F

from clinicaltransformerrelationextraction_spark.config import PipelineConfig
from clinicaltransformerrelationextraction_spark.operators.candidates import (
    candidates,
)
from clinicaltransformerrelationextraction_spark.operators.scoring import (
    score_candidates,
)
from clinicaltransformerrelationextraction_spark.operators.segmentation import (
    mentions,
)
from clinicaltransformerrelationextraction_spark.plans.pipeline import (
    load_documents,
    run_brat,
    run_pipeline,
)
from clinicaltransformerrelationextraction_spark.sources.brat import (
    parse_ann_lines,
)
from clinicaltransformerrelationextraction_spark.sources.tsv import (
    write_predictions_text,
)
from tests.conftest import SF_SMOKE

CFG = PipelineConfig()


def test_ordered_prediction_text_sink(spark, tmp_path):
    """S6: one label per line in canonical (doc_id, i1, i2) order —
    re-read file content must equal the collected expected order exactly."""
    scored = score_candidates(
        candidates(load_documents(spark, SF_SMOKE), CFG), CFG
    )
    out = str(tmp_path / "preds")
    write_predictions_text(scored, out)
    want = [
        r.pred_label
        for r in scored.select("doc_id", "i1", "i2", "pred_label")
        .orderBy("doc_id", "i1", "i2")
        .collect()
    ]
    import glob

    files = glob.glob(out + "/part-*")
    assert len(files) == 1, "S6 contract: one ordered text file"
    with open(files[0]) as f:
        got = f.read().splitlines()
    assert got == want


def test_brat_roundtrip_property(spark):
    """parse(render(mentions, triples)) == (mentions, triples): the brat
    renderer and parser are exact inverses over the whole smoke corpus
    (C7 round-trip; line shapes data_format_conf.py:2, brat_eval.py:95-126).
    """
    docs = load_documents(spark, SF_SMOKE)
    men = mentions(docs, CFG)
    trip = run_pipeline(docs, CFG).triples
    ann = run_brat(docs, CFG)
    lines = ann.select(
        "doc_id", F.explode(F.split("ann_text", "\n")).alias("value")
    )
    parsed_m, parsed_r = parse_ann_lines(lines)

    want_m = men.select(
        "doc_id", "mention_id", "ent_type", "start", "end", "surface"
    )
    got_m = parsed_m.select(
        "doc_id", "mention_id", "ent_type", "start", "end", "surface"
    )
    assert got_m.count() == want_m.count()
    assert got_m.exceptAll(want_m).count() == 0
    assert want_m.exceptAll(got_m).count() == 0

    want_r = trip.select(
        "doc_id", "rel_id", F.col("pred").alias("rel_type"),
        F.col("subj_id").alias("arg1"), F.col("obj_id").alias("arg2"),
    )
    got_r = parsed_r.select("doc_id", "rel_id", "rel_type", "arg1", "arg2")
    assert got_r.count() == want_r.count()
    assert got_r.exceptAll(want_r).count() == 0
    assert want_r.exceptAll(got_r).count() == 0
