"""applyInPandasWithState sessionization vs its batch-window twin, and the
cogroup brat merge vs the aggregation-based renderer."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from clinicaltransformerrelationextraction_spark.config import PipelineConfig
from clinicaltransformerrelationextraction_spark.operators.postprocess import (
    brat_render,
    brat_render_cogroup,
)
from clinicaltransformerrelationextraction_spark.operators.segmentation import (
    mentions,
)
from clinicaltransformerrelationextraction_spark.plans.pipeline import (
    load_documents,
    run_pipeline,
)
from clinicaltransformerrelationextraction_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)
from tests.conftest import SF_SMOKE


def test_sessionize_stream_matches_batch(spark, tmp_path):
    in_dir = tmp_path / "events_in"
    in_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", in_dir / "part-0.parquet")

    sessionize_stream(
        spark, str(in_dir), str(tmp_path / "ck"), str(tmp_path / "out")
    )
    streamed = spark.read.parquet(str(tmp_path / "out"))
    batch = sessionize_batch(spark.read.parquet(str(in_dir)))

    key = ["user_id", "session_id", "session_start", "session_end",
           "n_events"]
    assert streamed.count() == batch.count()
    assert (
        streamed.select(*key).exceptAll(batch.select(*key)).count() == 0
    )
    # sanity: sessions split on >30min gaps
    multi = batch.filter(F.col("session_id") > 1).count()
    assert multi > 0  # the synthetic events do contain gaps


def test_brat_cogroup_matches_agg_renderer(spark):
    docs = load_documents(spark, SF_SMOKE).limit(100)
    cfg = PipelineConfig()
    men = mentions(docs, cfg)
    trip = run_pipeline(docs, cfg).triples
    a = brat_render(men, trip)
    b = brat_render_cogroup(men, trip)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
