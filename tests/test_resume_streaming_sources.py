"""Resumable ledger runs, streaming pipeline, TSV/brat source round-trips,
and the truncation property."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from clinicaltransformerrelationextraction_spark.config import PipelineConfig
from clinicaltransformerrelationextraction_spark.plans.ledger import LedgerRun
from clinicaltransformerrelationextraction_spark.plans.pipeline import (
    load_documents,
    run_pipeline,
)
from tests.conftest import SF_SMOKE


def test_ledger_resume_after_crash(spark, tmp_path):
    docs = load_documents(spark, SF_SMOKE)
    run = LedgerRun(out_dir=str(tmp_path / "run1"), n_buckets=4)

    with pytest.raises(RuntimeError, match="simulated failure"):
        run.run(docs, fail_after=2)

    ledger = json.load(open(run.ledger_path))
    assert sum(1 for v in ledger.values() if v["status"] == "done") == 2

    # resume completes only the remaining buckets and the result equals a
    # single-shot run
    ledger = run.resume(docs)
    assert len(ledger) == 4
    assert all(v["status"] == "done" for v in ledger.values())
    resumed = run.triples(spark)

    expected = run_pipeline(docs, PipelineConfig()).triples
    assert resumed.count() == expected.count()
    key = ["doc_id", "rel_id", "subj_id", "obj_id", "pred"]
    assert (
        resumed.select(*key).exceptAll(expected.select(*key)).count() == 0
    )
    # per-partition lineage metrics present
    assert all(
        v["n_triples"] >= 0 and v["wall_sec"] >= 0 for v in ledger.values()
    )

    # idempotence: re-running a completed ledger is a no-op
    before = os.path.getmtime(run.ledger_path)
    run.resume(docs)
    assert os.path.getmtime(run.ledger_path) == before


def test_streaming_availablenow_incremental(spark, tmp_path):
    from clinicaltransformerrelationextraction_spark.streaming import (
        stream_pipeline,
    )

    docs = load_documents(spark, SF_SMOKE)
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    first = docs.filter(F.col("doc_id") < 100)
    first.write.mode("append").parquet(in_dir)

    stream_pipeline.stream_triples(spark, in_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # add more files; checkpoint must process ONLY the new ones
    docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150)).write.mode(
        "append"
    ).parquet(in_dir)
    stream_pipeline.stream_triples(spark, in_dir, out_dir, ckpt)
    n2 = spark.read.parquet(out_dir).count()
    assert n2 > n1

    batch = run_pipeline(
        spark.read.parquet(in_dir), PipelineConfig()
    ).triples.count()
    assert n2 == batch

    # exactly-once across an idempotent re-run with no new files
    stream_pipeline.stream_triples(spark, in_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n2


def test_streaming_watermark_window_agg(spark, tmp_path):
    import shutil

    from clinicaltransformerrelationextraction_spark.streaming.stream_pipeline import (
        stream_event_counts,
    )

    in_dir = tmp_path / "events_in"
    in_dir.mkdir()
    shutil.copy(f"{SF_SMOKE}/events.parquet", in_dir / "part-0.parquet")
    stream_event_counts(
        spark, str(in_dir), str(tmp_path / "ck"), str(tmp_path / "ev")
    )
    ev = spark.read.parquet(str(tmp_path / "ev"))
    assert ev.columns == ["win_start", "event_type", "n"]
    # append mode emits only windows closed by the watermark; every emitted
    # row must match the batch ground truth exactly, and only the trailing
    # <= 3h of events (1h window + 2h watermark) may be withheld
    batch = (
        spark.read.parquet(str(in_dir))
        .groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias(
                "win_start"
            ),
            "event_type",
        )
        .agg(F.count("*").alias("n_batch"))
    )
    joined = ev.join(batch, ["win_start", "event_type"], "left")
    assert joined.filter("n <> n_batch OR n_batch IS NULL").count() == 0
    total = spark.read.parquet(str(in_dir)).count()
    emitted = ev.agg(F.sum("n")).collect()[0][0]
    assert 0 < emitted <= total
    assert total - emitted < 200  # only the tail windows withheld


def test_tsv_roundtrip(spark, tmp_path):
    from clinicaltransformerrelationextraction_spark.operators.candidates import (
        candidates,
    )
    from clinicaltransformerrelationextraction_spark.sources import tsv

    docs = load_documents(spark, SF_SMOKE).limit(50)
    cand = candidates(docs, PipelineConfig())
    shaped = tsv.candidates_to_tsv_shape(cand)
    path = str(tmp_path / "cand_tsv")
    tsv.write_candidates_tsv(shaped, path)
    back = tsv.read_candidates_tsv(spark, path)
    assert back.count() == shaped.count()
    assert back.columns == tsv.TSV_COLUMNS
    assert (
        back.exceptAll(shaped.select(*tsv.TSV_COLUMNS)).count() == 0
    )
    # markers survive the round trip verbatim
    row = back.filter(F.col("sentence_1").contains("[s1]")).first()
    assert "[e1]" in row.sentence_1


def test_brat_roundtrip(spark):
    from clinicaltransformerrelationextraction_spark.operators.segmentation import (
        mentions,
    )
    from clinicaltransformerrelationextraction_spark.sources.brat import (
        parse_ann_lines,
        render_r_line,
        render_t_line,
    )

    docs = load_documents(spark, SF_SMOKE).limit(20)
    men = mentions(docs, PipelineConfig())
    t_lines = men.select(
        "doc_id",
        render_t_line(
            F.col("mention_id"), F.col("ent_type"), F.col("start"),
            F.col("end"), F.col("surface"),
        ).alias("value"),
    )
    parsed_m, _ = parse_ann_lines(t_lines)
    key = ["doc_id", "mention_id", "ent_type", "start", "end", "surface"]
    assert parsed_m.select(*key).exceptAll(men.select(*key)).count() == 0
    assert parsed_m.count() == men.count()

    trip = run_pipeline(docs, PipelineConfig()).triples
    r_lines = trip.select(
        "doc_id",
        render_r_line(
            F.col("rel_id"), F.col("pred"), F.col("subj_id"),
            F.col("obj_id"),
        ).alias("value"),
    )
    _, parsed_r = parse_ann_lines(r_lines)
    assert parsed_r.count() == trip.count()
    got = parsed_r.select("doc_id", "rel_id", "rel_type", "arg1", "arg2")
    want = trip.select(
        "doc_id", "rel_id", F.col("pred").alias("rel_type"),
        F.col("subj_id").alias("arg1"), F.col("obj_id").alias("arg2"),
    )
    assert got.exceptAll(want).count() == 0


def test_truncation_property():
    from clinicaltransformerrelationextraction_spark.operators.scoring import (
        truncate_pair,
    )

    toks_a = ["w"] * 100 + ["[s1]", "ent", "[e1]"] + ["w"] * 100
    toks_b = ["x"] * 50 + ["[s2]", "drug", "[e2]"] + ["x"] * 150
    a, b = truncate_pair(toks_a, toks_b, budget=60)
    assert len(a) + len(b) <= 60
    # markers survive truncation (entity-centered popping)
    assert "[s1]" in a and "[e1]" in a
    assert "[s2]" in b and "[e2]" in b
    # no-op when under budget
    a2, b2 = truncate_pair(["[s1]", "e", "[e1]"], ["[s2]", "d", "[e2]"], 512)
    assert a2 == ["[s1]", "e", "[e1]"] and b2 == ["[s2]", "d", "[e2]"]


def test_ledger_empty_bucket_and_stale_partition(spark, tmp_path):
    """A bucket whose re-run yields ZERO triples must (a) not crash the
    count when no files were written and (b) clear its previously-written
    stale rows (dynamic overwrite alone would keep them)."""
    import json

    docs = load_documents(spark, SF_SMOKE).limit(120)
    run = LedgerRun(out_dir=str(tmp_path / "runE"), n_buckets=4)
    ledger = run.run(docs, PipelineConfig())
    assert all(v["status"] == "done" for v in ledger.values())
    total = run.triples(spark).count()
    assert total > 0

    # find a bucket that produced triples, mark it not-done, and re-run
    # with ONLY out-of-bucket docs -> that bucket is now empty
    target = next(k for k, v in ledger.items() if v["n_triples"] > 0)
    ledger[target]["status"] = "redo"
    run._write_ledger(ledger)
    kept_docs = docs.withColumn(
        "b", F.pmod(F.hash("doc_id"), F.lit(4))
    ).filter(F.col("b") != int(target)).drop("b")
    ledger2 = run.resume(kept_docs, PipelineConfig())
    assert ledger2[target]["status"] == "done"
    assert ledger2[target]["n_triples"] == 0
    remaining = run.triples(spark)
    assert remaining.filter(F.col("bucket") == int(target)).count() == 0

    # first-bucket-empty fresh run must not crash on a missing triples dir
    run2 = LedgerRun(out_dir=str(tmp_path / "runF"), n_buckets=2)
    empty_docs = docs.filter(F.lit(False))
    ledger3 = run2.run(empty_docs, PipelineConfig())
    assert all(v["n_triples"] == 0 for v in ledger3.values())


def test_checkpoint_retention(tmp_path):
    """S9/W4 — latest-checkpoint resolution and oldest-first eviction
    beyond the retention limit (src/task.py:270-271, 306-318)."""
    import os

    from clinicaltransformerrelationextraction_spark.plans.ledger import (
        latest_checkpoint,
        prune_checkpoints,
    )

    root = str(tmp_path / "ckpts")
    os.makedirs(root)
    for n in (1, 2, 3, 10):
        os.makedirs(os.path.join(root, f"ckpt_{n}"))
        with open(os.path.join(root, f"ckpt_{n}", "model.bin"), "w") as f:
            f.write(str(n))
    assert latest_checkpoint(root).endswith("ckpt_10")
    deleted = prune_checkpoints(root, max_num=2)
    assert [os.path.basename(p) for p in deleted] == ["ckpt_1", "ckpt_2"]
    assert sorted(os.listdir(root)) == ["ckpt_10", "ckpt_3"]
    assert latest_checkpoint(root).endswith("ckpt_10")
    assert prune_checkpoints(root, max_num=5) == []
    assert latest_checkpoint(str(tmp_path / "nope")) is None


def test_streaming_dedup_matches_batch_exact_dedup(spark, tmp_path):
    """Streaming content-hash dedup (watermark-bounded state) keeps
    exactly one page per distinct text, and the kept hash set equals the
    batch exact-dedup distinct set. Incremental re-run with extra
    duplicate files emits nothing new for already-seen hashes."""
    from clinicaltransformerrelationextraction_spark.plans.pipeline import (
        documents_as_pages,
        load_documents,
    )
    from clinicaltransformerrelationextraction_spark.streaming.stream_pipeline import (
        stream_dedup_pages,
    )

    # orderBy before limit (LIMIT alone may pick a different subset per
    # re-evaluation), and an immutable STAGING copy as the single source
    # of truth — never re-read a directory that is being appended to
    docs = load_documents(spark, SF_SMOKE).orderBy("doc_id").limit(120)
    staging = str(tmp_path / "pages_staging")
    in_dir = str(tmp_path / "pages_in")
    out_dir = str(tmp_path / "pages_out")
    ckpt = str(tmp_path / "ckpt_dedup")
    documents_as_pages(docs).write.mode("overwrite").parquet(staging)
    base = spark.read.parquet(staging)
    base.write.mode("overwrite").parquet(in_dir)
    # duplicate half the pages as a second file drop (same url/text)
    base.orderBy("url").limit(60).write.mode("append").parquet(in_dir)

    stream_dedup_pages(spark, in_dir, ckpt, out_dir)
    got = spark.read.parquet(out_dir)
    batch_hashes = {
        r.h for r in base.select(F.md5("text").alias("h")).distinct()
        .collect()
    }
    kept = got.groupBy("text_hash").count().collect()
    assert {r.text_hash for r in kept} == batch_hashes
    assert all(r["count"] == 1 for r in kept)  # one keeper per hash

    # second drop: all duplicates of already-processed content
    base.orderBy("url").limit(40).write.mode("append").parquet(in_dir)
    stream_dedup_pages(spark, in_dir, ckpt, out_dir)
    again = spark.read.parquet(out_dir).groupBy("text_hash").count()
    assert again.filter(F.col("count") > 1).count() == 0


def test_stream_pages_latest_matches_batch(spark, tmp_path):
    """The stateful streaming latest-per-url upsert, compacted by
    last-emission-per-url, must equal the batch q_pages_latest over the
    same documents — including across a SECOND incremental file drop
    that updates existing urls."""
    from clinicaltransformerrelationextraction_spark.operators.dedup import (
        pages_with_crawl_ts,
    )
    from clinicaltransformerrelationextraction_spark.plans.pipeline import (
        load_documents,
    )
    from clinicaltransformerrelationextraction_spark.streaming.stream_pipeline import (
        stream_pages_latest,
    )

    docs = load_documents(spark, SF_SMOKE).orderBy("doc_id").limit(120)
    staging = str(tmp_path / "latest_staging")
    in_dir = str(tmp_path / "latest_in")
    out_dir = str(tmp_path / "latest_out")
    ckpt = str(tmp_path / "ckpt_latest")
    docs.write.mode("overwrite").parquet(staging)
    base = spark.read.parquet(staging)
    # split at 58 — deliberately NOT a multiple of RECRAWL_FANOUT=3, so
    # url doc://19 (docs 57,58,59) STRADDLES the two drops: the second
    # drain must restore that url's checkpointed state, upsert it, and
    # re-emit — the cross-drop paths a fanout-aligned split would never
    # exercise (both emissions then survive to the compaction step)
    base.filter(F.col("doc_id") < 58).write.mode("overwrite").parquet(in_dir)
    stream_pages_latest(spark, in_dir, ckpt, out_dir)
    base.filter(F.col("doc_id") >= 58).write.mode("append").parquet(in_dir)
    stream_pages_latest(spark, in_dir, ckpt, out_dir)

    def compact(df):
        w = df.groupBy("url").agg(F.max("n_crawls").alias("n_crawls"))
        return df.join(w, ["url", "n_crawls"])

    got = {
        (r.url, r.n_crawls, r.latest_ts_us, r.latest_doc_id)
        for r in compact(spark.read.parquet(out_dir)).collect()
    }
    # batch twin over the SAME 120-doc subset (not the sf-dir query):
    # same groupBy max(struct) shape
    pages = pages_with_crawl_ts(base)
    want = {
        (r.url, r.n_crawls, r.ts_us, r.doc_id)
        for r in pages.groupBy("url").agg(
            F.count("*").alias("n_crawls"),
            F.max(F.struct("ts_us", "doc_id")).alias("m"),
        ).select("url", "n_crawls", "m.ts_us", "m.doc_id").collect()
    }
    assert got == want and got
    # the straddling url must have TWO emissions (one per drain) — the
    # changelog the compaction exists to resolve
    raw = spark.read.parquet(out_dir).filter(F.col("url") == "doc://19")
    assert raw.count() == 2
