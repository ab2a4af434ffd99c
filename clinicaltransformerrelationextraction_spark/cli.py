"""CLI — the reference's argument surface mapped onto the Spark engine.

Mirrors the flags of ``src/relation_extraction.py:81-173`` (prediction
side), ``src/batch_prediction.py:92-136`` (corpus mode) and the JSON-config
entry point ``src/relation_extraction_json.py:8-69`` where they affect
dataflow semantics; training-only flags (epochs, learning rate, losses)
are out of scope — training remains a torch job fed from the candidate
tables (SURVEY.md §7.1.10).

Usage (spark-submit shape):

    spark-submit --py-files ctre.zip -m clinicaltransformerrelationextraction_spark.cli \\
        predict --input /data/documents --output /out/run1 \\
        --scorer stub --max-seq-length 512 --data-format-mode 0

Subcommands:
    predict   documents parquet -> triples + brat .ann parquet (the
              flagship pipeline; --binary-mode switches to the REL/NonRel
              head + broadcast type-pair map)
    resume    continue a checkpointed ledger run (skip done buckets)
    eval      gold vs system triple tables -> P/R/F1
"""

from __future__ import annotations

import argparse
import json
import sys

from .config import PipelineConfig


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--input", required=True,
                   help="documents parquet dir (doc_id, text, lang)")
    p.add_argument("--output", required=True, help="output dir")
    p.add_argument("--config-json", default=None,
                   help="JSON file of PipelineConfig overrides "
                        "(relation_extraction_json.py analog)")
    p.add_argument("--scorer", default="stub",
                   choices=["stub", "mlp", "hf"],
                   help="scoring backend (hf requires transformers)")
    p.add_argument("--max-seq-length", type=int, default=512,
                   help="token budget incl. special tokens")
    p.add_argument("--data-format-mode", type=int, default=0,
                   choices=[0, 1], help="0=sep [CLS]S1[SEP]S2[SEP], "
                                        "1=uni [CLS]S1S2[SEP]")
    p.add_argument("--binary-mode", action="store_true",
                   help="REL/NonRel head + (type1,type2)->relation map "
                        "(post_processing.py:108-139)")
    p.add_argument("--eval-batch-size", type=int, default=1024,
                   help="Arrow batch rows per scorer call")
    p.add_argument("--max-pairs-per-doc", type=int, default=10_000)
    p.add_argument("--n-buckets", type=int, default=8,
                   help="ledger partitions (batch_* dir analog)")
    p.add_argument("--salt", action="store_true",
                   help="salted repartition before scoring (hot domains)")


def _cfg_from(args: argparse.Namespace) -> PipelineConfig:
    cfg = PipelineConfig(
        scorer=args.scorer,
        max_seq_len=args.max_seq_length,
        batch_size=args.eval_batch_size,
        max_pairs_per_doc=args.max_pairs_per_doc,
        data_format_mode=args.data_format_mode,
    )
    if args.config_json:
        with open(args.config_json) as f:
            for k, v in json.load(f).items():
                if not hasattr(cfg, k):
                    raise SystemExit(f"unknown config key: {k}")
                setattr(cfg, k, v)
    return cfg


def cmd_predict(args: argparse.Namespace, spark=None) -> dict:
    from .operators.binarymode import binary_triples
    from .operators.candidates import candidates
    from .operators.segmentation import mentions
    from .operators.postprocess import brat_render
    from .plans.ledger import LedgerRun
    from .plans.pipeline import run_pipeline
    from .session import get_spark

    spark = spark or get_spark(app_name="ctre-predict")
    docs = spark.read.parquet(args.input)
    cfg = _cfg_from(args)

    if args.binary_mode:
        trip = binary_triples(candidates(docs, cfg), cfg)
        trip.write.mode("overwrite").parquet(f"{args.output}/triples")
        n = spark.read.parquet(f"{args.output}/triples").count()
        return {"mode": "binary", "n_triples": n}

    if args.n_buckets > 1:
        run = LedgerRun(out_dir=args.output, n_buckets=args.n_buckets,
                        salt=args.salt)
        ledger = run.run(docs, cfg)
        n = sum(v["n_triples"] for v in ledger.values())
    else:
        trip = run_pipeline(docs, cfg, salt=args.salt).triples
        trip.write.mode("overwrite").parquet(f"{args.output}/triples")
        n = spark.read.parquet(f"{args.output}/triples").count()
    ann = brat_render(
        mentions(docs, cfg),
        spark.read.parquet(f"{args.output}/triples"),
    )
    ann.write.mode("overwrite").parquet(f"{args.output}/brat")
    return {"mode": "ledger" if args.n_buckets > 1 else "single",
            "n_triples": n}


def cmd_resume(args: argparse.Namespace, spark=None) -> dict:
    from .plans.ledger import LedgerRun
    from .session import get_spark

    spark = spark or get_spark(app_name="ctre-resume")
    docs = spark.read.parquet(args.input)
    run = LedgerRun(out_dir=args.output, n_buckets=args.n_buckets,
                    salt=args.salt)
    ledger = run.resume(docs, _cfg_from(args))
    return {"n_triples": sum(v["n_triples"] for v in ledger.values()),
            "buckets_done": sum(
                1 for v in ledger.values() if v["status"] == "done")}


def cmd_eval(args: argparse.Namespace, spark=None) -> dict:
    from .operators.evaluation import relation_match_prf
    from .session import get_spark

    spark = spark or get_spark(app_name="ctre-eval")
    sys_t = spark.read.parquet(args.system)
    gold_t = spark.read.parquet(args.gold)
    row = relation_match_prf(sys_t, gold_t).first()
    return {k: row[k] for k in
            ("tp", "fp", "fn", "precision", "recall", "f1")}


def main(argv: list[str] | None = None, spark=None) -> dict:
    top = argparse.ArgumentParser(prog="ctre-spark")
    sub = top.add_subparsers(dest="cmd", required=True)
    p_pred = sub.add_parser("predict", help="documents -> triples + brat")
    _add_common(p_pred)
    p_res = sub.add_parser("resume", help="continue a checkpointed run")
    _add_common(p_res)
    p_eval = sub.add_parser("eval", help="system vs gold triples -> P/R/F1")
    p_eval.add_argument("--system", required=True)
    p_eval.add_argument("--gold", required=True)
    args = top.parse_args(argv)
    fn = {"predict": cmd_predict, "resume": cmd_resume, "eval": cmd_eval}
    out = fn[args.cmd](args, spark=spark)
    print(json.dumps(out))
    return out


if __name__ == "__main__":  # pragma: no cover
    main(sys.argv[1:])
