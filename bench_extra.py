"""Round-7 optimization harness — NOT part of the driver contract.

Extra measurements the frozen bench.py cannot provide (guide §1.4):
- `--explain q1,q2,...` writes .explain("formatted") for each named
  declared query to plans/r07/<name>_<tag>.txt;
- `--noop q1,q2,...` times each query with the noop sink (computes every
  column, unlike .count() which lets Catalyst prune) — 1 warm-up + median
  of N (CTRE_BENCH_REPEATS, default 3);
- `--count q1,q2,...` times with .count(), matching bench.py methodology
  exactly, for apples-to-apples per-query A/B during the round.

Jobs are labelled via setJobDescription so the (disabled-by-default) UI
or event logs attribute stages to queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPEATS = max(1, int(os.environ.get("CTRE_BENCH_REPEATS", "3")))


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _session():
    from clinicaltransformerrelationextraction_spark.session import get_spark

    return get_spark(
        app_name="ctre-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS), 8),
    )


def _warm(spark):
    def _identity(batches):
        for b in batches:
            yield b

    n = spark.sparkContext.defaultParallelism * 2
    spark.range(n * 4, numPartitions=n).mapInPandas(
        _identity, schema="id long"
    ).count()


def _time(qfn, spark, sink: str):
    def run():
        df = qfn(spark, SF_DIR)
        if sink == "noop":
            df.write.format("noop").mode("overwrite").save()
            return None
        return df.count()

    run()  # warm-up
    samples = []
    cnt = None
    for _ in range(REPEATS):
        t0 = time.time()
        cnt = run()
        samples.append(round(time.time() - t0, 3))
    return round(_median(samples), 3), samples, cnt


def main():
    import __spark_entry__ as entry

    mode = sys.argv[1].lstrip("-") if len(sys.argv) > 1 else "count"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else []
    tag = sys.argv[3] if len(sys.argv) > 3 else "before"
    qs = entry.queries()
    spark = _session()
    _warm(spark)
    out = {"mode": mode, "sf": SF_DIR, "load_before": os.getloadavg()[0]}
    if mode == "explain":
        os.makedirs("plans/r07", exist_ok=True)
        import contextlib
        import io

        for name in names:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            path = f"plans/r07/{name}_{tag}.txt"
            with open(path, "w") as f:
                f.write(buf.getvalue())
            out[name] = path
    else:
        for name in names:
            spark.sparkContext.setJobDescription(f"{mode}:{name}")
            med, samples, cnt = _time(qs[name], spark, mode)
            out[name] = {"median": med, "samples": samples, "rows": cnt}
            spark.sparkContext.setJobDescription(None)
    out["load_after"] = os.getloadavg()[0]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
