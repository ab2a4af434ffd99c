"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec}, "sf": ..., "triples_per_sec": ...}

--scaling: runs the flagship pipeline AND the scoring stage at two
multi-executor sizes (local-cluster[2,4,*] vs local-cluster[8,4,*] by
default — real executor JVM processes), taskset-pinned and
clock-equalized, in interleaved rounds; reports throughput at both levels
plus per-round and best scaling efficiencies (the sandbox stand-in for N
vs 4N executors; methodology + results in BENCH.md). Env knobs:
CTRE_SCALING_{REPL,ROUNDS,REPEATS,LEVELS,SCORER,MASTER},
CTRE_EQUALIZE_CLOCKS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "q_triples",          # flagship KG pipeline: candidates->score->triples
    "q_candidates",       # candidate generation only (zero-shuffle stage)
    "q_tpch_q1",          # scan-heavy grouped aggregation
    "q_revenue_by_region",  # multi-join
    "q_dedup_minhash_pairs",  # shingle->minhash->LSH bucket join
    "q_simhash",          # per-doc simhash
    "q_ann_topk",         # brute-force cosine top-k
    "q_token_stats",      # text stats scan
    "q_tpch_q3",          # 3-way join + top-k
    "q_tpch_q5",          # 5-way join with broadcast dims
]

# heavy/iterative queries benched IN ADDITION to the headline set; timed and
# reported under "queries" + "extra_value" but excluded from "value" so the
# headline total stays comparable across rounds (r01/r02 recorded only the
# 10 queries above)
EXTRA = [
    "q_graph_pagerank",   # iterative integer PageRank (per-round lineage cut)
    "q_dedup_clusters",   # label-propagation connected components
    "q_ann_ivf_topk",     # IVF coarse-quantizer ANN
    "q_kmeans_centroids",  # Lloyd codebook refinement (broadcast codebook)
    "q_graph_user_components",  # events co-action graph components
    "q_graph_user_pagerank",  # integer PageRank on the sf-scaled graph
]

# noise defense (the r02 lesson: one unlucky driver sample defined the
# round): 1 warm-up + median of CTRE_BENCH_REPEATS timed runs per query,
# all samples reported
BENCH_REPEATS = max(1, int(os.environ.get("CTRE_BENCH_REPEATS", "3")))

# sub-second scans are the most host-noise-sensitive records (r3 verdict:
# q_simhash drifted 0.24->0.74 s across driver rounds on an unchanged
# single-pass plan) — give them extra samples so the median is robust
MORE_REPEATS: dict[str, int] = {"q_simhash": 7, "q_token_stats": 7}


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def _session(cpus: str):
    from clinicaltransformerrelationextraction_spark.session import get_spark

    return get_spark(
        app_name="ctre-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus), 8),
    )


def _warm_python_workers(spark) -> None:
    """Start one Python UDF worker per core before timing: worker startup
    (numpy/pandas import, ~10 s across 32 workers) is environment overhead,
    not query cost, and is amortized away on any long-running cluster."""

    def _identity(batches):
        for b in batches:
            yield b

    n = spark.sparkContext.defaultParallelism * 2
    spark.range(n * 4, numPartitions=n).mapInPandas(
        _identity, schema="id long"
    ).count()


def _time_query(qfn, spark, repeats: int) -> tuple[float, list[float], int]:
    """1 warm-up + ``repeats`` timed executions; returns (median, samples,
    rowcount). The clock covers BUILD + count: iterative queries
    (PageRank, label-propagation clusters) execute their per-round jobs
    eagerly while the DataFrame is being built (localCheckpoint), so
    timing only the final count would measure a trivial scan. For lazy
    queries the build adds only sub-ms plan construction. Each execution
    rebuilds from scratch so no Spark-side caching survives between
    samples — only OS page cache (steady-state), which is exactly the
    warm-cluster condition the headline measures."""
    qfn(spark, SF_DIR).count()  # warm-up (JIT, page cache, codegen)
    samples: list[float] = []
    cnt = 0
    for _ in range(repeats):
        t0 = time.time()
        cnt = qfn(spark, SF_DIR).count()
        samples.append(round(time.time() - t0, 3))
    return round(_median(samples), 3), samples, cnt


# 1/10th of the corpus plays the "new crawl" delta — the SAME split the
# driver query q_dedup_incremental and its oracle verify (single source
# of truth; also keys the /tmp state-dir cache below)
from clinicaltransformerrelationextraction_spark.operators.incremental import (  # noqa: E501
    INCR_DELTA_MOD as INC_DELTA_MOD,
)


def _bench_incremental(spark) -> dict:
    """Delta-ingest vs full-recompute dedup, PAIRED in one session: the
    historical state (LSH band index + shingle table + cluster labels
    over the 90% 'old' corpus) is persisted to /tmp parquet once — it is
    the state a production pipeline reads, not part of the ingest — then
    each interleaved round times one incremental_dedup ingest of the 10%
    delta (through materializing the updated full label table) against
    one from-scratch clusters recompute over 100% of the corpus.
    Measured clean at sf0.1 (bench_r6_clean.json): incremental 5.29 s vs
    full 5.59 s — the delta leg wins every interleaved round but only by
    ~1.06x, CAPPED by this template corpus's pathological LSH buckets
    (candidate pairs from a 10% delta touch 73% of history; only ~50
    pairs survive the Jaccard verify, so the 'delta-bounded' verify set
    is near corpus-sized HERE) plus contraction-fixpoint fixed costs a
    ~6 s scale cannot amortize; the structural claim that scales is that
    history is never re-banded or re-shingled. Recomputing old shingles
    from text instead of reading the persisted table was measured slower
    (5.7-8.0 s) — the columnar array read beats re-tokenization."""
    from pyspark.sql import functions as F

    from clinicaltransformerrelationextraction_spark.functions.util import (
        ensure_parallelism,
    )
    from clinicaltransformerrelationextraction_spark.operators.dedup import (
        bands_frame,
        clusters_frame,
        shingle_frame,
    )
    from clinicaltransformerrelationextraction_spark.operators.incremental import (
        incremental_dedup,
    )

    from clinicaltransformerrelationextraction_spark.operators import dedup

    docs = ensure_parallelism(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    )
    old = docs.filter(F.col("doc_id") % INC_DELTA_MOD != 0)
    new = docs.filter(F.col("doc_id") % INC_DELTA_MOD == 0)
    sf_tag = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # key the cached state by the LSH constants AND the corpus file's
    # mtime: changing N_SEEDS/BAND_ROWS/JACCARD_MIN or regenerating the
    # testdata must invalidate the persisted index/labels/shingles, or
    # the timed ingest would silently join new-constant delta bands
    # against an old-constant index
    corpus_mtime = int(os.path.getmtime(f"{SF_DIR}/documents.parquet"))
    fp = (
        f"s{dedup.N_SEEDS}b{dedup.BAND_ROWS}j{dedup.JACCARD_MIN}"
        f"t{corpus_mtime}"
    )
    base = f"/tmp/ctre_inc_state_sf{sf_tag}_m{INC_DELTA_MOD}_{fp}"
    idx_p, lab_p, sh_p = f"{base}/index", f"{base}/labels", f"{base}/shingles"
    if not os.path.exists(idx_p + "/_SUCCESS"):
        bands_frame(old).write.mode("overwrite").parquet(idx_p)
    if not os.path.exists(lab_p + "/_SUCCESS"):
        clusters_frame(old).select("doc_id", "cluster_id").write.mode(
            "overwrite"
        ).parquet(lab_p)
    if not os.path.exists(sh_p + "/_SUCCESS"):
        shingle_frame(old.select("doc_id", "text")).write.mode(
            "overwrite"
        ).parquet(sh_p)
    old_index = spark.read.parquet(idx_p)
    old_labels = spark.read.parquet(lab_p)
    old_shingles = spark.read.parquet(sh_p)

    def ingest(_spark, _sf):
        return incremental_dedup(
            old, old_index, old_labels, new, old_shingles
        )[1]

    def full(_spark, _sf):
        return clusters_frame(docs).select("doc_id", "cluster_id")

    # PAIRED A/B (r5 verdict: the lone-leg version's "vs full" claim was
    # not reproducible from any committed JSON): both legs timed in the
    # SAME session with INTERLEAVED order (full,inc / inc,full / ...), so
    # a host-load burst hits both legs equally instead of whichever leg
    # ran second — the same discipline bench --scaling uses round-to-round
    med_full, s_full, n_full, med_inc, s_inc, n_inc = _paired_time(
        full, ingest, spark, BENCH_REPEATS
    )
    assert n_full == n_inc  # both cover every doc, old and new
    return {
        "full_recompute_sec": med_full,
        "incremental_ingest_sec": med_inc,
        "incremental_samples": {"full": s_full, "incremental": s_inc},
        "incremental_delta_frac": round(1.0 / INC_DELTA_MOD, 2),
        "incremental_labels_rows": n_inc,
    }


def _paired_time(
    fn_a, fn_b, spark, repeats: int
) -> tuple[float, list[float], int, float, list[float], int]:
    """Two-leg timing with interleaved order: one warm-up each, then
    ``repeats`` rounds running (A,B) on even rounds and (B,A) on odd —
    per-leg medians over all rounds. Returns (med_a, samples_a, rows_a,
    med_b, samples_b, rows_b)."""
    rows_a = fn_a(spark, SF_DIR).count()  # warm-ups
    rows_b = fn_b(spark, SF_DIR).count()
    samples_a: list[float] = []
    samples_b: list[float] = []

    def _one(fn, out):
        t0 = time.time()
        fn(spark, SF_DIR).count()
        out.append(round(time.time() - t0, 3))

    for i in range(repeats):
        legs = [(fn_a, samples_a), (fn_b, samples_b)]
        for fn, out in legs if i % 2 == 0 else reversed(legs):
            _one(fn, out)
    return (
        round(_median(samples_a), 3), samples_a, rows_a,
        round(_median(samples_b), 3), samples_b, rows_b,
    )


def _bench_incremental_graph(spark) -> dict:
    """Incremental USER-GRAPH component maintenance vs from-scratch:
    star co-action edges are per-(k, day) facts, so the last ~10% of
    days plays the delta — its edges derive from those events alone and
    fold into the persisted labeling by contraction
    (incremental.merge_components, equivalence pytest-pinned on this
    exact split shape). Compare with the from-scratch leg timed here:
    full star-edge derivation + min-label fixpoint over ALL days. The
    structural claim that scales is that history's events are never
    re-scanned: the incremental plan touches the delta days' events plus
    the nodes-sized label table."""
    from pyspark.sql import functions as F

    from clinicaltransformerrelationextraction_spark.functions.util import (
        ensure_parallelism,
    )
    from clinicaltransformerrelationextraction_spark.operators.graph import (
        min_label_components,
        user_star_edges_from_events,
    )
    from clinicaltransformerrelationextraction_spark.operators.incremental import (
        merge_components,
    )

    ev = ensure_parallelism(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    days = [r.d for r in ev.select(
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d")
    ).distinct().orderBy("d").collect()]
    cutoff = days[int(len(days) * 0.9)]
    is_new = (
        F.date_trunc("day", F.col("ts").cast("timestamp")) >= F.lit(cutoff)
    )
    ev_mtime = int(os.path.getmtime(f"{SF_DIR}/events.parquet"))
    sf_tag = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    lab_p = f"/tmp/ctre_inc_graph_sf{sf_tag}_t{ev_mtime}/labels"
    if not os.path.exists(lab_p + "/_SUCCESS"):
        min_label_components(
            user_star_edges_from_events(ev.filter(~is_new))
        ).write.mode("overwrite").parquet(lab_p)
    old_labels = spark.read.parquet(lab_p)
    new_ev = ev.filter(is_new)

    def full(_spark, _sf):
        return min_label_components(user_star_edges_from_events(ev))

    def inc(_spark, _sf):
        return merge_components(
            old_labels, user_star_edges_from_events(new_ev)
        )

    med_full, s_full, n, med_inc, s_inc, n_inc = _paired_time(
        full, inc, spark, BENCH_REPEATS
    )
    assert n == n_inc  # same node universe either way
    return {
        "graph_full_recompute_sec": med_full,
        "graph_incremental_merge_sec": med_inc,
        "graph_samples": {"full": s_full, "incremental": s_inc},
        "graph_delta_days_frac": round(
            sum(1 for d in days if d >= cutoff) / len(days), 2
        ),
        "graph_nodes": n,
    }


def _cpu_calibration() -> float:
    """Single-thread pure-Python spin, fixed iteration count — a host-speed
    constant recorded inside the bench JSON. Round-to-round wall-time
    comparisons on this shared host are only meaningful relative to this
    number: an idle-host r5 run measured EVERY headline query a uniform
    ~1.35x over r4 (scan-only TPC-H q1 included, code untouched), which is
    host clock/steal drift, not a regression. Dividing by this constant
    cancels it. Measured with perf_counter (monotonic): an NTP step
    landing mid-spin must not corrupt the very constant that exists to
    cancel clock drift."""
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i
    assert s == 199999990000000
    return round(time.perf_counter() - t0, 3)


def run_bench() -> dict:
    import __spark_entry__ as entry

    # Host-noise evidence: this sandbox shares a physical host with
    # co-tenants whose bursts inflate wall times ~20% with ZERO local CPU
    # consumers visible (round-5 disclosure in BENCH.md). Recording the
    # load average around the run puts contamination evidence INSIDE the
    # recorded JSON instead of requiring a separate forensic probe.
    load_before = os.getloadavg()
    pyloop = _cpu_calibration()
    spark = _session(CPUS)
    _warm_python_workers(spark)
    qs = entry.queries()
    timings: dict[str, float] = {}
    all_samples: dict[str, list[float]] = {}
    n_triples = 0
    for name in HEADLINE + EXTRA:
        reps = max(BENCH_REPEATS, MORE_REPEATS.get(name, 0))
        med, samples, cnt = _time_query(qs[name], spark, reps)
        timings[name] = med
        all_samples[name] = samples
        if name == "q_triples":
            n_triples = cnt
    total = round(sum(timings[n] for n in HEADLINE), 3)
    extra_total = round(sum(timings[n] for n in EXTRA), 3)
    triples_per_sec = (
        round(n_triples / timings["q_triples"], 1)
        if timings.get("q_triples")
        else None
    )
    inc = _bench_incremental(spark)
    inc.update(_bench_incremental_graph(spark))
    spark.stop()
    return {
        "metric": "headline query wall time, median of %d after warm-up "
        "(sf%s, local[%s]); extras benched separately"
        % (BENCH_REPEATS, SF_DIR.rstrip("/").rsplit("sf", 1)[-1], CPUS),
        "value": total,
        "unit": "sec",
        "queries": timings,
        "samples": all_samples,
        "extra_value": extra_total,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "n_triples": n_triples,
        "triples_per_sec": triples_per_sec,
        # RAW os.getloadavg() — nothing subtracted. The before-values
        # are the interpretable ones (captured before the Spark session
        # starts): >> 0 with no local consumer means a co-tenant burst
        # overlapped the window. The after-value inevitably includes
        # this process's own just-finished 32-core run.
        "host_load_1m_before": round(load_before[0], 2),
        "host_load_15m_before": round(load_before[2], 2),
        "host_load_1m_after": round(os.getloadavg()[0], 2),
        # single-thread host-speed constant (see _cpu_calibration): divide
        # wall times by (this / a reference run's value) to compare rounds
        # across host clock/steal drift
        "host_pyloop_sec": pyloop,
        **inc,
    }


SCALE_REPL = int(os.environ.get("CTRE_SCALING_REPL", "40"))


def _scaling_input(spark) -> str:
    """Replicate the documents table SCALE_REPL× into a multi-file parquet
    dir so (a) both parallelism levels read the identical input and (b) each
    core has real work — at sf0.1 alone, task-scheduling overhead dominates
    and the scaling measurement is meaningless. Also materializes the
    candidate table once, for the scoring-stage measurement."""
    path = f"/tmp/ctre_scaling_docs_repl{SCALE_REPL}"
    if not os.path.exists(path + "/_SUCCESS"):
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        reps = spark.range(SCALE_REPL).withColumnRenamed("id", "rep")
        big = docs.crossJoin(reps).select(
            (F.col("doc_id") * SCALE_REPL + F.col("rep")).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        big.repartition(256).write.mode("overwrite").parquet(path)
    cand_path = f"/tmp/ctre_scaling_cand_repl{SCALE_REPL}"
    if not os.path.exists(cand_path + "/_SUCCESS"):
        from clinicaltransformerrelationextraction_spark.config import (
            PipelineConfig,
        )
        from clinicaltransformerrelationextraction_spark.operators.candidates import (  # noqa: E501
            candidates,
        )

        candidates(
            spark.read.parquet(path), PipelineConfig()
        ).write.mode("overwrite").parquet(cand_path)
    return path


def _level_session(cpus: str):
    """Session for one scaling level. CTRE_SCALING_MASTER=local-cluster
    (default) spawns REAL separate executor JVM processes — the honest
    stand-in for 'N executors': per-executor heaps/GC, executor-side Python
    workers. Code ships to those workers as the --py-files artifact
    (tools/make_pyfiles.py zip via SparkContext.addPyFile, the runtime
    equivalent of spark-submit --py-files; self-containment pinned by
    tests/test_pyfiles_submit.py) — the executors never see the repo on
    PYTHONPATH. local falls back to single-JVM local[n].

    NOTE: the zip ships ONLY the package — helpers defined in this bench
    module (e.g. _warm_python_workers._identity) reach executors by
    cloudpickle closure-by-value, which happens only when bench runs as a
    SCRIPT (__main__). Importing bench as a module and driving the
    scaling path would pickle them by reference and fail on executors
    with ModuleNotFoundError: bench — run `python bench.py --scaling`,
    never `from bench import ...` for cluster-mode paths."""
    from clinicaltransformerrelationextraction_spark.session import get_spark

    mode = os.environ.get("CTRE_SCALING_MASTER", "local-cluster")
    if mode == "local-cluster":
        from tools.make_pyfiles import build_pyfiles_zip

        os.environ.setdefault(
            "SPARK_HOME",
            os.path.dirname(__import__("pyspark").__file__),
        )
        nexec = max(int(cpus) // 4, 1)
        master = f"local-cluster[{nexec},4,8192]"
        extra = {
            "spark.driver.memory": "4g",
            "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
            "spark.executorEnv.OMP_NUM_THREADS": "1",
        }
        spark = get_spark(
            app_name="ctre-scale", master=master,
            shuffle_partitions=max(int(cpus), 8), extra_conf=extra,
        )
        spark.sparkContext.addPyFile(str(build_pyfiles_zip()))
        return spark
    return _session(cpus)


def run_scaling_level(cpus: str, path: str, repeats: int | None = None) -> dict:
    """One parallelism level, run in a FRESH process tree so heap state and
    JVM flags don't leak between levels. Measures BOTH the end-to-end
    flagship pipeline and the scoring stage alone (over pre-materialized
    candidates, CTRE_SCALING_SCORER backend, default mlp = the
    compute-realistic transformer stand-in). Reports the best of N runs
    (steady-state throughput, the quantity that scales with executors)."""
    from clinicaltransformerrelationextraction_spark.config import (
        PipelineConfig,
    )
    from clinicaltransformerrelationextraction_spark.operators.scoring import (
        score_filter_number,
    )
    from clinicaltransformerrelationextraction_spark.plans.pipeline import (
        run_pipeline,
    )

    if repeats is None:
        repeats = int(os.environ.get("CTRE_SCALING_REPEATS", "3"))
    scorer = os.environ.get("CTRE_SCALING_SCORER", "mlp")
    spark = _level_session(cpus)
    _warm_python_workers(spark)
    docs = spark.read.parquet(path)
    out: dict = {}

    best, n = None, 0
    run_pipeline(docs, PipelineConfig()).triples.count()  # warm-up
    for _ in range(repeats):
        t0 = time.time()
        n = run_pipeline(docs, PipelineConfig()).triples.count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out.update(
        sec=round(best, 3), triples_per_sec=round(n / best, 1), n_triples=n
    )

    cand_path = path.replace("_docs_", "_cand_")
    if os.path.exists(cand_path + "/_SUCCESS"):
        cand = spark.read.parquet(cand_path)
        cfg = PipelineConfig(scorer=scorer)
        score_filter_number(cand, cfg).count()  # warm-up
        sbest, sn = None, 0
        for _ in range(repeats):
            t0 = time.time()
            sn = score_filter_number(cand, cfg).count()
            dt = time.time() - t0
            sbest = dt if sbest is None else min(sbest, dt)
        out.update(
            score_sec=round(sbest, 3),
            score_tps=round(sn / sbest, 1),
            score_backend=scorer,
        )
    spark.stop()
    return out


def _spinners(cores: range) -> list:
    """Register-only busy loops pinned to otherwise-idle cores.

    Why: on this host, 8 busy cores turbo well above the all-core clock
    (measured: an 8-proc md5 burn runs ~16% faster with 24 cores idle than
    with them busy), which INFLATES the small-cluster baseline — a real
    N-executor cluster does not get faster clocks because the OTHER hosts'
    cores exist. Occupying the idle cores with a pure-register spin (no
    memory traffic) equalizes per-core clocks across levels, which is the
    property the N-vs-4N comparison assumes. Disable with
    CTRE_EQUALIZE_CLOCKS=0 to measure the raw (turbo-inflated) baseline.
    """
    import subprocess

    return [
        subprocess.Popen(
            ["taskset", "-c", str(c), sys.executable, "-c",
             "while True: pass"]
        )
        for c in cores
    ]


def run_scaling() -> dict:
    """The flagship pipeline (documents -> candidates -> Arrow-batched
    scoring -> triples) at two parallelism levels on the SAME input — the
    sandbox stand-in for the north rule's N vs 4N executors. Each level runs
    in its own subprocess (fresh JVM, same heap size), taskset-pinned; the
    smaller level's idle cores run clock-equalizing spinners (see
    _spinners)."""
    import subprocess

    prep = _session(CPUS)
    path = _scaling_input(prep)
    prep.stop()

    nproc = os.cpu_count() or 32
    equalize = os.environ.get("CTRE_EQUALIZE_CLOCKS", "1") == "1"
    rounds = int(os.environ.get("CTRE_SCALING_ROUNDS", "2"))
    levels = os.environ.get("CTRE_SCALING_LEVELS", "8,32").split(",")
    out: dict = {}
    out["round_effs"] = []
    env = dict(os.environ, CTRE_DRIVER_MEM="24g")
    # INTERLEAVE the levels across rounds: this shared host's throughput
    # drifts +-15% minute-to-minute, so measuring each level once at
    # different times turns that drift straight into the efficiency
    # number; alternating N/4N/N/4N and pairing WITHIN a round samples
    # both levels under comparable host conditions. The ORDER of the two
    # legs also alternates round-to-round (8,32 / 32,8 / ...): with a
    # fixed order, a monotone drift during each round biases every pair
    # the same way (the r4-B 0.788 invocation was one leg catching an
    # uncommonly clean window); alternating the order makes that bias
    # cancel across pairs instead of accumulating
    for _r in range(rounds):
        pair = {}
        for cpus in (levels if _r % 2 == 0 else list(reversed(levels))):
            # pin the WHOLE process tree (JVM task threads + Python UDF
            # workers) to exactly `cpus` cores — otherwise local[8]'s
            # Python workers overflow onto spare cores and the 8-core
            # level is not an 8-core cluster stand-in
            cmd = [
                "taskset", "-c", f"0-{int(cpus) - 1}",
                sys.executable, os.path.abspath(__file__),
                "--scaling-level", cpus, path,
            ]
            spin = (
                _spinners(range(int(cpus), nproc))
                if equalize and int(cpus) < nproc
                else []
            )
            try:
                r = subprocess.run(
                    cmd, capture_output=True, text=True, env=env, check=True,
                )
            finally:
                for sp in spin:
                    sp.kill()
            lvl = json.loads(r.stdout.strip().splitlines()[-1])
            pair[cpus] = lvl
            if cpus not in out or lvl["sec"] < out[cpus]["sec"]:
                out[cpus] = lvl
        ratio = int(levels[-1]) / int(levels[0])
        out["round_effs"].append(
            round(
                pair[levels[-1]]["triples_per_sec"]
                / pair[levels[0]]["triples_per_sec"] / ratio, 3,
            )
        )
        # stream each completed round so a timeout loses nothing
        print(json.dumps({"round_pair": pair,
                          "round_eff": out["round_effs"][-1]}),
              file=sys.stderr, flush=True)
    lo, hi = levels[0], levels[-1]
    ratio = int(hi) / int(lo)
    out[f"scaling_efficiency_{lo}_to_{hi}"] = round(
        out[hi]["triples_per_sec"] / out[lo]["triples_per_sec"] / ratio, 3
    )
    if "score_tps" in out[lo] and "score_tps" in out[hi]:
        out[f"score_stage_efficiency_{lo}_to_{hi}"] = round(
            out[hi]["score_tps"] / out[lo]["score_tps"] / ratio, 3
        )
    out["best_round_eff"] = max(out["round_effs"])
    out["replication"] = SCALE_REPL
    out["clock_equalized"] = equalize
    out["rounds"] = rounds
    return out


if __name__ == "__main__":
    if "--scaling-level" in sys.argv:
        i = sys.argv.index("--scaling-level")
        print(json.dumps(run_scaling_level(sys.argv[i + 1], sys.argv[i + 2])))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
