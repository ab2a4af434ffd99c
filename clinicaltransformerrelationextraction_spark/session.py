"""SparkSession factory tuned for the KG-construction workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def resolve_master(master: str | None, environ=None) -> str | None:
    """Which master (if any) the builder should set.

    Explicit wins; under spark-submit (PYSPARK_GATEWAY_PORT set by its
    launcher) NONE is set so ``--master`` rules; otherwise the local
    default. Pure so the spark-submit branch is testable without a
    gateway (tests/test_pyfiles_submit.py::test_resolve_master)."""
    if master is not None:
        return master
    environ = os.environ if environ is None else environ
    if "PYSPARK_GATEWAY_PORT" in environ:
        return None
    return f"local[{environ.get('SPARK_GRAFT_CPUS', '*')}]"


def get_spark(
    app_name: str = "ctre-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a session with AQE, Arrow, and skew-join handling enabled.

    On a real cluster the same config ships via spark-submit --py-files;
    locally ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]``.

    Under ``spark-submit`` (detected by the gateway env var the launcher
    sets) an explicit ``master`` is NOT defaulted in: the submit-provided
    ``--master`` must win, and a builder ``.master(...)`` call would
    silently override it — the failure mode where a "cluster" job runs
    local on the driver host. The resolution logic lives in
    ``resolve_master`` so the contract is unit-pinned
    (tests/test_pyfiles_submit.py), and the launcher path is driven
    end-to-end by the same file's spark-submit tests.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = resolve_master(master, os.environ)
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    b = SparkSession.builder.appName(app_name)
    if master is not None:
        b = b.master(master)
    b = (
        b
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("CTRE_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
