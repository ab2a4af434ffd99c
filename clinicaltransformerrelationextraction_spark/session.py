"""SparkSession factory tuned for the KG-construction workload."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ctre-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a session with AQE, Arrow, and skew-join handling enabled.

    On a real cluster the same config ships via spark-submit --py-files;
    locally ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]``.

    Under ``spark-submit`` (detected by the gateway env vars the launcher
    sets) an explicit ``master`` is NOT defaulted in: the submit-provided
    ``--master`` must win, and a builder ``.master(...)`` call would
    silently override it — the failure mode where a "cluster" job runs
    local on the driver host. Pinned by tests/test_pyfiles_submit.py's
    CLI launcher test.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not under_submit:
        master = f"local[{cpus}]"
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
