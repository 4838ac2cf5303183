"""SparkSession factory tuned for this engine.

All engine semantics assume ``spark.sql.session.timeZone=UTC`` (timestamp ↔
epoch arithmetic in the tier-bucketing expressions is tz-naive-UTC, matching
the reference's tz-naive pandas kernels).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pytimetk_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master == "local[*]" and cpus:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match local cores, not the 200 default: avoids tiny-partition
        # overhead at test scale; on a real cluster this is set per job.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "32"
        shuffle_partitions = os.cpu_count() or 32 if n == "*" else int(n)
    # shuffle/spill dir: prefer RAM-backed tmpfs when present (the local-mode
    # analogue of per-executor NVMe — disk /tmp serializes 32 concurrent
    # shuffle writers on this VM); SPARK_LOCAL_DIRS overrides.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dir and os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        local_dir = "/dev/shm/spark-local"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        # single-JVM local mode: driver heap IS the executor heap. 16g
        # default (was 8g) — long benches accumulate broadcast relations
        # and shuffle state across queries, and full-GC stalls under the
        # 8g ceiling produced rare 10×+ outliers on late queries; still
        # env-overridable for small hosts (SPARK_DRIVER_MEMORY)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
