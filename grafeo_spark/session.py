"""SparkSession factory with scale-oriented defaults.

Settings are chosen for correctness parity with the DuckDB oracle (UTC
session time zone, ANSI mode as shipped with Spark 4) and for behavior that
survives a 100 TB cluster (AQE on, skew-join handling on, sane shuffle
partitioning). On a real cluster only ``shuffle_partitions`` and memory
sizing change; the plan shapes stay the same.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "grafeo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        env_sp = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if env_sp and env_sp.isdigit():
            shuffle_partitions = int(env_sp)
        else:
            shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    # AQE picks the real post-shuffle parallelism by coalescing DOWN from
    # this number, so it bounds per-task shuffle volume: at 32 (the CPU
    # count) a 1.25M-doc banded-join task holds 5x the sf5 volume and
    # tips into the spill/memory-pressure regime (the r11 sf25
    # superlinearity). 4x the core count keeps tasks small at the
    # measured decades while AQE still coalesces tiny shuffles to a
    # handful of partitions; on a real cluster this scales with the
    # executor count exactly like shuffle.partitions.
    initial_parts = os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS") or str(
        max(4 * shuffle_partitions, 128)
    )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Deterministic timestamp semantics matching the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # AQE: runtime coalescing, skew-join splitting, empty-relation
        # propagation — replaces the reference's (stub) adaptive executor.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            initial_parts,
        )
        # Arrow for every pandas_udf / applyInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # The driver's parquet uses TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert in the loader.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Local testing headroom; a cluster submit overrides these.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        # ContextCleaner only unpersists dead checkpoint/broadcast blocks
        # after a JVM GC surfaces their weak references; the default
        # periodic-GC interval (30min) never fires inside a single-node
        # battery or test session, so eagerly-checkpointed frames from
        # finished queries pile up in executor memory and read as a slow
        # upward drift across a long session (r7 bench A/B finding).
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "45s"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
