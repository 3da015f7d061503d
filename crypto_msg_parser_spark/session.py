"""SparkSession factory.

Local mode is a stand-in for a multi-executor cluster: shuffle partitions
scale with cores so the same job shape holds at 1000 executors (set
spark.sql.shuffle.partitions ~ 2-3x total cores there; AQE coalesces).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crypto_msg_parser_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores: None -> local[*]; otherwise local[cores].
    shuffle_partitions defaults to the core count — on a real cluster this
    would be executors*cores*2; AQE coalesces small post-shuffle partitions
    either way so over-provisioning is safe.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)
    builder = SparkSession.builder
    # Under spark-submit the master comes from the launcher (--master /
    # cluster manager); forcing local[] here would silently un-cluster the
    # job. SPARK_GRAFT_INHERIT_MASTER=1 defers to the submit-time master.
    if os.environ.get("SPARK_GRAFT_INHERIT_MASTER") != "1":
        builder = builder.master(f"local[{cores}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # exchange payloads carry case-significant keys (binance e/E, k.T/k.t)
        .config("spark.sql.caseSensitive", "true")
        # HotSpot refuses to JIT methods over 8000 bytecode bytes; Spark's
        # default hugeMethodLimit (65535) happily emits whole-stage methods
        # above that, which then run INTERPRETED — the 20-exchange routing
        # ladder measured 19-23s/600k rows in that mode vs ~2s with
        # codegen deactivated for just that subtree. 8000 is the value the
        # Spark docs recommend for HotSpot.
        .config("spark.sql.codegen.hugeMethodLimit", "8000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # RAM-disk shuffle on big-memory nodes: local[N] shuffles through
        # spark.local.dir, and /dev/shm removes disk I/O from the path
        .config(
            "spark.local.dir",
            "/dev/shm/spark-local"
            if os.access("/dev/shm", os.W_OK)
            else "/tmp",
        )
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # joins whose keys CONTAIN the storage bucket column (seen-set
        # anti-join on [rank_bucket, url_hash, canonical] over tables
        # bucketed by rank_bucket) are co-partitioned by construction;
        # without this the planner re-shuffles one side to the full key
        # tuple even though the subset partitioning already clusters it
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def finalize_memory_sink(df, name: str):
    """Seal a memory-sink-derived streaming result into a self-contained
    frame.

    Streaming rows drain an availableNow job into a uuid-named memory-sink
    temp view and return a frame over it. Left as a lazy view read, every
    run in one session leaks a global temp view (and the sink's driver-held
    rows stay reachable for the session's life) — bench.py's per-pass
    STREAMING rebuild accumulated reps x rows of them (ADVICE r4 #4). So:
    eagerly localCheckpoint the result (it no longer needs the view to
    re-execute), DROP the sink view, and hand back the checkpointed frame —
    callers that rebuild (bench.py) can .unpersist() the previous one to
    release everything.
    """
    out = df.localCheckpoint(eager=True)
    df.sparkSession.catalog.dropTempView(name)
    return out
