"""SparkSession bootstrap.

Defaults chosen for correctness-parity with the reference's pandas
semantics and for scale:

* ``spark.sql.ansi.enabled=false`` — bad casts yield NULL, matching the
  reference's coerce-to-null (``pd.to_numeric(errors="coerce")``,
  reference etl_pipeline.py:193-196).
* AQE on — runtime re-planning (skew joins, partition coalescing) is the
  scale path for the 100 TB target.
* UTC session timezone — deterministic timestamp semantics against the
  DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "etl_pipeline_orchestration_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and submit with ``--master``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # The test corpus's events.ts is parquet TIMESTAMP(NANOS), which the
        # vectorized reader rejects; reading nanos as raw int64 is a session-
        # wide reader policy (sources/tables.py converts back to timestamp).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Confs for a real multi-executor deployment at the ~100 TB design
# point. Not applied in local mode (the defaults above are tuned for
# the test harness); pass via get_spark(extra_conf=CLUSTER_PROFILE) or
# spark-submit --conf when running on a cluster.
CLUSTER_PROFILE: dict[str, str] = {
    # ~128 MB input splits and shuffle targets: big enough to amortize
    # task overhead, small enough that a partition (plus hash tables)
    # fits executor memory with room for two concurrent tasks per core.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "134217728",
    # Start high and let AQE coalesce DOWN — the reverse (too few
    # partitions, giant spilling tasks) is not runtime-fixable.
    "spark.sql.shuffle.partitions": "4000",
    # AQE handles skew splitting and empty-partition pruning at runtime.
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "268435456",
    # Broadcast only true dims; a 100 TB fact's "small" side can still
    # be tens of GB, and a misjudged broadcast OOMs the driver.
    "spark.sql.autoBroadcastJoinThreshold": "67108864",
    # Runtime bloom filters (on by default) prune the fact-side scan of
    # shuffle joins with a selective build side. Default creation-side
    # cap is 10 MB; against a 100 TB application side a larger build
    # side still pays for itself, so widen it.
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "268435456",
    # Off-heap shuffle/state pressure relief on large executors.
    "spark.memory.offHeap.enabled": "true",
    "spark.memory.offHeap.size": "8g",
    # Arrow batches sized for the pandas-UDF matmul kernels.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "20000",
    # --- Streaming state at 100 TB: RocksDB-backed state store. The
    # default HDFS-backed provider keeps every key's state on the JVM
    # heap; session windows / stream-stream joins over billions of keys
    # OOM executors long before CPU saturates. RocksDB spills state to
    # local SSD with bounded block-cache memory, and changelog
    # checkpointing ships per-batch deltas instead of full SST snapshots
    # (both providers pass the stream-vs-batch twin tests —
    # tests/test_streaming.py parametrizes the stateful op over the two).
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
        "true",
    # Bound total RocksDB memory per executor (block cache + memtables
    # shared across all state store instances on the node).
    "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": "true",
    "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB": "2048",
    # Unload idle store instances instead of pinning every partition's
    # native handle for the life of the executor.
    "spark.sql.streaming.stateStore.maintenanceInterval": "60s",
}
