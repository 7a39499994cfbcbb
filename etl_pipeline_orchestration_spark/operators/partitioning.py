"""Partition-shape helpers for CPU-bound narrow operators.

A parquet scan yields one input split per ``maxPartitionBytes`` of file,
which is right for I/O-bound plans but starves CPU-heavy per-row
operators (shingling, hashing, Arrow UDFs) when the source is a small
file: a 5 MB file = 1 task = 1 core, regardless of cluster size.
``ensure_min_partitions`` widens such inputs to the session's default
parallelism. At real scale (directories of row-group-sized files) the
scan already yields >= cores partitions and this is a no-op — the
repartition only fires exactly in the small-input regime where its
shuffle is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if current < target else df
