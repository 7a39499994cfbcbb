"""Parquet scans for the driver-generated test corpus.

At 100 TB the same call works unchanged: ``spark.read.parquet`` on a
directory of row-group-sized files gives a vectorized columnar scan with
predicate pushdown and column pruning; partition-pruning comes free if the
layout is hive-partitioned. Nothing here materializes — callers compose
lazy plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor (TPC-H
# region/nation are fixed-size; supplier/part grow slowly). Fact tables
# must never be broadcast.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader rejects. Read it as raw nanos (legacy conf) and integer-divide
    to microseconds — `DIV 1000` keeps full int64 precision (a double
    division would lose precision above 2^53).

    The conf is set for the ``spark.read.parquet`` call only and then
    restored: the conf value is resolved into the scan when the
    DataFrame is created (schema inference reads the footers eagerly),
    so later actions on the returned plan succeed with the session conf
    back at its prior value — verified by test; no session-global leak
    into unrelated reads (the driver's vanilla session included)."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key)  # effective value ("false" when unset)
    spark.conf.set(key, "true")
    try:
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    finally:
        spark.conf.set(key, prev)
    return raw.withColumn(
        "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
    ).select("event_id", "ts", "user_id", "event_type", "value", "props")
