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
from pyspark.sql import types as T

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
    """events.ts has shipped as both parquet TIMESTAMP(MICROS) (read
    natively) and TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects. Handle both: read normally first; if the footer carries
    nanos, retry under the legacy nanos-as-long conf (set/restored
    around the read — schema inference resolves the conf into the scan
    eagerly, so no session-global leak) and integer-divide to
    microseconds — `DIV 1000` keeps full int64 precision where a double
    division would lose bits above 2^53."""
    path = f"{sf_dir}/events.parquet"
    key = "spark.sql.legacy.parquet.nanosAsLong"
    try:
        raw = spark.read.parquet(path)
    except Exception:
        raw = None
    if raw is None or isinstance(raw.schema["ts"].dataType, T.LongType):
        prev = spark.conf.get(key)  # effective value ("false" when unset)
        spark.conf.set(key, "true")
        try:
            raw = spark.read.parquet(path)
        finally:
            spark.conf.set(key, prev)
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif isinstance(raw.schema["ts"].dataType, T.TimestampNTZType):
        # Normalize to TimestampType so every downstream query (and the
        # DuckDB oracle, both pinned to UTC) sees one timestamp flavor.
        raw = raw.withColumn("ts", F.to_timestamp("ts"))
    return raw.select("event_id", "ts", "user_id", "event_type", "value", "props")
