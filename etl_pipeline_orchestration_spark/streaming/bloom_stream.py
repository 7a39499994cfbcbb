"""Streaming ingest with riding bloom-index maintenance: as event
batches land in a hive-partitioned table, the data-skipping sidecar
(operators/bloom_index.py) refreshes for exactly the partitions each
batch touched — the seventh streaming-maintenance member, and the one
that keeps POINT LOOKUPS fast on a table that only ever grows.

Layout and idempotency: each batch appends under
``<table>/<part>=<v>/ingest_batch=<id>/`` (partition col FIRST, so the
bloom lookup's explicit-directory scan shape is untouched; the
ingest_batch level is the standard streaming-landing epoch shard). A
replayed batch id is detected by its directories already existing and
the append is SKIPPED — but the bloom refresh always re-runs, because
the crash window between append and refresh must heal on replay.

Fail-safe contract (inherited from the sidecar): the refresh stamps
the fingerprint of the WHOLE table as of the refresh. A crash after
the append but before the refresh leaves the sidecar stamped with the
pre-batch fingerprint, so a fingerprint-checked lookup REFUSES to
prune rather than silently missing the new rows; the checkpoint
replay re-runs the refresh and heals the window. No counterpart in
the reference (stateless per-run pipeline); this is §2.10 warehouse
maintenance."""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import WarehouseLoader
from etl_pipeline_orchestration_spark.operators import bloom_index


def append_batch_with_bloom(
    loader: WarehouseLoader,
    table: str,
    index_table: str,
    batch: DataFrame,
    batch_id: int,
    key_col: str,
    part_col: str,
) -> bool:
    """Apply one micro-batch: idempotent partition-sharded append +
    touched-partition bloom refresh. Returns False when the append was
    a replay (refresh still runs)."""
    root = loader._path(table)
    replay = bool(_glob.glob(os.path.join(root, "*", f"ingest_batch={batch_id}")))
    touched = [
        r["p"]
        for r in batch.select(
            F.col(part_col).cast("string").alias("p")
        ).distinct().collect()
    ]
    if not replay:
        (
            batch.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("append")
            .partitionBy(part_col, "ingest_batch")
            .parquet(root)
        )
    if touched:
        df = loader.spark.read.parquet(root).drop("ingest_batch")
        if bloom_index_exists(loader, index_table):
            bloom_index.refresh_partitions(
                loader, df, index_table, key_col, part_col, touched
            )
        else:
            bloom_index.build(loader, df, index_table, key_col, part_col)
    return not replay


def bloom_index_exists(loader: WarehouseLoader, index_table: str) -> bool:
    from etl_pipeline_orchestration_spark.loader import SnapshotTable

    return SnapshotTable(loader, index_table).current_version() is not None


def stream_ingest_with_bloom(
    stream: DataFrame,
    loader: WarehouseLoader,
    table: str,
    index_table: str,
    key_col: str,
    part_col: str,
    checkpoint_dir: str,
) -> None:
    """Drain the stream's backlog through the indexed-append sink
    (availableNow: finite, then stop)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    run_foreach_batch_append(
        stream,
        lambda batch, bid: append_batch_with_bloom(
            loader, table, index_table, batch, bid, key_col, part_col
        ),
        checkpoint_dir,
        output_mode="append",
    )
