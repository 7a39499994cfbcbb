"""Streaming ingest with riding bloom-index maintenance: as event
batches land in a hive-partitioned table, the data-skipping sidecar
(operators/bloom_index.py) refreshes for exactly the partitions each
batch touched — the seventh streaming-maintenance member, and the one
that keeps POINT LOOKUPS fast on a table that only ever grows.

Layout: each batch appends under ``<table>/<part>=<v>/ingest_batch=
<id>/`` (partition col FIRST, so the bloom lookup's explicit-directory
scan shape is untouched; the ingest_batch level is the standard
streaming-landing epoch shard).

Replay/commit protocol — Spark's file committer is NOT all-or-nothing
across partition directories, so "some ingest_batch=<id> dir exists"
does not mean the append completed; a mid-commit crash can leave a
partial partition subset. The sink therefore keeps an explicit
done-marker per batch (``<table>/_ingest_done/<id>``, written only
after the append job returns):

* marker ABSENT on (re)entry → any ``ingest_batch=<id>`` directories
  are partial leftovers: REMOVED, then the batch re-appends cleanly;
* marker PRESENT → the append completed; only the sidecar refresh
  re-runs (idempotent via the sidecar's own applied-upto watermark).

Fingerprint maintenance is INCREMENTAL: the table fingerprint is an
additive sum (bloom_index.table_fingerprint), so each batch computes
its own batch-sized delta and the refresh stamps ``stored + delta`` —
per-batch work stays O(batch + touched partitions), never O(table)
(the touched-partition bitmap rebuild reads partition-pruned
directories). The sidecar publish carries the (checkpoint, batch)
watermark, so a replayed batch whose refresh already landed is
skipped, and the crash window between append and refresh fails safe:
the sidecar still carries the pre-batch fingerprint, a checked lookup
REFUSES to prune, and the replayed refresh heals it. No counterpart
in the reference (stateless per-run pipeline); §2.10 warehouse
maintenance."""

from __future__ import annotations

import glob as _glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.operators import bloom_index


def _done_marker(root: str, batch_id: int) -> str:
    return os.path.join(root, "_ingest_done", str(batch_id))


def append_batch_with_bloom(
    loader: WarehouseLoader,
    table: str,
    index_table: str,
    batch: DataFrame,
    batch_id: int,
    key_col: str,
    part_col: str,
    app_id: str = "bloom_ingest",
) -> bool:
    """Apply one micro-batch: partial-commit-safe idempotent append +
    incremental touched-partition bloom refresh. Returns False when
    the append itself was a completed replay."""
    root = loader._path(table)
    marker = _done_marker(root, batch_id)
    appended = False
    if not os.path.isfile(marker):
        # No completion marker: any ingest_batch dirs from this id are
        # PARTIAL (mid-commit crash) — remove and re-append atomically
        # from the batch's point of view.
        for d in _glob.glob(os.path.join(root, "*", f"ingest_batch={batch_id}")):
            shutil.rmtree(d)
        (
            batch.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("append")
            .partitionBy(part_col, "ingest_batch")
            .parquet(root)
        )
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        with open(marker, "w") as f:
            f.write("done")
        appended = True

    touched = [
        r["p"]
        for r in batch.select(
            F.col(part_col).cast("string").alias("p")
        ).distinct().collect()
    ]
    if touched:
        snaps = SnapshotTable(loader, index_table)
        first = snaps.current_version() is None
        if not first and snaps.applied_upto(app_id) >= batch_id:
            return appended  # sidecar already includes this batch
        df = loader.spark.read.parquet(root).drop("ingest_batch")
        delta = bloom_index.table_fingerprint(
            batch.select(key_col, part_col), key_col, part_col
        )
        if first:
            bloom_index.build(
                loader, df, index_table, key_col, part_col,
                marker=(app_id, batch_id),
            )
        else:
            bloom_index.refresh_partitions(
                loader, df, index_table, key_col, part_col, touched,
                fingerprint=bloom_index.fp_add(
                    bloom_index.stored_fingerprint(loader, index_table), delta
                ),
                marker=(app_id, batch_id),
            )
    return appended


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

    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream,
        lambda batch, bid: append_batch_with_bloom(
            loader, table, index_table, batch, bid, key_col, part_col, app_id
        ),
        checkpoint_dir,
        output_mode="append",
    )
