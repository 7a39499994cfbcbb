"""Streaming → warehouse upsert: the incremental-materialization path.

Composes the streaming runtime with a sequence-aware CDC merge: each
micro-batch is treated as an upsert feed (latest row per key BY SEQUENCE
wins) and merged into a warehouse parquet table.
The result is a continuously-maintained table whose contents always
equal the batch recomputation over all data seen so far — verified by
tests/test_streaming_upsert.py.

Two storage disciplines:

* ``upsert_batch`` — in-place path with rename-aside swap (legacy
  shape; readers racing the swap can still lose files).
* ``upsert_batch_versioned`` / ``stream_upsert_snapshots`` — the
  production path: each micro-batch's merge publishes a NEW
  loader.SnapshotTable version (immutable ``v=N`` dir + atomic pointer
  flip carrying the applied-upto watermark). Long readers are isolated
  from the stream, a crash before the flip leaves an orphan directory
  the next write supersedes, replayed batch ids are skipped by the
  watermark, and every batch's post-merge state stays time-travelable
  (CDC-as-of-batch-k — the audit query the snapshot layer exists for).
  Old versions are reclaimed with ``SnapshotTable.prune``.

Scale shape: per micro-batch, one dedup-by-key aggregate over the batch
(small) plus one full-outer merge join against the current version on
the upsert key. foreachBatch checkpointing gives exactly-once per batch
id. On a real cluster the snapshot write is a transactional-table
commit; the merge plan is identical.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader


def _latest_per_key(batch: DataFrame, key: str, seq_col: str) -> DataFrame:
    w = W.partitionBy(key).orderBy(F.col(seq_col).desc())
    return (
        batch.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def _merge_latest(
    target: DataFrame, latest: DataFrame, key: str, seq_col: str
) -> DataFrame:
    """Sequence-aware full-outer merge: a change row only replaces the
    stored row when its ``seq_col`` is newer. Micro-batch boundaries
    don't respect event order (a later file can carry older events), so
    a plain last-write-wins merge would let stale rows clobber fresh
    ones; conditioning on the sequence makes the merged table
    independent of batch arrival order."""
    payload = [c for c in latest.columns if c != key]
    t = target.alias("t")
    c = latest.alias("c")
    newer = F.col(f"c.{key}").isNotNull() & (
        F.col(f"t.{key}").isNull()
        | (F.col(f"c.{seq_col}") >= F.col(f"t.{seq_col}"))
    )
    return t.join(
        c, F.col(f"t.{key}") == F.col(f"c.{key}"), "full_outer"
    ).select(
        F.coalesce(F.col(f"t.{key}"), F.col(f"c.{key}")).alias(key),
        *[
            F.when(newer, F.col(f"c.{col}"))
            .otherwise(F.col(f"t.{col}"))
            .alias(col)
            for col in payload
        ],
    )


def upsert_batch(
    loader: WarehouseLoader, table: str, key: str, batch: DataFrame, seq_col: str
) -> None:
    """Merge one batch into ``table`` in place (latest row per key by
    ``seq_col`` wins — see _merge_latest for the sequence condition)."""
    _recover_swap(loader, table)
    latest = _latest_per_key(batch, key, seq_col)
    spark = batch.sparkSession
    path = loader._path(table)
    if os.path.isdir(path):
        merged = _merge_latest(spark.read.parquet(path), latest, key, seq_col)
        tmp = loader._path(f"__upsert_{table}.tmp")
        old = loader._path(f"__upsert_{table}.old")
        merged.write.mode("overwrite").parquet(tmp)
        # Swap via rename-aside so the table directory is never absent
        # for longer than one rename: a crash window that still holds
        # the full history (recovered by _recover_swap on replay). The
        # previous rmtree-then-rename left a window where a crash lost
        # the table and foreachBatch replay silently rebuilt it from
        # the current batch alone.
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    else:
        latest.write.mode("overwrite").parquet(path)


def upsert_batch_versioned(
    snaps: SnapshotTable,
    key: str,
    batch: DataFrame,
    seq_col: str,
    batch_id: int,
    app_id: str,
) -> bool:
    """Merge one micro-batch and publish the result as a new snapshot
    version. No rename window exists at all: the merge reads the
    CURRENT immutable version directory and the write lands in a fresh
    one, so concurrent readers are never disturbed and a crash at any
    point leaves the previous version current. Returns False when the
    batch id was already applied (checkpoint replay) — the sequence
    condition makes a re-merge idempotent anyway, but skipping keeps
    the version history one-per-batch."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    latest = _latest_per_key(batch, key, seq_col)
    if snaps.current_version() is None:
        merged = latest
    else:
        merged = _merge_latest(snaps.read(), latest, key, seq_col)
    snaps.write(merged, marker=(app_id, batch_id))
    return True


def _recover_swap(loader: WarehouseLoader, table: str) -> None:
    """Heal an interrupted swap before merging: if a crash happened
    between the two renames, the table directory is missing but the
    rename-aside copy holds the full pre-merge history — restore it
    (the checkpointed batch then replays against it). A leftover .old
    beside an intact table means the crash hit before cleanup — drop it."""
    path = loader._path(table)
    old = loader._path(f"__upsert_{table}.old")
    if os.path.isdir(old):
        if os.path.isdir(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)


def stream_upsert_to_warehouse(
    stream: DataFrame,
    loader: WarehouseLoader,
    table: str,
    key: str,
    seq_col: str,
    checkpoint_dir: str,
) -> None:
    """Drain the stream's backlog, upserting each micro-batch into the
    warehouse table (availableNow: finite, then stop)."""
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _id: upsert_batch(loader, table, key, batch, seq_col)
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_upsert_snapshots(
    stream: DataFrame,
    loader: WarehouseLoader,
    table: str,
    key: str,
    seq_col: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the stream's backlog through the snapshot-versioned upsert
    (availableNow: finite, then stop): one published version per
    micro-batch, the applied-upto watermark riding each pointer flip.
    Returns the snapshot table — ``read(version=k)`` is the merged
    state as of batch k."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream,
        lambda batch, bid: upsert_batch_versioned(
            snaps, key, batch, seq_col, bid, app_id
        ),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps
