"""Streaming near-duplicate detection over a landing document stream.

The batch side already splits dedup into a persistable LSH band INDEX
(operators/dedup.py:lsh_band_table) and an incremental candidate join
(minhash_incremental_candidates: new×history through the index plus
new×new, never re-signaturing the archive). This module runs that
split continuously: each micro-batch of landed documents

1. emits the candidate pairs it completes — (batch × stored-index) ∪
   (batch × batch) — into a per-batch output partition, then
2. appends its own band rows as an ``index_table/batch_id=N``
   partition (overwrite semantics — replay idempotent), then
3. publishes a model-sized manifest snapshot whose atomic pointer
   flip carries the applied-upto watermark. Long readers of manifest
   version N resolve the index to partitions ``batch_id <= N`` and
   are isolated from the stream publishing N+1.

Replay safety is ORDERED: candidates write BEFORE the band partition,
which writes BEFORE the watermark advances. A crash after (1) or (2)
replays into the same directories with the same content — the
candidate join reads the index THROUGH the watermark (partition-pruned
``batch_id <= applied_upto``), so an orphaned band partition from the
crashed attempt is invisible to the replay; a crash after (3) is
skipped entirely by the watermark (which also carries the checkpoint
identity — a fresh checkpoint against an existing index FAILS LOUDLY
rather than silently dropping or double-counting, see watermark.py).
In all cases the union over candidate partition directories holds
exactly one emission per pair.

Mega-bucket guard semantics under streaming: the guard counts each
(band_id, band_hash) bucket over index + batch AT EMISSION TIME. A
bucket that later grows past ``max_bucket`` suppresses only FUTURE
pairs — pairs already emitted are not retroactively withdrawn, so a
full-corpus batch rerun (which sees the final bucket sizes) can emit
FEWER pairs than the stream did. That is the deliberate production
trade-off: streaming dedup errs toward keeping early evidence of
duplication rather than un-emitting it. The stream==batch twin test
pins exact pair-for-pair equality in the regime where no bucket
crosses the threshold mid-stream (true at the fixture scale, and at
any scale for buckets below max_bucket).

Scale shape per micro-batch: signature + banding over the BATCH only
(the archive is touched through its index join, cost ∝ matching band
buckets), one histogram-of-bands shuffle, ONE O(batch) band-partition
write plus an O(1) manifest publish — per-batch storage cost never
depends on index size (same discipline as ann_stream assignments).
Daily cost scales with the batch, not the corpus — the property that
makes streaming dedup viable against a 100 TB archive (on a cluster
the partition append becomes a transactional-table commit; the join
plan is identical)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.operators.dedup import (
    lsh_band_table,
    minhash_incremental_candidates,
)

BAND_SCHEMA = "doc_id bigint, band_id int, band_hash bigint"


def read_band_index(
    loader: WarehouseLoader,
    index_table: str,
    index_snaps: SnapshotTable,
    app_id: str,
) -> DataFrame:
    """Band rows of every PUBLISHED batch: the union of
    ``index_table/batch_id=*`` partitions pruned to the manifest's
    watermark (compaction.read_published_partitions — the shared read
    path of every per-batch partition store)."""
    from etl_pipeline_orchestration_spark.streaming.compaction import (
        read_published_partitions,
    )

    return read_published_partitions(
        loader.spark,
        loader._path(index_table),
        BAND_SCHEMA,
        index_snaps.applied_upto(app_id),
    )


def dedup_batch(
    loader: WarehouseLoader,
    index_snaps: SnapshotTable,
    candidates_table: str,
    batch_docs: DataFrame,
    batch_id: int,
    app_id: str,
    index_table: str = "lsh_index",
) -> bool:
    """Process one micro-batch: emit its candidate pairs, then grow the
    index by one partition. Returns False when the batch was already
    fully applied."""
    if batch_id <= index_snaps.applied_upto(app_id):
        return False

    spark = batch_docs.sparkSession
    index = read_band_index(loader, index_table, index_snaps, app_id)
    cands = minhash_incremental_candidates(batch_docs, index)
    cand_dir = os.path.join(
        loader._path(candidates_table), f"batch_id={batch_id}"
    )
    cands.write.mode("overwrite").parquet(cand_dir)

    new_bands = lsh_band_table(batch_docs)
    band_dir = os.path.join(loader._path(index_table), f"batch_id={batch_id}")
    new_bands.write.mode("overwrite").parquet(band_dir)
    # The manifest snapshot is one row of batch accounting — its only
    # load-bearing content is the watermark the pointer flip publishes.
    manifest = spark.createDataFrame(
        [(batch_id,)], "last_batch_id bigint"
    )
    index_snaps.write(manifest, marker=(app_id, batch_id))
    return True


def compact_band_index(
    loader: WarehouseLoader,
    index_table: str,
    index_snaps: SnapshotTable,
    app_id: str,
    target_files: int = 1,
) -> int:
    """Fold all PUBLISHED band partitions into one consolidated
    ``batch_id=watermark`` partition (streaming/compaction.py): bounds
    the file count of a long-running dedup stream without touching the
    manifest or the replay watermark. Call between micro-batches (the
    stores are single-writer). Returns partitions folded."""
    from etl_pipeline_orchestration_spark.streaming.compaction import (
        compact_batch_partitions,
    )

    return compact_batch_partitions(
        loader.spark,
        loader._path(index_table),
        index_snaps.applied_upto(app_id),
        BAND_SCHEMA,
        target_files=target_files,
    )


def stream_dedup_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    index_table: str,
    candidates_table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the document stream's backlog through the incremental
    dedup (availableNow: finite, then stop). Returns the index manifest
    snapshot table; band rows live under ``index_table/batch_id=*``.
    The checkpoint path doubles as the watermark's app id: the
    (checkpoint, index) pair is the unit of exactly-once."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, index_table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_docs,
        lambda batch, bid: dedup_batch(
            loader, snaps, candidates_table, batch, bid, app_id,
            index_table=index_table,
        ),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps
