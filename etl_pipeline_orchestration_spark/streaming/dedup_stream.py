"""Streaming near-duplicate detection over a landing document stream.

The batch side already splits dedup into a persistable LSH band INDEX
(operators/dedup.py:lsh_band_table) and an incremental candidate join
(minhash_incremental_candidates: new×history through the index plus
new×new, never re-signaturing the archive). This module runs that
split continuously: each micro-batch of landed documents

1. emits the candidate pairs it completes — (batch × stored-index) ∪
   (batch × batch) — into a per-batch output partition, then
2. publishes its own band rows appended to the index as a new
   SnapshotTable version (atomic pointer flip carrying the
   applied-upto watermark; long readers of version N are isolated
   from the stream publishing N+1).

Replay safety is ORDERED, not just marked: candidates write BEFORE the
index publish, into a ``batch_id=N`` directory with overwrite
semantics. A crash after (1) replays into the same directory with the
same content (the index pointer has not advanced, so the join sees the
same history); a crash after (2) is skipped entirely by the watermark
(which also carries the checkpoint identity — a fresh checkpoint
against an existing index FAILS LOUDLY rather than silently dropping
or double-counting, see watermark.py). In all cases the union over
partition directories holds exactly one emission per pair.

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
buckets), one histogram-of-bands shuffle, one index append write.
Daily cost scales with the batch, not the corpus — the property that
makes streaming dedup viable against a 100 TB archive (on a cluster
the index version write becomes a transactional-table commit; the
join plan is identical)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.operators.dedup import (
    lsh_band_table,
    minhash_incremental_candidates,
)


def dedup_batch(
    loader: WarehouseLoader,
    index_snaps: SnapshotTable,
    candidates_table: str,
    batch_docs: DataFrame,
    batch_id: int,
    app_id: str,
) -> bool:
    """Process one micro-batch: emit its candidate pairs, then grow the
    index. Returns False when the batch was already fully applied."""
    if batch_id <= index_snaps.applied_upto(app_id):
        return False

    spark = batch_docs.sparkSession
    if index_snaps.current_version() is None:
        index = spark.createDataFrame(
            [], "doc_id bigint, band_id int, band_hash bigint"
        )
    else:
        index = index_snaps.read()
    cands = minhash_incremental_candidates(batch_docs, index)
    cand_dir = os.path.join(
        loader._path(candidates_table), f"batch_id={batch_id}"
    )
    cands.write.mode("overwrite").parquet(cand_dir)

    new_bands = lsh_band_table(batch_docs)
    grown = (
        new_bands
        if index_snaps.current_version() is None
        else index.unionByName(new_bands)
    )
    index_snaps.write(grown, marker=(app_id, batch_id))
    return True


def stream_dedup_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    index_table: str,
    candidates_table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the document stream's backlog through the incremental
    dedup (availableNow: finite, then stop). Returns the index
    snapshot table. The checkpoint path doubles as the watermark's app
    id: the (checkpoint, index) pair is the unit of exactly-once."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, index_table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_docs,
        lambda batch, bid: dedup_batch(
            loader, snaps, candidates_table, batch, bid, app_id
        ),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps
