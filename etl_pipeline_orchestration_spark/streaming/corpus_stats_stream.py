"""Streaming maintenance of the corpus-statistics histogram.

The batch side proves the law (plans/corpus_ops.py:
corpus_stats_incremental_merge — f(A ⊎ B) == merge(f(A), f(B)),
cross-engine hash-checked); this module runs the law continuously: as
document files land, each micro-batch's gram-stats histogram
(plans/corpus_stats.gram_stats_of — the SAME tokenize+aggregate plan
as batch, so the runtimes cannot drift) merges additively into a
stored warehouse histogram. The nightly corpus_report then reads a
histogram that is always current, having only ever scanned each
document once.

Storage is a ``SnapshotTable`` (loader.py): each merge publishes a new
immutable version behind an atomic CURRENT pointer, which buys three
properties the old rename-swap could not give together:

* **exactly-once replay** — an additive merge is NOT replay-idempotent
  (summing a replayed batch double-counts), so each version carries
  the applied-batch watermark INSIDE its directory; the pointer flip
  publishes data + watermark atomically, and a replayed foreachBatch
  id ≤ watermark is skipped. A crash between data write and pointer
  flip leaves an orphan version the replay simply supersedes.
* **reader isolation** — a long corpus_report job reading version N is
  never disturbed by the stream publishing N+1.
* **corpus-stats time travel** — every intermediate histogram stays
  readable by version until pruned: drift between corpus snapshots
  (yesterday's language mix vs today's) is a version-to-version query,
  no extra bookkeeping.

Scale shape per micro-batch: one scan of the batch's new files, one
map-side-combined aggregate to batch-histogram size, one merge
aggregate in histogram space (vocab²-bounded, never corpus-bounded),
one histogram-sized write. State outside the store is zero — the
histogram IS the state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.operators.sampling import with_split
from etl_pipeline_orchestration_spark.plans.corpus_stats import gram_stats_of

KEYS = ("lang", "source", "split", "w1", "w2")


def merge_gram_stats_batch(
    snaps: SnapshotTable, batch_docs: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Merge one micro-batch's histogram into the snapshot table;
    returns False when the batch id was already applied (checkpoint
    replay after a crash) and the merge is skipped. Batch ids are
    monotone only within one checkpoint lineage, so the watermark
    carries the checkpoint identity — a table built under a different
    checkpoint raises instead of silently skipping or double-counting
    (watermark.py)."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    delta = gram_stats_of(with_split(batch_docs))
    if snaps.current_version() is None:
        merged = delta
    else:
        merged = (
            snaps.read()
            .unionByName(delta)
            .groupBy(*KEYS)
            .agg(F.sum("c").alias("c"), F.sum("n_first").alias("n_first"))
        )
    snaps.write(merged, marker=(app_id, batch_id))
    return True


def stream_gram_stats_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the document stream's backlog, folding each micro-batch
    into the stored histogram (availableNow: finite, then stop).
    Returns the snapshot table holding the full version history. The
    checkpoint path doubles as the watermark's app id: the
    (checkpoint, table) pair is the unit of exactly-once."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_docs,
        lambda batch, bid: merge_gram_stats_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps
