"""Streaming count-min sketch maintenance over a landing document
stream — the frequency twin of the KMV stream (streaming/kmv_stream).

Count-min cells form a commutative monoid under cell-wise sum, so the
streaming state is EXACT with no truncation at all (stronger even than
KMV's bottom-k closure): after any prefix of batches, in any arrival
order, the maintained grid is bit-for-bit the grid a batch job would
compute over those documents — every cell an integer sum. The tests
pin state equality across arrival orders, estimate parity with the
batch sketch, and the never-underestimates law through the stream.

Per micro-batch:
1. token-count the batch and hash per distinct token (the shared
   cross-engine fold, plans/scale_primitives.cm_hashed_counts),
2. fold into the batch's own d×w grid,
3. merge with the snapshot grid (union → sum — grid-cardinality work,
   never a corpus re-scan),
4. publish via the snapshot pointer flip carrying the applied-upto
   watermark (replay-idempotent; foreign checkpoint fails loudly).

State is at most d·w = 4096 int64 cells. The sketch answers "how
often has token X appeared across the whole history" (within the
standard epsilon-overcount bound) without re-reading a byte of it —
the day-1000 maintenance cost equals day 1's.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader

CELLS_SCHEMA = "i int, pos bigint, total bigint"


def batch_cells(docs: DataFrame) -> DataFrame:
    """The d×w grid for ONE batch of documents."""
    from etl_pipeline_orchestration_spark.plans.scale_primitives import (
        cm_cells,
        cm_hashed_counts,
    )

    return cm_cells(cm_hashed_counts(docs))


def merge_cells(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — the exact, order-free count-min merge."""
    return (
        a.unionByName(b)
        .groupBy("i", "pos")
        .agg(F.sum("total").cast("long").alias("total"))
    )


def cms_batch(
    snaps: SnapshotTable,
    batch_docs: DataFrame,
    batch_id: int,
    app_id: str,
) -> bool:
    """Fold one micro-batch into the sketch snapshot. Returns False
    when the batch was already applied (replay skip)."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    cells = batch_cells(batch_docs)
    cur = snaps.current_version()
    merged = cells if cur is None else merge_cells(snaps.read(cur), cells)
    # grid-sized — localCheckpoint so the publish doesn't re-run the
    # batch token pass during the write
    snaps.write(merged.localCheckpoint(), marker=(app_id, batch_id))
    return True


def cms_point_estimates(cells: DataFrame, terms: list) -> DataFrame:
    """[term, cm_est] point queries against a sketch grid: min over
    the d cells each term hashes to. Probe relation is len(terms)·d
    rows (driver-built — the terms list is an explicit user query,
    not data); absent cells mean the term was never inserted
    (estimate 0)."""
    from etl_pipeline_orchestration_spark.plans.scale_primitives import (
        cm_fold,
        cm_positions,
    )

    spark = cells.sparkSession
    probe_rows = [
        (t, i, pos) for t in terms for i, pos in cm_positions(cm_fold(t))
    ]
    probes = spark.createDataFrame(probe_rows, "term string, i int, pos bigint")
    return (
        F.broadcast(probes)
        .join(cells, ["i", "pos"], "left")
        .withColumn("total", F.coalesce("total", F.lit(0)))
        .groupBy("term")
        .agg(F.min("total").cast("long").alias("cm_est"))
    )


def stream_cms_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    sketch_table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the document stream's backlog through the cell merge
    (availableNow). The (checkpoint, sketch) pair is the exactly-once
    unit."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, sketch_table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_docs,
        lambda batch, bid: cms_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps
