"""Streaming decision-tree maintenance — the fifteenth streaming-
maintenance member: a depth-2 histogram tree kept current as order
files land, without ever re-scanning the corpus.

The trainable state is the joint feature-label CONTINGENCY TABLE
(plans/ml_analytics.order_feature_cells): because histogram split
finding consumes only per-(node, feature, bin) class counts, and the
features are small-domain integer bins, the cell relation is a
sufficient statistic for the WHOLE tree — any depth, any round — and
it is an additive monoid (cell-wise sum) like the length histogram
(hist_stream) and the count-min grid. Maintenance is therefore exact
and arrival-order-free: streamed cells == batch cells bit-for-bit, and
the published splits equal a from-scratch batch training run on the
drained history (twin-tested both arrival orders).

Contrast with retention/preference (non-mergeable statistics whose
publishers re-derive from stored relations): here even the DERIVED
model is cheap — split finding runs at cell cardinality (≤ 6,720
rows), so the publisher re-trains per read rather than caching a
model that a late-arriving file could invalidate.

Cell-wise sum is NOT replay-idempotent (unlike retention's
distinct-union), so the (checkpoint, batch_id) applied-upto watermark
is load-bearing: a replayed micro-batch must be skipped or every
count double-counts. The twin test replays a batch id and pins the
state unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.ml_analytics import (
    dtree_splits_from_cells,
    order_feature_cells,
)
from etl_pipeline_orchestration_spark.streaming.drift_stream import (
    read_orders_stream,
)

__all__ = [
    "read_orders_stream",
    "merge_cells",
    "cells_batch",
    "stream_tree_cells_to_warehouse",
    "published_tree_splits",
]

_KEY = ("f_band", "f_month", "f_prio", "f_year", "y")


def merge_cells(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — exact, commutative, associative; state stays
    bounded by the feature-domain product regardless of rows drained."""
    return (
        a.unionByName(b)
        .groupBy(*_KEY)
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


def cells_batch(
    snaps: SnapshotTable, batch_orders: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Fold one micro-batch's cells into the snapshot. Returns False on
    checkpoint replay — sum-merge is not idempotent, so the skip is
    correctness, not an optimization."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    part = order_feature_cells(batch_orders)
    cur = snaps.current_version()
    merged = part if cur is None else merge_cells(snaps.read(cur), part)
    snaps.write(merged.localCheckpoint(), marker=(app_id, batch_id))
    return True


def stream_tree_cells_to_warehouse(
    stream_orders: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the order stream's backlog through the cell merge
    (availableNow); the (checkpoint, cells) pair is the exactly-once
    unit."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_orders,
        lambda batch, bid: cells_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def published_tree_splits(spark, snaps: SnapshotTable) -> DataFrame:
    """Depth-2 splits trained from the maintained cell relation —
    identical criterion and tie-breaks to the batch path; every pass
    runs at cell cardinality."""
    return dtree_splits_from_cells(snaps.read())
