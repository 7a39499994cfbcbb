"""Streaming gradient-boosted-stump maintenance — the nineteenth
streaming-maintenance member: the boosted regression model kept current
as order files land, without ever re-scanning the corpus.

The trainable state is the per-feature-cell (count, target-sum) pair
(plans/ml_analytics.order_gbt_cells): squared-loss stumps split on
features only, so the boosted model's prediction — and therefore the
residual — is constant within a cell, and every round's histogram is a
pure projection of (n, sy). The cell relation is thus a sufficient
statistic for the WHOLE stump sequence, any number of rounds, and an
additive monoid (cell-wise sum of n and sy) exactly like
dtree_stream's contingency table — maintenance is exact and
arrival-order-free: streamed cells == batch cells bit-for-bit, and the
published stumps equal a from-scratch training run on the drained
history (twin-tested both arrival orders in tests/test_gbt_stream.py).

Cell-wise sum is NOT replay-idempotent, so the (checkpoint, batch_id)
applied-upto watermark is load-bearing: a replayed micro-batch must be
skipped or counts AND sums double. The twin test replays a batch id
and pins the state unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.ml_analytics import (
    gbt_stumps_from_cells,
    order_gbt_cells,
)
from etl_pipeline_orchestration_spark.streaming.drift_stream import (
    read_orders_stream,
)

__all__ = [
    "read_orders_stream",
    "merge_gbt_cells",
    "gbt_cells_batch",
    "stream_gbt_cells_to_warehouse",
    "published_gbt_stumps",
]

_KEY = ("f_band", "f_month", "f_prio", "f_year")


def merge_gbt_cells(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of (n, sy) — exact, commutative, associative;
    state stays bounded by the feature-domain product (≤ 3,360 cells)
    regardless of rows drained."""
    return (
        a.unionByName(b)
        .groupBy(*_KEY)
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sy").cast("bigint").alias("sy"),
        )
    )


def gbt_cells_batch(
    snaps: SnapshotTable, batch_orders: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Fold one micro-batch's cells into the snapshot. Returns False on
    checkpoint replay — sum-merge is not idempotent, so the skip is
    correctness, not an optimization."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    part = order_gbt_cells(batch_orders)
    cur = snaps.current_version()
    merged = part if cur is None else merge_gbt_cells(snaps.read(cur), part)
    snaps.write(merged.localCheckpoint(), marker=(app_id, batch_id))
    return True


def stream_gbt_cells_to_warehouse(
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
        lambda batch, bid: gbt_cells_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def published_gbt_stumps(spark, snaps: SnapshotTable) -> DataFrame:
    """The boosted stump sequence trained from the maintained cell
    relation — identical criterion and tie-breaks to the batch path;
    every round runs at cell cardinality."""
    return gbt_stumps_from_cells(snaps.read())
