"""Streaming target-encoding maintenance — the sixteenth streaming-
maintenance member, and the feature-store story: the leakage-free
out-of-fold categorical encoding (plans/ml_analytics.target_encode_oof)
kept current as order files land, so a training job reads today's
encodings from a snapshot instead of re-scanning the fact table.

The maintainable grain is the per-customer order count
(``customer_order_counts``): order rows arrive whole, so per-batch
partials SUM exactly (additive monoid, preference_stream's order-grain
discipline one level up — here the grain is the CUSTOMER). Category
and fold are NOT stored: they derive from the customer dimension and
the stable Knuth-hash bucket at publish time, so a dimension change
(a customer re-segmented) can never leave stale encodings behind — the
publisher re-derives cells + complements from the STORED counts with
the batch query's own ``oof_encode_report``. Twin equality certifies
the merge (both arrival orders); the batch oracle certifies the
derivation.

Sum-merge is not replay-idempotent, so the (checkpoint, batch_id)
applied-upto watermark is load-bearing (replay test pins state
unchanged). State size = customers with ≥1 order — dimension-scale,
not fact-scale.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.ml_analytics import (
    customer_order_counts,
    oof_encode_report,
)
from etl_pipeline_orchestration_spark.streaming.drift_stream import (
    read_orders_stream,
)

__all__ = [
    "read_orders_stream",
    "merge_counts",
    "counts_batch",
    "stream_target_counts_to_warehouse",
    "published_oof_encodings",
]


def merge_counts(a: DataFrame, b: DataFrame) -> DataFrame:
    """Customer-keyed sum — exact, commutative, associative."""
    return (
        a.unionByName(b)
        .groupBy("o_custkey")
        .agg(F.sum("y").cast("bigint").alias("y"))
    )


def counts_batch(
    snaps: SnapshotTable, batch_orders: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Fold one micro-batch's per-customer partials into the snapshot;
    False on checkpoint replay (sum-merge is not idempotent)."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    part = customer_order_counts(batch_orders)
    cur = snaps.current_version()
    merged = part if cur is None else merge_counts(snaps.read(cur), part)
    snaps.write(merged.localCheckpoint(), marker=(app_id, batch_id))
    return True


def stream_target_counts_to_warehouse(
    stream_orders: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the order stream's backlog through the count merge
    (availableNow)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_orders,
        lambda batch, bid: counts_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def published_oof_encodings(cust: DataFrame, snaps: SnapshotTable) -> DataFrame:
    """The out-of-fold encoding table from maintained state — identical
    derivation to the batch query's (category and fold re-derived from
    the dimension at read time, never frozen into state)."""
    return oof_encode_report(cust, snaps.read())
