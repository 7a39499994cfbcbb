"""Streaming retention-cohort maintenance: the cohort matrix kept
current as order files land — the twelfth streaming-maintenance
member.

The batch side (plans/analytics_ext.py:retention_cohort_matrix)
derives everything from one relation: the DISTINCT
``(o_custkey, m)`` customer active-month set. The COHORT ASSIGNMENT
is not mergeable — a late-arriving earlier order re-cohorts the
customer and silently invalidates any previously counted (cohort,
month) cell — but the activity SET is (set union == distinct of
unions, order-free), so maintenance merges per-batch month partials
by distinct-union and the publisher re-derives cohorts, sizes, and
retention from the STORED relation with the batch query's own
``retention_matrix_of`` code. Twin equality certifies the merge (both
arrival orders); the batch oracle certifies the derivation — the
preference_stream discipline applied to a min-sensitive statistic.

Storage is a ``SnapshotTable`` bounded by customers x active months
(never order count): atomic pointer flip, replay skip via the
(checkpoint, batch_id) watermark (distinct-union IS replay-idempotent,
but the skip keeps the merge cost zero on replay)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.analytics_ext import (
    customer_month_activity,
    retention_matrix_of,
)
from etl_pipeline_orchestration_spark.streaming.drift_stream import (
    read_orders_stream,
)

__all__ = [
    "read_orders_stream",
    "merge_activity_batch",
    "stream_retention_to_warehouse",
    "published_retention",
]


def merge_activity_batch(
    snaps: SnapshotTable, batch_orders: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Distinct-union one micro-batch's (custkey, month) partials into
    the stored activity set; returns False on checkpoint replay."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    partial = customer_month_activity(batch_orders)
    if snaps.current_version() is not None:
        partial = snaps.read().unionByName(partial)
    snaps.write(partial.distinct(), marker=(app_id, batch_id))
    return True


def stream_retention_to_warehouse(
    stream_orders: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the order stream's backlog, folding each micro-batch into
    the stored activity relation (availableNow)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_orders,
        lambda batch, bid: merge_activity_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def published_retention(spark, snaps: SnapshotTable) -> DataFrame:
    """Retention cohort matrix from the maintained activity relation —
    identical derivation to the batch query's."""
    return retention_matrix_of(snaps.read())
