"""Streaming item-item CF maintenance — the seventeenth streaming-
maintenance member: co-purchase recommendations kept current as
lineitem files land.

The maintainable statistic is the BASKET relation — the distinct
(order, part) set (plans/analytics_ext.basket_pairs). Pair counts are
NOT additive across micro-batches (an order's lines can straddle a
batch boundary, and a pair formed by two lines in different batches
would be missed — the preference_stream order-grain hazard), but the
basket SET is: set union == distinct of unions, arrival-order free and
replay-IDEMPOTENT (like retention's activity set, unlike the additive
dtree/target-encode counts). The publisher re-derives item counts,
pair cosines, and the per-item top-3 from the STORED relation with the
batch query's own ``itemitem_topk_of``. Twin equality certifies the
merge under both arrival orders — including a fixture that splits
orders mid-basket; the batch oracle certifies the derivation.

State size = distinct (order, part) pairs — fact-adjacent like
preference_stream's order-grain store; at corpus scale the distinct
rewrite is bounded by partition pruning on order-key ranges (new files
touch recent key ranges)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.analytics_ext import (
    basket_pairs,
    itemitem_topk_of,
)
from etl_pipeline_orchestration_spark.streaming.preference_stream import (
    read_lineitem_stream,
)

__all__ = [
    "read_lineitem_stream",
    "merge_baskets",
    "baskets_batch",
    "stream_baskets_to_warehouse",
    "published_itemitem_topk",
]


def merge_baskets(a: DataFrame, b: DataFrame) -> DataFrame:
    """Distinct union — exact, commutative, associative, idempotent."""
    return a.unionByName(b).distinct()


def baskets_batch(
    snaps: SnapshotTable, batch_li: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Fold one micro-batch's basket partials into the snapshot;
    False on checkpoint replay (idempotent anyway — the skip keeps
    replay cost zero, the retention_stream discipline)."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    part = basket_pairs(batch_li)
    cur = snaps.current_version()
    merged = part if cur is None else merge_baskets(snaps.read(cur), part)
    snaps.write(merged.localCheckpoint(), marker=(app_id, batch_id))
    return True


def stream_baskets_to_warehouse(
    stream_li: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the lineitem stream's backlog through the basket merge
    (availableNow)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_li,
        lambda batch, bid: baskets_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def published_itemitem_topk(spark, snaps: SnapshotTable) -> DataFrame:
    """Top-3 co-purchase recommendations from the maintained basket
    relation — identical derivation to the batch query's."""
    return itemitem_topk_of(snaps.read())
