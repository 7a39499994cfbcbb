"""Streaming HITS maintenance: hub/authority scores kept current as
lineitem files land — the thirteenth streaming-maintenance member.

The batch side (plans/ml_analytics.py:hits_supplier_part) derives
everything from one relation: the (supplier, part, count) supply edge
aggregate. Lineitem rows are atomic, so edge counts are ADDITIVE
across micro-batches — maintenance merges per-batch edge partials by
summing ``w`` per (s, p), and the publisher re-derives the quantized
HITS iteration from the STORED aggregate with the batch query's own
``hits_ratings`` code. Twin equality certifies the merge; the batch
oracle certifies the derivation (the textrank_stream discipline on a
bipartite item-domain graph).

Storage is a ``SnapshotTable`` bounded by the supplier × part item
domain (never fact-table row count): atomic pointer flip, replay skip
via the (checkpoint, batch_id) watermark (an additive merge is not
replay-idempotent)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.ml_analytics import (
    hits_ratings,
    supply_edge_counts,
)
from etl_pipeline_orchestration_spark.streaming.preference_stream import (
    read_lineitem_stream,
)

__all__ = [
    "read_lineitem_stream",
    "merge_supply_batch",
    "stream_hits_to_warehouse",
    "published_hits",
]


def merge_supply_batch(
    snaps: SnapshotTable, batch_lineitem: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Sum one micro-batch's supply-edge partials into the stored
    aggregate; returns False on checkpoint replay."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    partial = supply_edge_counts(batch_lineitem)
    if snaps.current_version() is not None:
        partial = snaps.read().unionByName(partial)
    merged = partial.groupBy("s", "p").agg(
        F.sum("w").cast("bigint").alias("w")
    )
    snaps.write(merged, marker=(app_id, batch_id))
    return True


def stream_hits_to_warehouse(
    stream_lineitem: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the lineitem stream's backlog, folding each micro-batch
    into the stored supply-edge relation (availableNow)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_lineitem,
        lambda batch, bid: merge_supply_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def published_hits(spark, snaps: SnapshotTable) -> DataFrame:
    """HITS hub/authority table from the maintained supply-edge
    relation — identical derivation to the batch query's."""
    return hits_ratings(snaps.read())
