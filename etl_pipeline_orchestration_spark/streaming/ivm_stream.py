"""Incremental view maintenance (IVM) for an aggregate under CDC —
signed-delta (Z-set) maintenance in the DBSP/Materialize style
(Budiu et al. 2023, public method).

The maintained view is ``daily_revenue(day, n_orders, rev_cents)``.
Row-level CDC apply (streaming/upsert.py) must order same-key events
by sequence — last-write-wins depends on it. The AGGREGATE view does
not: every change event becomes signed delta rows

    create  ->  +(1, cents)  at day_new
    delete  ->  -(1, cents)  at day_old
    update  ->  -(old) at day_old  AND  +(new) at day_new

and integer addition is commutative and associative, so applying
each event EXACTLY ONCE — in any batch split, any arrival order —
yields the identical view. The before-image rides in the same event
as the after-image (the Debezium envelope contract), so a retraction
can never be separated from its re-insertion by a batch boundary.
Groups that sum to zero orders are REMOVED (Z-set zero-weight
elimination), so a fully-deleted day disappears instead of lingering
as a (0, 0) row.

Per micro-batch: explode events to signed deltas (narrow), sum into
the day-cardinality view (one map-side-combined shuffle), merge with
the snapshot (view-sized), publish through the pointer flip with the
applied-upto watermark. The view never re-reads the base table — the
whole point at 100 TB: maintenance cost is delta-sized, day 1000
equals day 1.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader

# change events: op in (c,u,d); *_old valid for u/d, *_new for c/u
CHANGES_SCHEMA = (
    "op string, key bigint, day_old date, cents_old bigint,"
    " day_new date, cents_new bigint"
)
VIEW_SCHEMA = "day date, n_orders bigint, rev_cents bigint"


def signed_deltas(changes: DataFrame) -> DataFrame:
    """(day, dn, dcents): one signed row per retraction/insertion.
    Narrow (explode of at most 2 structs per event), no shuffle."""
    minus = F.when(
        F.col("op").isin("u", "d"),
        F.struct(
            F.col("day_old").alias("day"),
            F.lit(-1).cast("long").alias("dn"),
            (-F.col("cents_old")).cast("long").alias("dcents"),
        ),
    )
    plus = F.when(
        F.col("op").isin("c", "u"),
        F.struct(
            F.col("day_new").alias("day"),
            F.lit(1).cast("long").alias("dn"),
            F.col("cents_new").cast("long").alias("dcents"),
        ),
    )
    return (
        changes.select(
            F.explode(
                F.filter(F.array(minus, plus), lambda x: x.isNotNull())
            ).alias("x")
        )
        .select("x.day", "x.dn", "x.dcents")
    )


def apply_deltas(view: DataFrame | None, deltas: DataFrame) -> DataFrame:
    """Merge signed deltas into the view; zero-weight groups vanish."""
    d = (
        deltas.groupBy("day")
        .agg(
            F.sum("dn").cast("long").alias("n_orders"),
            F.sum("dcents").cast("long").alias("rev_cents"),
        )
    )
    merged = d if view is None else (
        view.unionByName(d)
        .groupBy("day")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("rev_cents").cast("long").alias("rev_cents"),
        )
    )
    return merged.filter(F.col("n_orders") != 0)


def ivm_batch(
    snaps: SnapshotTable,
    batch_changes: DataFrame,
    batch_id: int,
    app_id: str,
) -> bool:
    """Fold one micro-batch of change events into the view snapshot.
    Returns False when the batch was already applied (replay skip)."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    cur = snaps.current_version()
    view = None if cur is None else snaps.read(cur)
    merged = apply_deltas(view, signed_deltas(batch_changes))
    snaps.write(merged.localCheckpoint(), marker=(app_id, batch_id))
    return True


def view_of_table(orders_like: DataFrame) -> DataFrame:
    """The view recomputed from scratch — the twin-test ground truth
    (and the bootstrap for backfilling a new view)."""
    return (
        orders_like.groupBy(F.col("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("rev_cents"),
        )
    )


def stream_ivm_to_warehouse(
    stream_changes: DataFrame,
    loader: WarehouseLoader,
    view_table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the change stream's backlog through the delta merge
    (availableNow). The (checkpoint, view) pair is the exactly-once
    unit."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, view_table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_changes,
        lambda batch, bid: ivm_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps
