"""Streaming ingest-volume drift maintenance: the EWMA/CUSUM alarm
reports kept current as order files land — the ninth streaming-
maintenance member.

The batch side (plans/ml_analytics.py) computes both reports from ONE
sufficient statistic: the per-day (n_orders, rev_cents) aggregate.
That statistic is ADDITIVE on day — any chopping of the order stream
into micro-batches sums to the same relation — so maintenance is a
pure merge: per batch, aggregate the new files to day partials and sum
them into the stored day table. Arrival order cannot matter (addition
commutes), which the reversed-arrival twin test certifies.

Publishing derives the alarm reports from the STORED aggregate with
the SAME closed-form code the batch queries use (`ewma_report`,
`cusum_report` over `gapfill_days`) — the twin equality therefore
certifies the maintenance (the merge), while the batch oracles certify
the derivation. Note the reports are NOT incrementally patched: a new
day shifts kref and every downstream CUSUM value, so deriving from the
day-cardinality aggregate (a few-thousand-row relation regardless of
corpus size) is both the simple and the scale-correct choice.

Storage is a ``SnapshotTable`` (day-cardinality rows per version):
atomic pointer flip, replay skip via the (checkpoint, batch_id)
watermark — an additive merge is not replay-idempotent, so the
watermark is load-bearing (same discipline as frequent_stream).

Scale shape per micro-batch: one scan of the batch's new files
collapsing to day partials, one day-cardinality merge + write. Stored
state grows with the CALENDAR, not the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.ml_analytics import (
    acf_report,
    binseg_report,
    hw_report,
    cusum_report,
    daily_orders_aggregate,
    ewma_report,
    gapfill_days,
    seasonal_report,
)

ORDERS_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def read_orders_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source order stream (schema declared — streaming reads must
    not infer)."""
    reader = spark.readStream.schema(ORDERS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def merge_daily_batch(
    snaps: SnapshotTable, batch_orders: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Sum one micro-batch's day partials into the stored day table;
    returns False on checkpoint replay (already-applied batch id)."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    partial = daily_orders_aggregate(batch_orders)
    if snaps.current_version() is not None:
        partial = snaps.read().unionByName(partial)
    merged = partial.groupBy("day").agg(
        F.sum("n_orders").cast("bigint").alias("n_orders"),
        F.sum("rev_cents").cast("bigint").alias("rev_cents"),
    )
    snaps.write(merged, marker=(app_id, batch_id))
    return True


def stream_drift_to_warehouse(
    stream_orders: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the order stream's backlog, folding each micro-batch into
    the stored day aggregate (availableNow: finite, then stop)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_orders,
        lambda batch, bid: merge_daily_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def published_ewma(snaps: SnapshotTable) -> DataFrame:
    """EWMA report from the stored day aggregate — identical derivation
    to the batch query's, so stream==batch reduces to merge equality."""
    return ewma_report(gapfill_days(snaps.read()))


def published_cusum(snaps: SnapshotTable) -> DataFrame:
    """CUSUM alarm report from the stored day aggregate."""
    return cusum_report(gapfill_days(snaps.read()))


def published_acf(snaps: SnapshotTable) -> DataFrame:
    """ACF (lags 1..14) from the stored day aggregate (VERDICT r7 item
    6): the state EWMA/CUSUM already maintain is the sufficient
    statistic for the whole time-series family, so the autocorrelation
    fingerprint derives from it with the batch query's own code —
    stream==batch reduces to merge equality, certified by the
    reversed-arrival twin test."""
    return acf_report(gapfill_days(snaps.read()))


def published_binseg(snaps: SnapshotTable) -> DataFrame:
    """Binary-segmentation changepoint segments from the maintained day
    aggregate — same maintenance-capable split as published_acf."""
    return binseg_report(gapfill_days(snaps.read()))


def published_holtwinters(snaps: SnapshotTable) -> DataFrame:
    """Holt-Winters weekly forecast from the maintained day aggregate —
    same maintenance-capable split as published_acf."""
    return hw_report(gapfill_days(snaps.read()))


def published_seasonal(snaps: SnapshotTable) -> DataFrame:
    """Weekly seasonal decomposition from the stored day aggregate —
    same maintenance-capable split as published_acf."""
    return seasonal_report(gapfill_days(snaps.read()))
