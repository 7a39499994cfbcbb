"""Streaming pairwise-preference maintenance: Bradley–Terry ratings
kept current as lineitem files land — the tenth streaming-maintenance
member, and the first whose statistic lives at ORDER grain.

The batch side (plans/ml_analytics.py:bradley_terry_brand_prefs)
derives everything from one relation: the per-(order, brand) exact
quantity aggregate ``ob``. Duel counts are NOT additive across
micro-batches — an order's lines can straddle a batch boundary, and a
duel decided by partial quantities would be wrong — but ``ob`` IS
additive (quantity cents sum), so maintenance merges quantity partials
at order grain and re-derives duels + the MM fit from the STORED
aggregate with the batch query's own code (``bt_ratings``). The twin
equality therefore certifies the merge; the batch oracle certifies the
derivation — the drift_stream discipline applied to a non-calendar
statistic.

Storage is a ``SnapshotTable`` at (order × brands-per-order) grain:
atomic pointer flip, replay skip via the (checkpoint, batch_id)
watermark (an additive merge is not replay-idempotent). At corpus
scale the merge rewrite would be bounded by partition pruning on
order-key ranges (new files touch recent key ranges); the stored
relation is ~brands-per-order rows per order — a constant factor of
the fact table's ORDER count, not its line count.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.ml_analytics import (
    bt_ratings,
    order_brand_quantities,
)

LINEITEM_SCHEMA = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
    " l_quantity double, l_extendedprice double, l_discount double,"
    " l_tax double, l_returnflag string, l_linestatus string,"
    " l_shipdate timestamp"
)


def read_lineitem_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source lineitem stream (schema declared — streaming reads
    must not infer)."""
    reader = spark.readStream.schema(LINEITEM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def merge_duel_state_batch(
    snaps: SnapshotTable,
    batch_lineitem: DataFrame,
    part: DataFrame,
    batch_id: int,
    app_id: str,
) -> bool:
    """Sum one micro-batch's (order, brand) quantity partials into the
    stored aggregate; returns False on checkpoint replay."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    partial = order_brand_quantities(batch_lineitem, part)
    if snaps.current_version() is not None:
        partial = snaps.read().unionByName(partial)
    merged = partial.groupBy("l_orderkey", "brand").agg(
        F.sum("qq").cast("bigint").alias("qq")
    )
    snaps.write(merged, marker=(app_id, batch_id))
    return True


def stream_preferences_to_warehouse(
    stream_lineitem: DataFrame,
    part: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the lineitem stream's backlog, folding each micro-batch
    into the stored (order, brand) aggregate (availableNow)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_lineitem,
        lambda batch, bid: merge_duel_state_batch(
            snaps, batch, part, bid, app_id
        ),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def published_bradley_terry(spark, snaps: SnapshotTable) -> DataFrame:
    """Bradley–Terry rating table from the maintained (order, brand)
    aggregate — identical derivation to the batch query's."""
    return bt_ratings(spark, snaps.read())
