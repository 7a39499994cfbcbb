"""Streaming data-governance maintenance — the twentieth streaming-
maintenance member: k-anonymity, l-diversity, AND t-closeness kept
current as customer files land, from ONE maintained state.

The trainable state is the quasi-identifier/sensitive CELL relation
(c_nationkey, c_mktsegment, floor(c_acctbal/500), n). It is an
additive monoid (cell-wise sum, domain-bounded by nations x segments x
balance bands) and a JOINT sufficient statistic for all three audits:

- k-anonymity reads the cells directly (class = all three columns);
- l-diversity groups them as (nation, band) classes with segment as
  the sensitive attribute — the cell IS its input relation;
- t-closeness groups them as (nation, segment) classes with the
  COARSER band floor(acctbal/1000) sensitive — recoverable from the
  maintained band by floor(band/2) (floor-composition identity,
  exact for negative balances too).

One state, three governance surfaces — the same re-derive-at-read
discipline as dtree_stream/gbt_stream, with cell-cardinality cost.
Cell-wise sum is NOT replay-idempotent, so the (checkpoint, batch_id)
applied-upto watermark is load-bearing; the twin test replays a batch
id and pins the state unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader

__all__ = [
    "CUSTOMER_SCHEMA",
    "read_customers_stream",
    "governance_cells",
    "merge_governance_cells",
    "governance_cells_batch",
    "stream_governance_cells_to_warehouse",
    "k_anonymity_from_cells",
    "l_diversity_from_cells",
    "t_closeness_from_cells",
]

CUSTOMER_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int,"
    " c_acctbal double, c_mktsegment string"
)

_KEY = ("c_nationkey", "c_mktsegment", "bal_band")


def read_customers_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source customer stream (schema declared — streaming reads
    must not infer)."""
    reader = spark.readStream.schema(CUSTOMER_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def governance_cells(customers: DataFrame) -> DataFrame:
    """(c_nationkey, c_mktsegment, bal_band, n): the joint governance
    cell relation at the FINER 500-unit band (the coarser 1000-unit
    t-closeness band derives as floor(bal_band / 2))."""
    return (
        customers.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 500).cast("bigint").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def merge_governance_cells(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — exact, commutative, associative; state bounded
    by the quasi-id/band domain regardless of rows drained."""
    return (
        a.unionByName(b)
        .groupBy(*_KEY)
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


def governance_cells_batch(
    snaps: SnapshotTable, batch_customers: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Fold one micro-batch's cells into the snapshot; False on
    checkpoint replay (sum-merge is not idempotent — the skip is
    correctness)."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    part = governance_cells(batch_customers)
    cur = snaps.current_version()
    merged = (
        part if cur is None else merge_governance_cells(snaps.read(cur), part)
    )
    snaps.write(merged.localCheckpoint(), marker=(app_id, batch_id))
    return True


def stream_governance_cells_to_warehouse(
    stream_customers: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the customer stream's backlog through the cell merge
    (availableNow); the (checkpoint, cells) pair is the exactly-once
    unit."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_customers,
        lambda batch, bid: governance_cells_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def k_anonymity_from_cells(cells: DataFrame) -> DataFrame:
    """Classes below k=5 — cells ARE the k-anonymity relation."""
    return cells.select(
        "c_nationkey", "c_mktsegment", "bal_band", "n"
    ).filter(F.col("n") < 5)


def l_diversity_from_cells(cells: DataFrame) -> DataFrame:
    """(nation, band) classes, segment sensitive — identical criterion
    to the batch l_diversity_risk_report."""
    return (
        cells.groupBy("c_nationkey", "bal_band")
        .agg(
            F.sum("n").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_seg"),
            F.expr("cast((1000000 * max(n)) div sum(n) as bigint)").alias(
                "top_seg_share_ppm"
            ),
        )
        .filter(
            (F.col("n_distinct_seg") < 3)
            | (F.col("top_seg_share_ppm") > 800000)
        )
    )


def t_closeness_from_cells(cells: DataFrame) -> DataFrame:
    """(nation, segment) classes, coarse band sensitive — identical
    EMD algebra to the batch t_closeness_risk_report, with the coarse
    band recovered as floor(bal_band / 2)."""
    base = cells.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("bal_band") / 2).cast("bigint").alias("band"),
        "n",
    ).groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.sum("n").cast("bigint").alias("cg")
    )
    gl = base.groupBy("band").agg(F.sum("cg").cast("bigint").alias("c"))
    wg = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    glc = gl.select("band", F.sum("c").over(wg).cast("bigint").alias("ccum"))
    tot = gl.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    classes = base.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cg").cast("bigint").alias("ng")
    )
    dense = (
        classes.crossJoin(F.broadcast(glc))
        .join(base, ["c_nationkey", "c_mktsegment", "band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "ng",
            "band",
            "ccum",
            F.coalesce("cg", F.lit(0)).alias("cg"),
        )
    )
    wc = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = dense.select(
        "c_nationkey",
        "c_mktsegment",
        "ng",
        "ccum",
        F.sum("cg").over(wc).cast("bigint").alias("cgcum"),
    )
    emd = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.first("ng").alias("n_class"),
            F.sum(
                F.abs(
                    F.col("cgcum").cast("decimal(38,0)") * F.col("n")
                    - F.col("ng").cast("decimal(38,0)") * F.col("ccum")
                )
            ).alias("terms"),
            F.first("n").alias("n_tot"),
            F.first("m").alias("m_bands"),
        )
    )
    return emd.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n_class").cast("bigint").alias("n_class"),
        F.expr(
            "cast((1000000 * terms)"
            " div (cast(n_class as decimal(38,0)) * n_tot * (m_bands - 1))"
            " as bigint)"
        ).alias("t_micro"),
    )
