"""Streaming length-histogram maintenance — exact quantiles from
mergeable state. Third of the sketch-state streams (KMV = distinct,
count-min = frequency, this = ORDER STATISTICS), and the strongest:
the histogram (source, value, n) is an additive monoid like the
count-min grid, but because document lengths live on a bounded
integer domain the state is LOSSLESS — any quantile read from the
maintained state equals the batch order statistic over the whole
drained history EXACTLY, not approximately, in any arrival order.

This is the state that powers cross-source quantile normalization
(plans/corpus_ops.quantile_normalize_doclen builds the same relation
per batch job): maintain it once per landing stream and every
downstream length gate / batch-effect correction reads the current
snapshot instead of re-scanning the corpus.

Per micro-batch: value-count the batch (map-side combined, bounded
by the DISTINCT length domain, not rows), merge cell-wise with the
snapshot, publish through the pointer flip with the applied-upto
watermark. State size = distinct (source, length) pairs — domain-
bounded, corpus-size-free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader

HIST_SCHEMA = "source string, v bigint, n bigint"


def batch_hist(
    docs: DataFrame, value_col: str = "n_chars", key_col: str = "source"
) -> DataFrame:
    """(source, v, n) value histogram for ONE batch."""
    return (
        docs.groupBy(
            F.col(key_col).alias("source"),
            F.col(value_col).cast("long").alias("v"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def merge_hists(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum — exact, commutative, associative."""
    return (
        a.unionByName(b)
        .groupBy("source", "v")
        .agg(F.sum("n").cast("long").alias("n"))
    )


def hist_batch(
    snaps: SnapshotTable,
    batch_docs: DataFrame,
    batch_id: int,
    app_id: str,
) -> bool:
    """Fold one micro-batch into the histogram snapshot. Returns False
    when the batch was already applied (replay skip)."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    h = batch_hist(batch_docs)
    cur = snaps.current_version()
    merged = h if cur is None else merge_hists(snaps.read(cur), h)
    snaps.write(merged.localCheckpoint(), marker=(app_id, batch_id))
    return True


def hist_quantiles(hist: DataFrame, qs: list) -> DataFrame:
    """[source, q_permille, value] EXACT order statistics from the
    histogram state: for each q, the value at rank ceil(q·n) in the
    per-source sorted multiset (the lower/type-1 quantile — a
    SELECTED value, never interpolated, so it equals the batch
    computation bit-for-bit). Window input is the histogram relation
    (domain-bounded), never the corpus."""
    w = Window.partitionBy("source").orderBy("v")
    cum = hist.select(
        "source",
        "v",
        F.sum("n").over(w).alias("r_hi"),
        F.sum("n").over(Window.partitionBy("source")).alias("n_src"),
    )
    spark = hist.sparkSession
    qdf = spark.createDataFrame(
        [(int(q * 1000),) for q in qs], "q_permille int"
    )
    ranked = cum.crossJoin(F.broadcast(qdf)).withColumn(
        "target", F.expr("(q_permille * n_src + 999) div 1000")
    )
    hit = ranked.filter(F.col("r_hi") >= F.col("target"))
    pick = Window.partitionBy("source", "q_permille").orderBy("v")
    return (
        hit.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select("source", "q_permille", F.col("v").alias("value"))
    )


def stream_hist_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    hist_table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the document stream's backlog through the histogram merge
    (availableNow). The (checkpoint, histogram) pair is the
    exactly-once unit."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, hist_table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_docs,
        lambda batch, bid: hist_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps
