"""Streaming maintenance of the corpus-statistics histogram.

The batch side proves the law (plans/corpus_ops.py:
corpus_stats_incremental_merge — f(A ⊎ B) == merge(f(A), f(B)),
cross-engine hash-checked); this module runs the law continuously: as
document files land, each micro-batch's gram-stats histogram
(plans/corpus_stats.gram_stats_of — the SAME tokenize+aggregate plan
as batch, so the runtimes cannot drift) merges additively into a
stored warehouse histogram. The nightly corpus_report then reads a
histogram that is always current, having only ever scanned each
document once.

Exactly-once: an additive merge is NOT replay-idempotent (the upsert
path's sequence-aware merge is; summing a replayed batch double-
counts), so each merged table write embeds an ``_applied_upto`` batch
watermark INSIDE the table directory — the rename swap publishes data
and watermark atomically, and a replayed foreachBatch id ≤ watermark
is skipped. Spark's parquet reader ignores underscore files, so the
marker rides along invisibly.

Scale shape per micro-batch: one scan of the batch's new files, one
map-side-combined aggregate to batch-histogram size, one merge
aggregate in histogram space (vocab²-bounded, never corpus-bounded),
one histogram-sized write. State outside the store is zero — the
histogram IS the state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import WarehouseLoader
from etl_pipeline_orchestration_spark.operators.sampling import with_split
from etl_pipeline_orchestration_spark.plans.corpus_stats import gram_stats_of
from etl_pipeline_orchestration_spark.streaming.watermark import (
    applied_upto,
    write_marker,
)

KEYS = ("lang", "source", "split", "w1", "w2")


def merge_gram_stats_batch(
    loader: WarehouseLoader, table: str, batch_docs: DataFrame, batch_id: int
) -> bool:
    """Merge one micro-batch's histogram into ``table``; returns False
    when the batch id was already applied (checkpoint replay after a
    crash) and the merge is skipped. Batch ids are monotone, so a
    single high-water mark is sufficient."""
    from etl_pipeline_orchestration_spark.streaming.upsert import _recover_swap

    _recover_swap(loader, table)
    path = loader._path(table)
    exists = os.path.isdir(path)
    if exists and batch_id <= applied_upto(path):
        return False

    delta = gram_stats_of(with_split(batch_docs))
    if exists:
        spark = batch_docs.sparkSession
        merged = (
            spark.read.parquet(path)
            .unionByName(delta)
            .groupBy(*KEYS)
            .agg(F.sum("c").alias("c"), F.sum("n_first").alias("n_first"))
        )
    else:
        merged = delta

    tmp = loader._path(f"__upsert_{table}.tmp")
    old = loader._path(f"__upsert_{table}.old")
    merged.write.mode("overwrite").parquet(tmp)
    write_marker(tmp, batch_id)
    if exists:
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, path)
    return True


def stream_gram_stats_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> None:
    """Drain the document stream's backlog, folding each micro-batch
    into the stored histogram (availableNow: finite, then stop)."""
    q = (
        stream_docs.writeStream.foreachBatch(
            lambda batch, bid: merge_gram_stats_batch(loader, table, batch, bid)
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
