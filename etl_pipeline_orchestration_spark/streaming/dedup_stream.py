"""Streaming near-duplicate detection over a landing document stream.

The batch side already splits dedup into a persistable LSH band INDEX
(operators/dedup.py:lsh_band_table) and an incremental candidate join
(minhash_incremental_candidates: new×history through the index plus
new×new, never re-signaturing the archive). This module runs that
split continuously: each micro-batch of landed documents

1. emits the candidate pairs it completes — (batch × stored-index) ∪
   (batch × batch) — into a per-batch output partition, then
2. folds its own band rows into the stored index (rename swap with the
   applied-upto watermark, streaming/watermark.py).

Replay safety is ORDERED, not just marked: candidates write BEFORE the
index swap, into a ``batch_id=N`` directory with overwrite semantics.
A crash after (1) replays into the same directory with the same
content (the index has not advanced, so the join sees the same
history); a crash after (2) is skipped entirely by the watermark. In
both cases the union over partition directories equals exactly one
emission per pair.

Scale shape per micro-batch: signature + banding over the BATCH only
(the archive is touched through its index join, cost ∝ matching band
buckets), one histogram-of-bands shuffle, one index append rewrite.
Daily cost scales with the batch, not the corpus — the property that
makes streaming dedup viable against a 100 TB archive (on a cluster
the index rewrite becomes a partition-append on a transactional
table; the join plan is identical).

The sum of per-batch emissions equals the full-corpus batch candidate
set (pair-for-pair, including n_bands_matched, which is pair-intrinsic)
— pinned by the stream==batch twin test."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import WarehouseLoader
from etl_pipeline_orchestration_spark.operators.dedup import (
    lsh_band_table,
    minhash_incremental_candidates,
)
from etl_pipeline_orchestration_spark.streaming.watermark import (
    applied_upto,
    write_marker,
)

INDEX_SCHEMA_COLS = ("doc_id", "band_id", "band_hash")


def dedup_batch(
    loader: WarehouseLoader,
    index_table: str,
    candidates_table: str,
    batch_docs: DataFrame,
    batch_id: int,
) -> bool:
    """Process one micro-batch: emit its candidate pairs, then grow the
    index. Returns False when the batch was already fully applied."""
    from etl_pipeline_orchestration_spark.streaming.upsert import _recover_swap

    _recover_swap(loader, index_table)
    index_path = loader._path(index_table)
    have_index = os.path.isdir(index_path)
    if have_index and batch_id <= applied_upto(index_path):
        return False

    spark = batch_docs.sparkSession
    if have_index:
        index = spark.read.parquet(index_path)
    else:
        index = spark.createDataFrame(
            [], "doc_id bigint, band_id int, band_hash bigint"
        )
    cands = minhash_incremental_candidates(batch_docs, index)
    cand_dir = os.path.join(
        loader._path(candidates_table), f"batch_id={batch_id}"
    )
    cands.write.mode("overwrite").parquet(cand_dir)

    new_bands = lsh_band_table(batch_docs)
    grown = index.unionByName(new_bands) if have_index else new_bands
    tmp = loader._path(f"__upsert_{index_table}.tmp")
    old = loader._path(f"__upsert_{index_table}.old")
    grown.write.mode("overwrite").parquet(tmp)
    write_marker(tmp, batch_id)
    if have_index:
        os.rename(index_path, old)
        os.rename(tmp, index_path)
        shutil.rmtree(old)
    else:
        os.rename(tmp, index_path)
    return True


def stream_dedup_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    index_table: str,
    candidates_table: str,
    checkpoint_dir: str,
) -> None:
    """Drain the document stream's backlog through the incremental
    dedup (availableNow: finite, then stop)."""
    q = (
        stream_docs.writeStream.foreachBatch(
            lambda batch, bid: dedup_batch(
                loader, index_table, candidates_table, batch, bid
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
