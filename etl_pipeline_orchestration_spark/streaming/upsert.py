"""Streaming → warehouse upsert: the incremental-materialization path.

Composes the streaming runtime with a sequence-aware CDC merge: each
micro-batch is treated as an upsert feed (latest row per key BY SEQUENCE
wins) and merged into a warehouse parquet table.
The result is a continuously-maintained table whose contents always
equal the batch recomputation over all data seen so far — verified by
tests/test_streaming_upsert.py.

Scale shape: per micro-batch, one dedup-by-key aggregate over the batch
(small) plus one full-outer merge join against the target on the upsert
key. foreachBatch checkpointing gives exactly-once per batch id; the
scratch-write-and-swap avoids Spark's cannot-overwrite-input rule the
same way loader.compact does. On a real cluster the swap target is a
transactional table format; the merge plan is identical.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import WarehouseLoader


def upsert_batch(
    loader: WarehouseLoader, table: str, key: str, batch: DataFrame, seq_col: str
) -> None:
    """Merge one batch into ``table``: keep the latest row per key
    (max ``seq_col``) within the batch, then merge SEQUENCE-AWARE — a
    change only replaces the stored row when its ``seq_col`` is newer.
    Micro-batch boundaries don't respect event order (a later file can
    carry older events), so a plain last-write-wins merge would let
    stale rows clobber fresh ones; conditioning on the sequence makes
    the merged table independent of batch arrival order."""
    _recover_swap(loader, table)
    w = W.partitionBy(key).orderBy(F.col(seq_col).desc())
    latest = (
        batch.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    spark = batch.sparkSession
    path = loader._path(table)
    if os.path.isdir(path):
        payload = [c for c in latest.columns if c != key]
        t = spark.read.parquet(path).alias("t")
        c = latest.alias("c")
        newer = F.col(f"c.{key}").isNotNull() & (
            F.col(f"t.{key}").isNull()
            | (F.col(f"c.{seq_col}") >= F.col(f"t.{seq_col}"))
        )
        merged = t.join(c, F.col(f"t.{key}") == F.col(f"c.{key}"), "full_outer").select(
            F.coalesce(F.col(f"t.{key}"), F.col(f"c.{key}")).alias(key),
            *[
                F.when(newer, F.col(f"c.{col}"))
                .otherwise(F.col(f"t.{col}"))
                .alias(col)
                for col in payload
            ],
        )
        tmp = loader._path(f"__upsert_{table}.tmp")
        old = loader._path(f"__upsert_{table}.old")
        merged.write.mode("overwrite").parquet(tmp)
        # Swap via rename-aside so the table directory is never absent
        # for longer than one rename: a crash window that still holds
        # the full history (recovered by _recover_swap on replay). The
        # previous rmtree-then-rename left a window where a crash lost
        # the table and foreachBatch replay silently rebuilt it from
        # the current batch alone.
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    else:
        latest.write.mode("overwrite").parquet(path)


def _recover_swap(loader: WarehouseLoader, table: str) -> None:
    """Heal an interrupted swap before merging: if a crash happened
    between the two renames, the table directory is missing but the
    rename-aside copy holds the full pre-merge history — restore it
    (the checkpointed batch then replays against it). A leftover .old
    beside an intact table means the crash hit before cleanup — drop it."""
    path = loader._path(table)
    old = loader._path(f"__upsert_{table}.old")
    if os.path.isdir(old):
        if os.path.isdir(path):
            shutil.rmtree(old)
        else:
            os.rename(old, path)


def stream_upsert_to_warehouse(
    stream: DataFrame,
    loader: WarehouseLoader,
    table: str,
    key: str,
    seq_col: str,
    checkpoint_dir: str,
) -> None:
    """Drain the stream's backlog, upserting each micro-batch into the
    warehouse table (availableNow: finite, then stop)."""
    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _id: upsert_batch(loader, table, key, batch, seq_col)
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
