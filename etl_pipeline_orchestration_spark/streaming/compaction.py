"""Compaction for per-batch streaming index partitions.

The streaming index stores (dedup_stream band index, ann_stream
assignments) append one ``batch_id=N`` partition per micro-batch —
O(batch) publish cost, but a long-running stream accumulates one
directory (and at least one file) per batch: a small-files problem on
a real object store (file-index pressure, starved scan vectorization —
the same hygiene ``loader.compact`` exists for). This module folds all
PUBLISHED partitions (``batch_id <= watermark``) into a single
consolidated ``batch_id=W`` partition while preserving the replay
contract:

* The watermark/manifest snapshot is NOT touched — compaction is a
  maintenance rewrite, not a publish. Readers keep resolving the index
  through ``batch_id <= applied_upto``, and the consolidated partition
  carries the highest published id, so it stays visible to exactly the
  readers that saw its constituents.
* Replay cannot collide: batch ids at or below the watermark are
  skipped by the foreachBatch guard, so no replay ever rewrites a
  partition the compactor consolidated; an orphaned partition ABOVE
  the watermark (crash before its manifest landed) is left untouched
  for its replay to overwrite.
* Crash-safety is rename-aside with a recovery preamble (same
  discipline as ``loader.compact`` / ``streaming/upsert.py``): the
  consolidated data is fully written to a scratch sibling first, the
  constituent partitions are renamed into an aside directory, the
  scratch is renamed into place, and the aside is deleted last. Every
  crash point either leaves the original partitions in place or fully
  recoverable from the aside; ``recover_compaction`` (called by the
  index read paths and by the compactor itself) heals the window.

Single-writer assumption: compaction runs from the stream's own
maintenance context (e.g. between micro-batches), never concurrently
with the foreachBatch writer — the same assumption the per-batch
partition writes already make. On a cluster-grade deployment the
partition stores become transactional tables and this file's job is
the engine's OPTIMIZE/rewrite operation.
"""

from __future__ import annotations

import os
import shutil


def _aside(root: str) -> str:
    return root + ".__compact_old"


def _scratch(root: str) -> str:
    return root + ".__compact_tmp"


def recover_compaction(root: str) -> None:
    """Heal a crashed compaction of ``root`` (idempotent, cheap when
    nothing crashed). Cases:

    * scratch exists, aside absent → crash during/after the scratch
      write, before any partition moved: originals intact; drop scratch.
    * aside exists, scratch exists → crash mid-rename (some originals
      moved aside, consolidated not yet in place): move them back, drop
      scratch.
    * aside exists, scratch absent → crash after the consolidated
      partition landed but before the aside cleanup: the aside holds
      only duplicates of consolidated content; drop it.
    """
    aside, scratch = _aside(root), _scratch(root)
    if os.path.isdir(aside):
        if os.path.isdir(scratch):
            for d in os.listdir(aside):
                dst = os.path.join(root, d)
                if not os.path.exists(dst):
                    os.rename(os.path.join(aside, d), dst)
            shutil.rmtree(scratch)
        shutil.rmtree(aside)
    elif os.path.isdir(scratch):
        shutil.rmtree(scratch)


def compact_batch_partitions(
    spark,
    root: str,
    upto: int,
    schema: str,
    target_files: int = 1,
) -> int:
    """Fold every ``root/batch_id=k`` partition with ``k <= upto`` into
    one consolidated ``batch_id=upto`` partition of ``target_files``
    parquet files. Returns the number of partitions folded (0 = nothing
    to do). ``schema`` is the partition row schema WITHOUT batch_id
    (streaming index reads always declare their schema — no inference).
    """
    if upto < 0 or not os.path.isdir(root):
        return 0
    recover_compaction(root)
    parts = [
        d
        for d in os.listdir(root)
        if d.startswith("batch_id=") and int(d.split("=")[1]) <= upto
    ]
    if len(parts) <= 1:
        return 0
    scratch = _scratch(root)
    union = spark.read.schema(schema).parquet(
        *[os.path.join(root, d) for d in parts]
    )
    union.repartition(target_files).write.mode("overwrite").parquet(scratch)
    aside = _aside(root)
    os.makedirs(aside)
    for d in parts:
        os.rename(os.path.join(root, d), os.path.join(aside, d))
    os.rename(scratch, os.path.join(root, f"batch_id={upto}"))
    shutil.rmtree(aside)
    return len(parts)


def read_published_partitions(spark, root: str, schema: str, upto: int):
    """Watermark-pruned union of a store's ``batch_id=*`` partitions —
    the one read path every per-batch partition store shares
    (dedup_stream band index, semdedup_stream archive/decisions).
    Heals any crashed compaction window first; unpublished (orphaned)
    partitions above ``upto`` are skipped by the partition-column
    filter, never scanned."""
    import os

    from pyspark.sql import functions as F

    if os.path.isdir(root):
        recover_compaction(root)
    if upto < 0 or not os.path.isdir(root):
        return spark.createDataFrame([], schema)
    return (
        spark.read.schema(schema + ", batch_id bigint")
        .option("basePath", root)
        .parquet(root)
        .filter(F.col("batch_id") <= upto)
        .drop("batch_id")
    )
