"""Streaming KMV (bottom-k) sketch maintenance over a landing document
stream — mergeable-sketch state done the snapshot way.

KMV's closure property (bottom-k of a union == bottom-k of the union
of bottom-k's) makes the streaming state EXACT, not approximate-on-top-
of-approximate: maintaining `merge(state, sketch(batch))` per batch
yields, after any prefix of batches, bit-for-bit the sketch a batch
job would compute over those documents — in ANY arrival order. That is
a stronger twin guarantee than the dedup/semdedup streams (whose
outputs are unions of per-batch emissions): here the STATE ITSELF is
order-independent, and the tests pin it.

Per micro-batch:
1. hash the batch's shingles (the word-fold composition from
   plans/corpus_ops.py — chars folded once per word),
2. bottom-k per source over the BATCH only,
3. merge with the current snapshot sketch (union → distinct →
   bottom-k — grid-cardinality work, never a corpus re-scan),
4. publish via the snapshot pointer flip carrying the applied-upto
   watermark (replay-idempotent; foreign checkpoint fails loudly).

State size is k int64s per source — the sketch answers distinct-count
and pairwise-overlap questions (plans/corpus_ops.py:corpus_overlap_kmv)
over the whole history without ever re-reading it. Per-batch cost is
O(batch) hashing + O(k·sources) merge: the 100 TB stream's sketch
costs the same to maintain on day 1000 as day 1.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader

SKETCH_SCHEMA = "source string, h bigint"


def batch_sketch(docs: DataFrame, k: int = 256) -> DataFrame:
    """Bottom-k distinct shingle hashes per source for ONE batch."""
    from etl_pipeline_orchestration_spark.plans.corpus_ops import (
        _kmv_hash_relation,
    )

    rel = _kmv_hash_relation(docs)
    w = Window.partitionBy("source").orderBy("h")
    return (
        rel.select("source", "h", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
        .select("source", "h")
    )


def merge_sketches(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """KMV merge: bottom-k of the distinct union, per source."""
    u = a.unionByName(b).distinct()
    w = Window.partitionBy("source").orderBy("h")
    return (
        u.select("source", "h", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= k)
        .select("source", "h")
    )


def kmv_batch(
    snaps: SnapshotTable,
    batch_docs: DataFrame,
    batch_id: int,
    app_id: str,
    k: int = 256,
) -> bool:
    """Fold one micro-batch into the sketch snapshot. Returns False
    when the batch was already applied (replay skip)."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    sk = batch_sketch(batch_docs, k)
    cur = snaps.current_version()
    merged = sk if cur is None else merge_sketches(snaps.read(cur), sk, k)
    # the sketch is k rows per source — localCheckpoint so the publish
    # doesn't re-run the batch hash pass during the write
    snaps.write(merged.localCheckpoint(), marker=(app_id, batch_id))
    return True


def kmv_estimates(sketch: DataFrame, k: int = 256) -> DataFrame:
    """[source, sketch_size, kth_min, est_distinct] from a sketch."""
    from etl_pipeline_orchestration_spark.plans.corpus_ops import _KMV_M

    agg = sketch.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("sketch_size"),
        F.max("h").cast("bigint").alias("kth_min"),
    )
    est = F.when(
        F.col("sketch_size") < k, F.col("sketch_size").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * _KMV_M / F.col("kth_min").cast("double")
    )
    return agg.select(
        "source", "sketch_size", "kth_min", est.alias("est_distinct")
    )


def stream_kmv_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    sketch_table: str,
    checkpoint_dir: str,
    k: int = 256,
) -> SnapshotTable:
    """Drain the document stream's backlog through the sketch merge
    (availableNow). The (checkpoint, sketch) pair is the exactly-once
    unit."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, sketch_table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_docs,
        lambda batch, bid: kmv_batch(snaps, batch, bid, app_id, k),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps
