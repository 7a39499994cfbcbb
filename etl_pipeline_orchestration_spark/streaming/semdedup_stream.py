"""Streaming SemDeDup maintenance over a landing embedding stream.

Fourth member of the streaming-maintenance family (corpus stats,
dedup, ANN, now semantic dedup): as embedding batches land, each new
vector gets a keep/drop decision against the corpus accumulated so
far, without ever re-deciding or rewriting the archive.

The batch operator (plans/llm_data.py:semdedup_prune) splits into a
MODEL — the integer k-means centroids that route vectors to clusters —
and a per-cluster exact-integer cosine mate search
(semdedup_group_dups). This module runs that split continuously:

1. the centroid model is trained ONCE on the first non-empty batch
   (semdedup_fit_centroids — same init/update round as batch) and
   published as a SnapshotTable whose DATA is the centroid matrix in
   relational form, exactly like the IVF stream's frozen quantizer
   (ann_stream.py): assignments only pair correctly with the centroid
   set that produced them, so the model must not drift under the
   archive;
2. each micro-batch assigns its vectors under the frozen model, then
   compares them against the ARCHIVED members of the same clusters
   plus lower-id batch-mates (semdedup_group_dups with ``is_new``:
   archived vectors never drop — earlier arrival wins, the same
   keep-early-evidence trade-off dedup_stream.py documents for its
   mega-bucket guard; batch and stream agree whenever arrival order
   is id order, which the twin test pins);
3. decisions write to a ``decisions/batch_id=N`` partition, the
   batch's quantized vectors append as an ``archive/batch_id=N``
   partition, and the centroid snapshot republish flips the
   applied-upto watermark — the ORDERED dedup-stream discipline:
   a crash after (or during) either partition write replays into the
   same directory with the same content (the frozen model makes
   replayed decisions bit-identical); a crash after the flip skips
   the batch entirely.

Scale shape per micro-batch: one narrow assignment pass over the
batch (model-sized centroids, no join), one cluster-pruned archive
read (only clusters the batch touches — a broadcast semi join on at
most k cluster ids), one RECTANGULAR Arrow matmul per touched
cluster (batch rows × occupancy columns — semdedup_group_dups never
materializes the archived×archived block), one O(batch) decisions
write + one O(batch) archive append + one model-sized snapshot
republish. Per-batch cost is therefore batch·occupancy.

Owned trade-off — the model's k is FROZEN at first-batch scale:
occupancy grows with the archive, so batch·occupancy drifts upward
as the stream accumulates (unlike the batch operator, whose
`_semdedup_k` rescales k per run). Bounding occupancy long-term
requires a maintenance refit that retrains at the archive's scale
and RE-BUCKETS the archived vectors under the new model, staged
under a new lineage so the (centroids, archive) pair flips
atomically — exactly ann_stream.index_batch_adaptive's rebuild
discipline, which is the template when a deployment needs it. Until
then the streamed decisions stay correct (clustering only routes
candidate generation; the cosine test is cluster-independent) —
comparisons just get more expensive, they never get wrong.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.llm_data import (
    _assign_exact,
    _quantize_vecs,
    semdedup_fit_centroids,
    semdedup_group_dups,
)

ARCHIVE_SCHEMA = "vec_id bigint, xq array<bigint>, j int"
DECISION_SCHEMA = "vec_id bigint, cluster_id int, status string, dup_of bigint"


def centroids_to_df(spark, cents: dict) -> DataFrame:
    """(j, i, c) relational form of the integer centroid model — the
    snapshot's DATA, so model versioning rides the same atomic-pointer
    machinery as any table (ann_stream discipline)."""
    rows = [
        (int(j), int(i), int(c))
        for j in sorted(cents)
        for i, c in enumerate(cents[j])
    ]
    return spark.createDataFrame(rows, "j int, i int, c bigint")


def centroids_from_snapshot(snaps: SnapshotTable) -> dict:
    cents: dict = {}
    for r in snaps.read().collect():
        cents.setdefault(r["j"], [0] * 64)[r["i"]] = r["c"]
    return cents


def _read_partitions(
    loader: WarehouseLoader, table: str, schema: str, upto: int
) -> DataFrame:
    from etl_pipeline_orchestration_spark.streaming.compaction import (
        read_published_partitions,
    )

    return read_published_partitions(
        loader.spark, loader._path(table), schema, upto
    )


def read_archive(
    loader: WarehouseLoader,
    archive_table: str,
    cent_snaps: SnapshotTable,
    app_id: str,
) -> DataFrame:
    return _read_partitions(
        loader, archive_table, ARCHIVE_SCHEMA, cent_snaps.applied_upto(app_id)
    )


def read_decisions(
    loader: WarehouseLoader,
    decisions_table: str,
    cent_snaps: SnapshotTable,
    app_id: str,
) -> DataFrame:
    """Every published keep/drop decision (one row per streamed
    vector, exactly once across replays)."""
    return _read_partitions(
        loader,
        decisions_table,
        DECISION_SCHEMA,
        cent_snaps.applied_upto(app_id),
    )


def semdedup_batch(
    loader: WarehouseLoader,
    cent_snaps: SnapshotTable,
    archive_table: str,
    decisions_table: str,
    batch_vecs: DataFrame,
    batch_id: int,
    app_id: str,
) -> bool:
    """Process one micro-batch: decide keep/drop for its vectors
    against the published archive, then grow the archive by one
    partition. Returns False on checkpoint replay or an empty batch
    (skipping leaves the watermark untouched)."""
    if batch_id <= cent_snaps.applied_upto(app_id):
        return False
    if batch_vecs.isEmpty():
        return False
    spark = batch_vecs.sparkSession

    dfq = _quantize_vecs(batch_vecs.select("vec_id", "embedding"))
    if cent_snaps.current_version() is None:
        cents = semdedup_fit_centroids(dfq)
    else:
        cents = centroids_from_snapshot(cent_snaps)
    # Checkpointed: four consumers (touched-clusters broadcast, the
    # pool feeding the mate search, the decisions join, the archive
    # write) would otherwise each re-run the quantize + assignment.
    batch_asg = _assign_exact(dfq, cents).localCheckpoint()

    # Cluster-pruned archive: only clusters the batch touches matter,
    # and there are at most k of them — a broadcast semi join, so the
    # archive scan partition-prunes on batch_id and row-prunes on j.
    touched = batch_asg.select("j").distinct()
    archive = (
        read_archive(loader, archive_table, cent_snaps, app_id)
        .join(F.broadcast(touched), "j", "leftsemi")
    )
    pool = batch_asg.withColumn("is_new", F.lit(True)).unionByName(
        archive.withColumn("is_new", F.lit(False))
    )
    dup = pool.groupBy("j").applyInPandas(
        semdedup_group_dups, "vec_id bigint, dup_of bigint"
    )
    decisions = batch_asg.join(dup, "vec_id", "left").select(
        "vec_id",
        F.col("j").cast("int").alias("cluster_id"),
        F.when(F.col("dup_of").isNull(), F.lit("kept"))
        .otherwise(F.lit("dropped"))
        .alias("status"),
        "dup_of",
    )
    dec_dir = os.path.join(
        loader._path(decisions_table), f"batch_id={batch_id}"
    )
    decisions.write.mode("overwrite").parquet(dec_dir)

    arch_dir = os.path.join(
        loader._path(archive_table), f"batch_id={batch_id}"
    )
    batch_asg.write.mode("overwrite").parquet(arch_dir)
    cent_snaps.write(centroids_to_df(spark, cents), marker=(app_id, batch_id))
    return True


def compact_archive(
    loader: WarehouseLoader,
    archive_table: str,
    cent_snaps: SnapshotTable,
    app_id: str,
    target_files: int = 1,
) -> int:
    """Fold all PUBLISHED archive partitions into one consolidated
    ``batch_id=watermark`` partition (streaming/compaction.py): bounds
    the file count of a long-running semdedup stream. Call between
    micro-batches (the stores are single-writer)."""
    from etl_pipeline_orchestration_spark.streaming.compaction import (
        compact_batch_partitions,
    )

    return compact_batch_partitions(
        loader.spark,
        loader._path(archive_table),
        cent_snaps.applied_upto(app_id),
        ARCHIVE_SCHEMA,
        target_files=target_files,
    )


def stream_semdedup_to_warehouse(
    stream_vecs: DataFrame,
    loader: WarehouseLoader,
    centroids_table: str,
    archive_table: str,
    decisions_table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the embedding stream's backlog through the incremental
    semantic dedup (availableNow: finite, then stop). Returns the
    centroid snapshot table; decisions live under
    ``decisions_table/batch_id=*``. The checkpoint path doubles as the
    watermark's app id: the (checkpoint, archive) pair is the unit of
    exactly-once."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, centroids_table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_vecs,
        lambda batch, bid: semdedup_batch(
            loader,
            snaps,
            archive_table,
            decisions_table,
            batch,
            bid,
            app_id,
        ),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps
