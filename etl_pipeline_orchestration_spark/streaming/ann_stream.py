"""Streaming maintenance of the IVF similarity index.

Third member of the streaming-maintenance family (corpus stats, dedup,
now ANN): as embedding batches land, the IVF index — a frozen coarse
quantizer plus (vec_id, cluster_id) assignments — stays current
without ever re-assigning or rewriting the archive.

Freezing matters: IVF correctness only needs every vector assigned to
its nearest centroid *of the same centroid set the query probes*.
Retraining centroids per batch would silently orphan earlier
assignments (their nearest-centroid relation no longer matches the
quantizer queries use), so the quantizer is trained ONCE on the first
non-empty batch (operators/similarity.ivf_train_centroids,
hash-sampled, deterministic seed) and published as a SnapshotTable
whose DATA is the centroid matrix in relational form — versioning the
model exactly like any other table. When drift eventually degrades
recall, production rebuilds the quantizer as a new snapshot lineage
and backfills — the version flip SnapshotTable exists for.

Assignments use the dedup-stream storage discipline, NOT a
read-union-rewrite: each batch writes its assignments to an
``assignments/batch_id=N`` partition (overwrite semantics — replay
idempotent) BEFORE the quantizer snapshot advances the
checkpoint-scoped watermark. Per-batch storage cost is therefore
O(batch), never O(index): the full index is the union of partition
directories (on a cluster, a transactional-table partition append).
Crash after the assignment write replays into the same directory with
the same content (the frozen quantizer makes replayed assignments
bit-identical); crash after the watermark advance is skipped entirely.

Scale shape per micro-batch: one narrow Arrow-matmul pass over the
batch (model-sized closure), one O(batch) partition write, one
model-sized quantizer republish. The archive is never rescanned or
rewritten; daily cost ∝ batch size.
"""

from __future__ import annotations

import os

import numpy as np

from pyspark.sql import DataFrame

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.operators.similarity import (
    ivf_assign,
    ivf_train_centroids,
)

EMBEDDINGS_SCHEMA = "vec_id bigint, embedding array<float>"


def read_embeddings_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source embedding stream (schema declared — streaming reads
    must not infer)."""
    reader = spark.readStream.schema(EMBEDDINGS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def centroids_to_df(spark, centroids: np.ndarray) -> DataFrame:
    """(cluster_id, dim_idx, val) relational form of the quantizer —
    the snapshot's DATA, so model versioning rides the same
    atomic-pointer machinery as any table."""
    rows = [
        (int(c), int(i), float(centroids[c, i]))
        for c in range(centroids.shape[0])
        for i in range(centroids.shape[1])
    ]
    return spark.createDataFrame(rows, "cluster_id int, dim_idx int, val double")


def centroids_from_snapshot(snaps: SnapshotTable) -> np.ndarray:
    rows = snaps.read().collect()
    k = 1 + max(r["cluster_id"] for r in rows)
    dim = 1 + max(r["dim_idx"] for r in rows)
    m = np.zeros((k, dim))
    for r in rows:
        m[r["cluster_id"], r["dim_idx"]] = r["val"]
    return m


def index_batch(
    loader: WarehouseLoader,
    quant_snaps: SnapshotTable,
    assignments_table: str,
    batch_vecs: DataFrame,
    batch_id: int,
    app_id: str,
    n_centroids: int = 8,
    dim: int = 64,
    seed: int = 0,
) -> bool:
    """Assign one micro-batch against the frozen quantizer and append
    its assignment partition. Returns False on checkpoint replay or an
    empty batch (empty part files are routine; skipping leaves the
    watermark untouched so nothing is marked applied that wasn't)."""
    if batch_id <= quant_snaps.applied_upto(app_id):
        return False
    if batch_vecs.isEmpty():
        return False
    first = quant_snaps.current_version() is None
    if first:
        centroids = ivf_train_centroids(
            batch_vecs, k=n_centroids, dim=dim, seed=seed
        )
    else:
        centroids = centroids_from_snapshot(quant_snaps)
    assigned = ivf_assign(batch_vecs, centroids).select("vec_id", "cluster_id")
    part_dir = os.path.join(
        loader._path(assignments_table), f"batch_id={batch_id}"
    )
    assigned.write.mode("overwrite").parquet(part_dir)
    # Republishing the (model-sized) quantizer advances the watermark
    # atomically — the publish that marks this batch applied.
    quant_snaps.write(
        centroids_to_df(batch_vecs.sparkSession, centroids),
        marker=(app_id, batch_id),
    )
    return True


def stream_ivf_index_to_warehouse(
    stream_vecs: DataFrame,
    loader: WarehouseLoader,
    quantizer_table: str,
    assignments_table: str,
    checkpoint_dir: str,
    n_centroids: int = 8,
    dim: int = 64,
    seed: int = 0,
) -> SnapshotTable:
    """Drain the embedding stream's backlog into the IVF index
    (availableNow: finite, then stop). Returns the quantizer snapshot
    table; assignments live under ``assignments_table/batch_id=*``."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, quantizer_table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_vecs,
        lambda batch, bid: index_batch(
            loader,
            snaps,
            assignments_table,
            batch,
            bid,
            app_id,
            n_centroids=n_centroids,
            dim=dim,
            seed=seed,
        ),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps
