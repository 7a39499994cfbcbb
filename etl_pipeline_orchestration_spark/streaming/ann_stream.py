"""Streaming maintenance of the IVF similarity index.

Third member of the streaming-maintenance family (corpus stats, dedup,
now ANN): as embedding batches land, the IVF index — (vec_id,
cluster_id) assignments against a FROZEN coarse quantizer — stays
current without ever re-assigning the archive.

Freezing matters: IVF correctness only needs every vector assigned to
its nearest centroid *of the same centroid set the query probes*.
Retraining centroids per batch would silently orphan earlier
assignments (their nearest-centroid relation no longer matches the
quantizer queries use), so the quantizer is trained ONCE on the first
batch (operators/similarity.ivf_train_centroids, hash-sampled,
deterministic seed) and persisted beside the assignments; every later
batch is one Arrow-matmul assignment pass over the batch only. When
drift eventually degrades recall, production rebuilds the quantizer as
a NEW snapshot lineage and backfills — exactly the version flip
SnapshotTable exists for.

Storage and replay discipline are shared with the other two streams:
assignments publish as SnapshotTable versions whose watermark carries
the checkpoint identity (exactly-once per (checkpoint, table) pair;
fresh checkpoint against an existing index fails loudly), and the
centroid matrix rides INSIDE each version directory as a small
underscore-prefixed numpy sidecar — quantizer and assignments are
published by the same atomic pointer flip and can never diverge.

Scale shape per micro-batch: one narrow Arrow-matmul pass over the
batch (model-sized closure), one append write. The archive is never
rescanned; daily cost ∝ batch size.
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

_CENTROIDS = "_centroids.npy"

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


def _load_centroids(snaps: SnapshotTable) -> np.ndarray:
    vdir = snaps._vdir(snaps.current_version())
    return np.load(os.path.join(vdir, _CENTROIDS))


def index_batch(
    snaps: SnapshotTable,
    batch_vecs: DataFrame,
    batch_id: int,
    app_id: str,
    n_centroids: int = 8,
    dim: int = 64,
    seed: int = 0,
) -> bool:
    """Assign one micro-batch against the frozen quantizer and publish
    the grown assignment table. Returns False on checkpoint replay."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    first = snaps.current_version() is None
    if first:
        centroids = ivf_train_centroids(
            batch_vecs, k=n_centroids, dim=dim, seed=seed
        )
    else:
        centroids = _load_centroids(snaps)
    assigned = ivf_assign(batch_vecs, centroids).select("vec_id", "cluster_id")
    grown = assigned if first else snaps.read().unionByName(assigned)
    snaps.write(
        grown,
        marker=(app_id, batch_id),
        # Pre-flip hook: the quantizer publishes in the same atomic
        # pointer flip as the assignments — no crash window where a
        # version is current but its centroid sidecar is missing.
        prepare=lambda vdir: np.save(os.path.join(vdir, _CENTROIDS), centroids),
    )
    return True


def stream_ivf_index_to_warehouse(
    stream_vecs: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
    n_centroids: int = 8,
    dim: int = 64,
) -> SnapshotTable:
    """Drain the embedding stream's backlog into the IVF index
    (availableNow: finite, then stop)."""
    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    q = (
        stream_vecs.writeStream.foreachBatch(
            lambda batch, bid: index_batch(
                snaps, batch, bid, app_id, n_centroids=n_centroids, dim=dim
            )
        )
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return snaps
