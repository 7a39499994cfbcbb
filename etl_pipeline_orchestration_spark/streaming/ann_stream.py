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
model exactly like any other table. When drift degrades recall, the
ADAPTIVE pipeline (index_batch_adaptive) detects it with a per-batch
recall probe vs a brute-force sample, retrains the quantizer as a new
snapshot lineage, and backfills the assignments in the same publish —
the version flip executed, not just promised.

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


def probe_recall(
    batch_vecs: DataFrame,
    centroids: np.ndarray,
    *,
    k: int = 1,
    n_probe: int = 1,
    cap: int = 2048,
    n_queries: int = 16,
) -> float:
    """Per-batch IVF recall probe against a brute-force sample: take a
    deterministic capped sample of the batch, compute each probe
    query's TRUE cosine top-k within the sample, and the top-k the IVF
    index would return (candidates restricted to the ``n_probe``
    nearest clusters under the FROZEN quantizer). Returns mean recall.

    This is the quantity that actually degrades when the data drifts
    onto the stale quantizer's cluster boundaries — true neighbors land
    in unprobed cells. A pure distribution shift that keeps neighbors
    co-assigned does NOT lower it, correctly (IVF recall is unharmed
    there; only balance suffers). Cost: one TakeOrdered collect of
    ≤``cap`` rows + numpy on the (cap × dim) sample — model-sized,
    independent of batch size."""
    rows = (
        batch_vecs.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(cap)
        .collect()
    )
    dim = centroids.shape[1]
    x = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)[:, :dim]
    if len(x) <= k:
        return 1.0
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    cluster_sims = xn @ cn.T
    assign = cluster_sims.argmax(axis=1)
    sims = xn @ xn.T
    np.fill_diagonal(sims, -np.inf)
    hits = total = 0
    for qi in range(min(n_queries, len(x))):
        # Tie-robust recall: a retrieved point counts as a hit when its
        # similarity reaches the k-th TRUE similarity (duplicate/tied
        # vectors are interchangeable neighbors; comparing indices
        # would punish the index for returning an equally-near tie).
        kth_true = np.sort(sims[qi])[::-1][k - 1]
        probes = set(np.argsort(-cluster_sims[qi])[:n_probe].tolist())
        cand = [
            j for j in range(len(x)) if j != qi and int(assign[j]) in probes
        ]
        approx = sorted(cand, key=lambda j: -sims[qi, j])[:k]
        hits += sum(1 for j in approx if sims[qi, j] >= kth_true - 1e-9)
        total += k
    return hits / total if total else 1.0


def _swap_dir(path: str, tmp: str) -> None:
    """Publish ``tmp`` as ``path`` via rename-aside (same crash-window
    discipline as loader.compact: no point loses data; the recovery
    preamble in the caller heals the one between-renames window)."""
    import shutil

    old = path + ".old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)


def index_batch_adaptive(
    loader: WarehouseLoader,
    quant_snaps: SnapshotTable,
    assignments_table: str,
    batch_vecs: DataFrame,
    batch_id: int,
    app_id: str,
    *,
    n_centroids: int = 8,
    dim: int = 64,
    seed: int = 0,
    recall_floor: float = 0.5,
    probe_k: int = 1,
    n_probe: int = 1,
    archive_path: str | None = None,
) -> str:
    """index_batch plus quantizer drift detection: each non-first batch
    is recall-probed against the frozen quantizer; when the probe drops
    below ``recall_floor``, the quantizer is RETRAINED on the drifted
    batch as a new snapshot lineage and the assignments are BACKFILLED
    (re-assigning the archive under the new centroids) — executing the
    version flip the module docstring promises. Returns "skipped" /
    "appended" / "rebuilt".

    Rebuild cost is one archive pass (narrow Arrow matmul) + one
    full-table assignment write — paid only on drift, and exactly what
    correctness requires: assignments are only meaningful relative to
    the quantizer the queries probe, so a quantizer flip MUST carry its
    backfill in the same publish (the watermark advances only after
    both land; a crash mid-rebuild replays it idempotently)."""
    path = loader._path(assignments_table)
    # Recovery: a prior rebuild crashed between its two renames.
    old = path + ".old"
    if not os.path.isdir(path) and os.path.isdir(old):
        os.rename(old, path)
    if batch_id <= quant_snaps.applied_upto(app_id):
        return "skipped"
    if batch_vecs.isEmpty():
        return "skipped"
    spark = batch_vecs.sparkSession
    first = quant_snaps.current_version() is None
    if not first:
        centroids = centroids_from_snapshot(quant_snaps)
        rec = probe_recall(
            batch_vecs, centroids, k=probe_k, n_probe=n_probe
        )
        if rec >= recall_floor:
            assigned = ivf_assign(batch_vecs, centroids).select(
                "vec_id", "cluster_id"
            )
            part_dir = os.path.join(path, f"batch_id={batch_id}")
            assigned.write.mode("overwrite").parquet(part_dir)
            quant_snaps.write(
                centroids_to_df(spark, centroids), marker=(app_id, batch_id)
            )
            return "appended"
        # Drift: retrain on the drifted data (new lineage — fresh seed
        # per batch so the init is deterministic but not the old one).
        centroids = ivf_train_centroids(
            batch_vecs, k=n_centroids, dim=dim, seed=seed + 1 + batch_id
        )
        full = (
            spark.read.schema(EMBEDDINGS_SCHEMA).parquet(archive_path)
            if archive_path is not None
            else batch_vecs
        )
        assigned = ivf_assign(full, centroids).select("vec_id", "cluster_id")
        tmp = path + ".rebuild"
        assigned.write.mode("overwrite").parquet(
            os.path.join(tmp, f"batch_id={batch_id}")
        )
        _swap_dir(path, tmp)
        quant_snaps.write(
            centroids_to_df(spark, centroids), marker=(app_id, batch_id)
        )
        return "rebuilt"
    centroids = ivf_train_centroids(
        batch_vecs, k=n_centroids, dim=dim, seed=seed
    )
    assigned = ivf_assign(batch_vecs, centroids).select("vec_id", "cluster_id")
    part_dir = os.path.join(path, f"batch_id={batch_id}")
    assigned.write.mode("overwrite").parquet(part_dir)
    quant_snaps.write(
        centroids_to_df(spark, centroids), marker=(app_id, batch_id)
    )
    return "appended"


def stream_ivf_index_adaptive(
    stream_vecs: DataFrame,
    loader: WarehouseLoader,
    quantizer_table: str,
    assignments_table: str,
    checkpoint_dir: str,
    *,
    archive_path: str | None = None,
    n_centroids: int = 8,
    dim: int = 64,
    seed: int = 0,
    recall_floor: float = 0.5,
    probe_k: int = 1,
    n_probe: int = 1,
) -> SnapshotTable:
    """Drain the embedding stream through the drift-aware index
    maintenance (availableNow: finite, then stop)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, quantizer_table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_vecs,
        lambda batch, bid: index_batch_adaptive(
            loader,
            snaps,
            assignments_table,
            batch,
            bid,
            app_id,
            n_centroids=n_centroids,
            dim=dim,
            seed=seed,
            recall_floor=recall_floor,
            probe_k=probe_k,
            n_probe=n_probe,
            archive_path=archive_path,
        ),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


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
