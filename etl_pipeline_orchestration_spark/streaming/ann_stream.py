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
``assignments/batch_id=N`` partition (``lineage=L/batch_id=N`` on the
adaptive path, where L counts quantizer retrains; overwrite semantics —
replay idempotent) BEFORE the quantizer snapshot advances the
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


def centroids_to_df(spark, centroids: np.ndarray, lineage: int = 0) -> DataFrame:
    """(cluster_id, dim_idx, val, lineage) relational form of the
    quantizer — the snapshot's DATA, so model versioning rides the same
    atomic-pointer machinery as any table. ``lineage`` counts retrains:
    it names the assignment partition subtree
    (``<assignments>/lineage=L/``) that was computed under THESE
    centroids, making the (quantizer, assignments) pairing resolvable
    from the snapshot pointer alone."""
    rows = [
        (int(c), int(i), float(centroids[c, i]), int(lineage))
        for c in range(centroids.shape[0])
        for i in range(centroids.shape[1])
    ]
    return spark.createDataFrame(
        rows, "cluster_id int, dim_idx int, val double, lineage int"
    )


def centroids_from_snapshot(snaps: SnapshotTable) -> np.ndarray:
    rows = snaps.read().collect()
    k = 1 + max(r["cluster_id"] for r in rows)
    dim = 1 + max(r["dim_idx"] for r in rows)
    m = np.zeros((k, dim))
    for r in rows:
        m[r["cluster_id"], r["dim_idx"]] = r["val"]
    return m


def lineage_from_snapshot(snaps: SnapshotTable) -> int:
    """Retrain-lineage of the CURRENT quantizer (0 for pre-lineage
    snapshots written before the column existed)."""
    df = snaps.read()
    if "lineage" not in df.columns:
        return 0
    return df.select("lineage").first()["lineage"]


def read_assignments(
    loader: WarehouseLoader,
    assignments_table: str,
    quant_snaps: SnapshotTable,
    app_id: str,
) -> DataFrame:
    """Snapshot-consistent assignment read for the ADAPTIVE index:
    resolve the current quantizer's lineage from the snapshot pointer,
    then read only that lineage's partition subtree, watermark-pruned
    to ``batch_id <= applied_upto(app_id)`` — the same contract as
    ``compaction.read_published_partitions``. Because a rebuild stages
    its backfill under ``lineage=L+1`` BEFORE the quantizer pointer
    flips, a reader can never pair assignments with a mismatched
    quantizer version — the flip is the single atomic publish for
    both. The watermark filter closes the remaining crash window: an
    orphaned partition written between the assignment write and the
    snapshot flip sits ABOVE the watermark and is invisible until its
    replay republishes it."""
    from etl_pipeline_orchestration_spark.streaming.compaction import (
        read_published_partitions,
    )

    lineage = lineage_from_snapshot(quant_snaps)
    subtree = os.path.join(loader._path(assignments_table), f"lineage={lineage}")
    return read_published_partitions(
        loader.spark, subtree, ASSIGNMENT_SCHEMA, quant_snaps.applied_upto(app_id)
    )


ASSIGNMENT_SCHEMA = "vec_id bigint, cluster_id int"


def compact_assignments(
    loader: WarehouseLoader,
    assignments_table: str,
    quant_snaps: SnapshotTable,
    app_id: str,
    target_files: int = 1,
) -> int:
    """Fold all PUBLISHED assignment partitions of the CURRENT quantizer
    lineage into one consolidated ``batch_id=watermark`` partition
    (streaming/compaction.py): bounds the file count of a long-running
    index stream. The quantizer snapshot (and its watermark) is not
    touched; superseded lineages are ``prune_stale_lineages``'s job.
    Works for both layouts — the adaptive ``lineage=L`` subtree and the
    flat frozen-quantizer store. Returns partitions folded."""
    from etl_pipeline_orchestration_spark.streaming.compaction import (
        compact_batch_partitions,
    )

    root = loader._path(assignments_table)
    subtree = os.path.join(root, f"lineage={lineage_from_snapshot(quant_snaps)}")
    return compact_batch_partitions(
        loader.spark,
        subtree if os.path.isdir(subtree) else root,
        quant_snaps.applied_upto(app_id),
        ASSIGNMENT_SCHEMA,
        target_files=target_files,
    )


def prune_stale_lineages(
    loader: WarehouseLoader, assignments_table: str, quant_snaps: SnapshotTable
) -> list[int]:
    """GC assignment subtrees of superseded quantizer lineages (they
    stay on disk through the flip so in-flight readers of the old
    lineage finish cleanly; call this once those are drained). Never
    touches the current lineage. Returns pruned lineage numbers.

    Only strict ``lineage=<digits>`` directories are candidates: a
    crashed ``compact_assignments`` leaves ``lineage=N.__compact_tmp``
    / ``.__compact_old`` siblings in the root, which must be healed
    (``recover_compaction`` on the subtree), never int()-parsed."""
    import re
    import shutil

    from etl_pipeline_orchestration_spark.streaming.compaction import (
        recover_compaction,
    )

    current = lineage_from_snapshot(quant_snaps)
    root = loader._path(assignments_table)
    found = []
    for d in os.listdir(root):
        m = re.fullmatch(r"lineage=(\d+)", d)
        if m:
            found.append((int(m.group(1)), os.path.join(root, d)))
    pruned = []
    for lin, subtree in sorted(found):
        # Heal any crashed-compaction siblings (tmp/aside) first so the
        # rmtree below never strands a recoverable window.
        recover_compaction(subtree)
        if lin < current:
            shutil.rmtree(subtree)
            pruned.append(lin)
    return pruned


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
    (re-assigning the archive under the new centroids). Returns
    "skipped" / "appended" / "appended_degraded" / "rebuilt".

    Assignments live under ``<table>/lineage=L/batch_id=N`` where L is
    the quantizer's retrain count. A rebuild STAGES its backfill under
    ``lineage=L+1`` (invisible to readers, who resolve the lineage from
    the quantizer snapshot via ``read_assignments``) and only then
    flips the quantizer pointer carrying the new lineage + watermark —
    one atomic publish pairs centroids with their assignments, so no
    reader or crash window can observe assignments computed under a
    different quantizer than the one it probes. A crash between the
    stage and the flip leaves the watermark unadvanced; replay retrains
    deterministically (seed is batch-derived) and overwrites the same
    staged subtree.

    When drift is detected but ``archive_path`` is None there is
    nothing to backfill from, so the rebuild is REFUSED rather than
    truncating the index to the current batch: the batch is appended
    under the frozen quantizer (pairing stays correct; recall stays
    degraded) and "appended_degraded" is returned so callers can alarm
    and supply an archive.

    Rebuild cost is one archive pass (narrow Arrow matmul) + one
    full-table assignment write — paid only on drift."""
    path = loader._path(assignments_table)
    if batch_id <= quant_snaps.applied_upto(app_id):
        return "skipped"
    if batch_vecs.isEmpty():
        return "skipped"
    spark = batch_vecs.sparkSession

    def append(centroids: np.ndarray, lineage: int, status: str) -> str:
        assigned = ivf_assign(batch_vecs, centroids).select(
            "vec_id", "cluster_id"
        )
        part_dir = os.path.join(
            path, f"lineage={lineage}", f"batch_id={batch_id}"
        )
        assigned.write.mode("overwrite").parquet(part_dir)
        quant_snaps.write(
            centroids_to_df(spark, centroids, lineage=lineage),
            marker=(app_id, batch_id),
        )
        return status

    if quant_snaps.current_version() is None:
        centroids = ivf_train_centroids(
            batch_vecs, k=n_centroids, dim=dim, seed=seed
        )
        return append(centroids, 0, "appended")
    centroids = centroids_from_snapshot(quant_snaps)
    lineage = lineage_from_snapshot(quant_snaps)
    rec = probe_recall(batch_vecs, centroids, k=probe_k, n_probe=n_probe)
    if rec >= recall_floor:
        return append(centroids, lineage, "appended")
    if archive_path is None:
        return append(centroids, lineage, "appended_degraded")
    # Drift: retrain on the drifted data (new lineage — fresh seed per
    # batch so the init is deterministic but not the old one), stage
    # the archive backfill under the new lineage, then flip.
    centroids = ivf_train_centroids(
        batch_vecs, k=n_centroids, dim=dim, seed=seed + 1 + batch_id
    )
    full = spark.read.schema(EMBEDDINGS_SCHEMA).parquet(archive_path)
    assigned = ivf_assign(full, centroids).select("vec_id", "cluster_id")
    staged = os.path.join(
        path, f"lineage={lineage + 1}", f"batch_id={batch_id}"
    )
    assigned.write.mode("overwrite").parquet(staged)
    quant_snaps.write(
        centroids_to_df(spark, centroids, lineage=lineage + 1),
        marker=(app_id, batch_id),
    )
    return "rebuilt"


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
