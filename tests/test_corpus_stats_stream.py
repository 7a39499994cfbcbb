"""Streaming corpus-statistics maintenance: stream==batch twin plus the
replay-idempotence guard that makes the additive merge exactly-once."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import WarehouseLoader
from etl_pipeline_orchestration_spark.operators.sampling import with_split
from etl_pipeline_orchestration_spark.plans.corpus_stats import gram_stats_of
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.corpus_stats_stream import (
    KEYS,
    merge_gram_stats_batch,
    stream_gram_stats_to_warehouse,
)
from etl_pipeline_orchestration_spark.streaming.curation import (
    read_documents_stream,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_docs"))
    load_table(spark, SF, "documents").repartition(4).write.mode(
        "overwrite"
    ).parquet(d)
    return d


def _hist_dict(df):
    return {
        tuple(r[k] for k in KEYS): (r["c"], r["n_first"])
        for r in df.collect()
    }


def test_streamed_histogram_equals_batch_recompute(spark, docs_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_documents_stream(spark, docs_dir, max_files_per_trigger=1)
    snaps = stream_gram_stats_to_warehouse(
        stream, loader, "gram_stats", str(tmp_path / "ckpt")
    )
    expected = gram_stats_of(with_split(spark.read.parquet(docs_dir)))
    assert _hist_dict(snaps.read()) == _hist_dict(expected)
    # One snapshot per micro-batch, and the history is monotone: every
    # earlier version holds a strictly smaller total token count —
    # corpus-stats time travel over corpus growth.
    versions = snaps.versions()
    assert len(versions) == 4  # 4 input files, maxFilesPerTrigger=1
    totals = [
        snaps.read(version=v).agg(F.sum("c")).head()[0] for v in versions
    ]
    assert totals == sorted(totals) and len(set(totals)) == len(totals)


def test_replayed_batch_id_is_skipped(spark, tmp_path):
    """foreachBatch replays a batch id after a crash; summing it twice
    would double-count, so the applied-upto watermark must skip it."""
    from etl_pipeline_orchestration_spark.loader import SnapshotTable

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "g")
    docs = load_table(spark, SF, "documents").limit(50)
    assert merge_gram_stats_batch(snaps, docs, 0, "ckptA") is True
    once = _hist_dict(snaps.read())
    assert merge_gram_stats_batch(snaps, docs, 0, "ckptA") is False
    assert _hist_dict(snaps.read()) == once
    # a NEW batch id does merge (counts double for the same docs)
    assert merge_gram_stats_batch(snaps, docs, 1, "ckptA") is True
    assert _hist_dict(snaps.read()) == {
        k: (c * 2, n * 2) for k, (c, n) in once.items()
    }
    # A DIFFERENT checkpoint's batch ids are not comparable: restarting
    # with a fresh checkpoint re-reads the source, so neither skipping
    # (silent drop) nor merging (double count) is safe — loud failure.
    with pytest.raises(ValueError, match="checkpoint"):
        merge_gram_stats_batch(snaps, docs, 0, "ckptB")
    # A maintenance write without a marker carries the watermark
    # forward instead of resetting replay protection.
    snaps.write(snaps.read().limit(5))
    assert snaps.applied_upto("ckptA") == 1


def test_streamed_dedup_candidates_equal_batch_lsh(spark, docs_dir, tmp_path):
    """Streaming near-dup: the union of per-batch candidate emissions
    must equal the full-corpus batch LSH candidate set pair-for-pair
    (n_bands_matched included — it is pair-intrinsic)."""
    from etl_pipeline_orchestration_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from etl_pipeline_orchestration_spark.streaming.dedup_stream import (
        stream_dedup_to_warehouse,
    )

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_documents_stream(spark, docs_dir, max_files_per_trigger=1)
    snaps = stream_dedup_to_warehouse(
        stream, loader, "lsh_index", "lsh_candidates", str(tmp_path / "ckpt")
    )
    # the published index covers the full corpus (one version per batch)
    assert len(snaps.versions()) == 4
    got = {
        (r["id_a"], r["id_b"]): r["n_bands_matched"]
        for r in spark.read.parquet(loader._path("lsh_candidates")).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): r["n_bands_matched"]
        for r in minhash_lsh_candidates(spark.read.parquet(docs_dir)).collect()
    }
    assert got == want and len(want) > 0


def test_dedup_replayed_batch_is_skipped(spark, tmp_path):
    from etl_pipeline_orchestration_spark.loader import SnapshotTable
    from etl_pipeline_orchestration_spark.streaming.dedup_stream import (
        dedup_batch,
        read_band_index,
    )

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "idx")
    docs = load_table(spark, SF, "documents").limit(40)
    assert dedup_batch(loader, snaps, "cand", docs, 0, "ck", index_table="idx") is True
    n_idx = read_band_index(loader, "idx", snaps, "ck").count()
    assert n_idx > 0
    assert dedup_batch(loader, snaps, "cand", docs, 0, "ck", index_table="idx") is False
    assert read_band_index(loader, "idx", snaps, "ck").count() == n_idx
    with pytest.raises(ValueError, match="checkpoint"):
        dedup_batch(loader, snaps, "cand", docs, 0, "other-ck", index_table="idx")


def test_dedup_index_write_is_per_batch_partition(spark, tmp_path):
    """The O(batch) claim, pinned: each micro-batch writes only its own
    band partition — batch 1's publish must not rewrite batch 0's files,
    and an UNpublished (orphaned) band partition is invisible to the
    index reader until its manifest lands."""
    import os

    from etl_pipeline_orchestration_spark.loader import SnapshotTable
    from etl_pipeline_orchestration_spark.streaming.dedup_stream import (
        dedup_batch,
        read_band_index,
    )

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "idx")
    docs = load_table(spark, SF, "documents")
    dedup_batch(loader, snaps, "cand", docs.limit(30), 0, "ck", index_table="idx")
    p0 = os.path.join(loader._path("idx"), "batch_id=0")
    mtimes_before = {
        f: os.path.getmtime(os.path.join(p0, f)) for f in os.listdir(p0)
    }
    dedup_batch(loader, snaps, "cand", docs.limit(60), 1, "ck", index_table="idx")
    mtimes_after = {
        f: os.path.getmtime(os.path.join(p0, f)) for f in os.listdir(p0)
    }
    assert mtimes_after == mtimes_before  # batch 0 partition untouched
    # Orphan partition (crash between band write and manifest publish):
    # reader pinned to the watermark must not see it.
    n_published = read_band_index(loader, "idx", snaps, "ck").count()
    orphan = spark.createDataFrame(
        [(999, 0, 123)], "doc_id bigint, band_id int, band_hash bigint"
    )
    orphan.write.mode("overwrite").parquet(
        os.path.join(loader._path("idx"), "batch_id=7")
    )
    assert read_band_index(loader, "idx", snaps, "ck").count() == n_published


@pytest.fixture(scope="module")
def vecs_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_vecs"))
    load_table(spark, SF, "embeddings").select(
        "vec_id", "embedding"
    ).repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_streamed_ivf_index_equals_batch_assignment(spark, vecs_dir, tmp_path):
    """Streaming ANN: per-batch assignment partitions accumulated
    against the FROZEN first-batch quantizer must union to a one-shot
    batch assignment of the whole corpus under the same centroids, and
    the published quantizer must be identical in every version."""
    import numpy as np

    from etl_pipeline_orchestration_spark.operators.similarity import ivf_assign
    from etl_pipeline_orchestration_spark.streaming.ann_stream import (
        centroids_from_snapshot,
        read_embeddings_stream,
        stream_ivf_index_to_warehouse,
    )

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_embeddings_stream(spark, vecs_dir, max_files_per_trigger=1)
    snaps = stream_ivf_index_to_warehouse(
        stream, loader, "ivf_quantizer", "ivf_assignments",
        str(tmp_path / "ckpt"),
    )
    versions = snaps.versions()
    assert len(versions) == 4
    c0 = centroids_from_snapshot(snaps)
    first = {
        (r["cluster_id"], r["dim_idx"]): r["val"]
        for r in snaps.read(version=versions[0]).collect()
    }
    assert first == {
        (r["cluster_id"], r["dim_idx"]): r["val"]
        for r in snaps.read().collect()
    }  # quantizer is frozen across the run
    got = {
        r["vec_id"]: r["cluster_id"]
        for r in spark.read.parquet(
            loader._path("ivf_assignments")
        ).collect()
    }
    want = {
        r["vec_id"]: r["cluster_id"]
        for r in ivf_assign(spark.read.parquet(vecs_dir), np.asarray(c0)).collect()
    }
    assert got == want and len(want) == 500


def _drift_fixture(spark, base_dir):
    """Two embedding files: file A = two tight blobs on e1/e2 (the
    regime the quantizer trains on); file B = DRIFTED pairs straddling
    the stale cluster boundary — each pair shares a far-apart base
    direction in the (e3, e4) plane with a tiny e1- or e2-offset, so a
    pair's two points are each other's true nearest neighbors but the
    old quantizer assigns them to DIFFERENT clusters (offset decides
    the argmax) → n_probe=1 recall collapses; a retrained quantizer
    keeps pairs co-assigned → recall recovers."""
    import math
    import os

    a_rows = []
    for i in range(40):
        jit = (i % 7) * 0.01
        a_rows.append((i, [10.0, jit, 0.0, 0.0]))
        a_rows.append((100 + i, [jit, 10.0, 0.0, 0.0]))
    b_rows = []
    for i in range(8):
        th = 2 * math.pi * i / 8
        base = [0.0, 0.0, 10.0 * math.cos(th), 10.0 * math.sin(th)]
        b_rows.append((1000 + 2 * i, [base[0] + 1.0, base[1], base[2], base[3]]))
        b_rows.append((1001 + 2 * i, [base[0], base[1] + 1.0, base[2], base[3]]))
    schema = "vec_id bigint, embedding array<float>"
    os.makedirs(base_dir, exist_ok=True)
    spark.createDataFrame(a_rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(base_dir, "f=0"))
    spark.createDataFrame(b_rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(base_dir, "f=1"))
    return base_dir


def test_drifted_stream_triggers_quantizer_rebuild(spark, tmp_path):
    """The drift contract end-to-end: batch 0 trains, batch 1 (drifted)
    probes below the floor → NEW quantizer lineage + full backfill, and
    the probe recall under the rebuilt quantizer recovers."""
    import numpy as np

    from etl_pipeline_orchestration_spark.loader import SnapshotTable
    from etl_pipeline_orchestration_spark.streaming.ann_stream import (
        centroids_from_snapshot,
        index_batch_adaptive,
        probe_recall,
    )

    d = _drift_fixture(spark, str(tmp_path / "vecs"))
    f0 = spark.read.parquet(f"{d}/f=0")
    f1 = spark.read.parquet(f"{d}/f=1")
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "quant")
    kw = dict(n_centroids=2, dim=4, recall_floor=0.7, probe_k=1, n_probe=1)
    assert (
        index_batch_adaptive(loader, snaps, "assign", f0, 0, "ck", **kw)
        == "appended"
    )
    c0 = centroids_from_snapshot(snaps)
    low = probe_recall(f1, c0, k=1, n_probe=1)
    assert low < 0.7, f"fixture must degrade the probe, got {low}"
    assert (
        index_batch_adaptive(
            loader, snaps, "assign", f1, 1, "ck", archive_path=d, **kw
        )
        == "rebuilt"
    )
    assert len(snaps.versions()) == 2
    c1 = centroids_from_snapshot(snaps)
    assert not np.allclose(c0, c1)  # genuinely new lineage
    recovered = probe_recall(f1, c1, k=1, n_probe=1)
    assert recovered >= 0.9 > low
    # backfill covers the whole archive under the new quantizer; the
    # snapshot-consistent reader resolves lineage=1 from the pointer
    from etl_pipeline_orchestration_spark.streaming.ann_stream import (
        lineage_from_snapshot,
        prune_stale_lineages,
        read_assignments,
    )

    assert lineage_from_snapshot(snaps) == 1
    got = read_assignments(loader, "assign", snaps, "ck")
    assert got.count() == f0.count() + f1.count()
    # the superseded lineage=0 subtree survives the flip (in-flight
    # readers drain against it) until explicitly pruned
    import os

    root = loader._path("assign")
    assert os.path.isdir(os.path.join(root, "lineage=0"))
    assert prune_stale_lineages(loader, "assign", snaps) == [0]
    assert not os.path.isdir(os.path.join(root, "lineage=0"))
    assert read_assignments(loader, "assign", snaps, "ck").count() == got.count()
    # replay of batch 1 is skipped by the watermark
    assert (
        index_batch_adaptive(
            loader, snaps, "assign", f1, 1, "ck", archive_path=d, **kw
        )
        == "skipped"
    )


def test_drift_without_archive_refuses_rebuild(spark, tmp_path):
    """ADVICE r5: drift with no archive to backfill from must NOT
    truncate the assignments table to the current batch — the rebuild
    is refused, the batch appends under the frozen quantizer (pairing
    stays correct), and the caller is told via 'appended_degraded'."""
    from etl_pipeline_orchestration_spark.loader import SnapshotTable
    from etl_pipeline_orchestration_spark.streaming.ann_stream import (
        index_batch_adaptive,
        lineage_from_snapshot,
        read_assignments,
    )

    d = _drift_fixture(spark, str(tmp_path / "vecs"))
    f0 = spark.read.parquet(f"{d}/f=0")
    f1 = spark.read.parquet(f"{d}/f=1")
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "quant")
    kw = dict(n_centroids=2, dim=4, recall_floor=0.7, probe_k=1, n_probe=1)
    index_batch_adaptive(loader, snaps, "assign", f0, 0, "ck", **kw)
    # archive_path omitted → refusal, not truncation
    assert (
        index_batch_adaptive(loader, snaps, "assign", f1, 1, "ck", **kw)
        == "appended_degraded"
    )
    assert lineage_from_snapshot(snaps) == 0  # quantizer NOT retrained
    got = read_assignments(loader, "assign", snaps, "ck")
    assert got.count() == f0.count() + f1.count()  # nothing lost
    # watermark still advanced: replay is skipped
    assert (
        index_batch_adaptive(loader, snaps, "assign", f1, 1, "ck", **kw)
        == "skipped"
    )


def test_undrifted_stream_appends_without_rebuild(spark, tmp_path):
    """Distribution shift that keeps neighbors co-assigned must NOT
    trigger a rebuild: recall is unharmed (only balance shifts), so
    the probe stays high — correctly cheap."""
    from etl_pipeline_orchestration_spark.loader import SnapshotTable
    from etl_pipeline_orchestration_spark.streaming.ann_stream import (
        index_batch_adaptive,
    )

    d = _drift_fixture(spark, str(tmp_path / "vecs"))
    f0 = spark.read.parquet(f"{d}/f=0")
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "quant")
    kw = dict(n_centroids=2, dim=4, recall_floor=0.7, probe_k=1, n_probe=1)
    index_batch_adaptive(loader, snaps, "assign", f0, 0, "ck", **kw)
    # same regime again (new ids): tight blobs, co-assigned neighbors
    shifted = f0.select(
        (F.col("vec_id") + 5000).alias("vec_id"), "embedding"
    )
    assert (
        index_batch_adaptive(loader, snaps, "assign", shifted, 1, "ck", **kw)
        == "appended"
    )
    assert len(snaps.versions()) == 2


def test_band_index_compaction_preserves_candidates(spark, docs_dir, tmp_path):
    """VERDICT r5 item 4: compaction folds all published band
    partitions into one, the file count is bounded, the replay
    watermark contract survives, and candidate emission CONTINUES
    correctly for batches arriving after the compaction."""
    import os

    from etl_pipeline_orchestration_spark.loader import SnapshotTable
    from etl_pipeline_orchestration_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from etl_pipeline_orchestration_spark.streaming.dedup_stream import (
        compact_band_index,
        dedup_batch,
        read_band_index,
    )

    docs = spark.read.parquet(docs_dir)
    batches = [docs.filter(F.col("doc_id") % 4 == i) for i in range(4)]
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "idx")
    for i in range(3):
        dedup_batch(loader, snaps, "cand", batches[i], i, "ck", index_table="idx")
    n_before = read_band_index(loader, "idx", snaps, "ck").count()
    assert compact_band_index(loader, "idx", snaps, "ck") == 3
    root = loader._path("idx")
    parts = [d for d in os.listdir(root) if d.startswith("batch_id=")]
    assert parts == ["batch_id=2"]  # folded to the watermark partition
    # index content unchanged, replay still skipped
    assert read_band_index(loader, "idx", snaps, "ck").count() == n_before
    assert (
        dedup_batch(loader, snaps, "cand", batches[1], 1, "ck", index_table="idx")
        is False
    )
    # a second compact is a no-op
    assert compact_band_index(loader, "idx", snaps, "ck") == 0
    # stream continues: batch 3 lands AFTER compaction; the total
    # candidate set still equals the full-corpus batch run
    dedup_batch(loader, snaps, "cand", batches[3], 3, "ck", index_table="idx")
    got = {
        (r["id_a"], r["id_b"]): r["n_bands_matched"]
        for r in spark.read.parquet(loader._path("cand")).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): r["n_bands_matched"]
        for r in minhash_lsh_candidates(docs).collect()
    }
    assert got == want and len(want) > 0


def test_compaction_recovers_crash_windows(spark, docs_dir, tmp_path):
    """Every rename-aside crash point self-heals on the next read:
    (a) scratch written, nothing moved; (b) partitions moved aside,
    consolidated not in place; (c) consolidated in place, aside not
    yet deleted."""
    import os
    import shutil

    from etl_pipeline_orchestration_spark.loader import SnapshotTable
    from etl_pipeline_orchestration_spark.streaming.compaction import (
        recover_compaction,
    )
    from etl_pipeline_orchestration_spark.streaming.dedup_stream import (
        dedup_batch,
        read_band_index,
    )

    docs = spark.read.parquet(docs_dir)
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "idx")
    for i in range(2):
        dedup_batch(
            loader, snaps, "cand",
            docs.filter(F.col("doc_id") % 2 == i), i, "ck", index_table="idx",
        )
    root = loader._path("idx")
    n = read_band_index(loader, "idx", snaps, "ck").count()

    # (a) orphan scratch only
    os.makedirs(root + ".__compact_tmp")
    assert read_band_index(loader, "idx", snaps, "ck").count() == n
    assert not os.path.isdir(root + ".__compact_tmp")

    # (b) partitions aside + scratch present → roll back
    os.makedirs(root + ".__compact_tmp")
    os.makedirs(root + ".__compact_old")
    os.rename(
        os.path.join(root, "batch_id=0"),
        os.path.join(root + ".__compact_old", "batch_id=0"),
    )
    assert read_band_index(loader, "idx", snaps, "ck").count() == n
    assert os.path.isdir(os.path.join(root, "batch_id=0"))

    # (c) consolidated in place, aside holds duplicates → drop aside
    os.makedirs(root + ".__compact_old")
    shutil.copytree(
        os.path.join(root, "batch_id=0"),
        os.path.join(root + ".__compact_old", "batch_id=0"),
    )
    recover_compaction(root)
    assert not os.path.isdir(root + ".__compact_old")
    assert read_band_index(loader, "idx", snaps, "ck").count() == n


def test_ann_assignment_compaction_bounds_files(spark, vecs_dir, tmp_path):
    """Assignment partitions of the current lineage fold to one
    directory; the snapshot-consistent reader sees identical content
    and later batches keep appending."""
    import os

    from etl_pipeline_orchestration_spark.loader import SnapshotTable
    from etl_pipeline_orchestration_spark.streaming.ann_stream import (
        compact_assignments,
        index_batch_adaptive,
        read_assignments,
    )

    vecs = spark.read.parquet(vecs_dir)
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "quant")
    kw = dict(n_centroids=2, dim=8, recall_floor=0.0, probe_k=1, n_probe=1)
    batches = [vecs.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    for i in range(3):
        index_batch_adaptive(loader, snaps, "assign", batches[i], i, "ck", **kw)
    before = {
        (r["vec_id"], r["cluster_id"])
        for r in read_assignments(loader, "assign", snaps, "ck").collect()
    }
    assert compact_assignments(loader, "assign", snaps, "ck") == 3
    subtree = os.path.join(loader._path("assign"), "lineage=0")
    assert [d for d in os.listdir(subtree) if d.startswith("batch_id=")] == [
        "batch_id=2"
    ]
    after = {
        (r["vec_id"], r["cluster_id"])
        for r in read_assignments(loader, "assign", snaps, "ck").collect()
    }
    assert after == before and len(after) == vecs.count()


def test_prune_survives_crashed_compaction_siblings(spark, vecs_dir, tmp_path):
    """ADVICE r6: a crashed compact_assignments leaves
    'lineage=N.__compact_tmp' / '.__compact_old' siblings in the
    assignments root; prune_stale_lineages must heal them (strict
    lineage=<digits> matching + recover_compaction), not ValueError."""
    import os
    import shutil

    from etl_pipeline_orchestration_spark.loader import SnapshotTable
    from etl_pipeline_orchestration_spark.streaming.ann_stream import (
        index_batch_adaptive,
        prune_stale_lineages,
        read_assignments,
    )

    vecs = spark.read.parquet(vecs_dir)
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "quant")
    kw = dict(n_centroids=2, dim=8, recall_floor=0.0, probe_k=1, n_probe=1)
    index_batch_adaptive(loader, snaps, "assign", vecs, 0, "ck", **kw)
    root = loader._path("assign")
    subtree = os.path.join(root, "lineage=0")
    # simulate a compaction crash: scratch fully written, aside absent
    scratch = subtree + ".__compact_tmp"
    shutil.copytree(subtree, scratch)
    got = prune_stale_lineages(loader, "assign", snaps)  # must not raise
    assert got == []  # current lineage untouched
    assert not os.path.isdir(scratch)  # crash window healed
    assert read_assignments(loader, "assign", snaps, "ck").count() == vecs.count()


def test_read_assignments_skips_orphan_above_watermark(
    spark, vecs_dir, tmp_path
):
    """ADVICE r6: a crash between the assignment-partition write and
    the quantizer-snapshot flip leaves an orphaned batch_id partition
    ABOVE the watermark; the snapshot-consistent reader must not see it
    until its replay republishes (read_published_partitions contract)."""
    import os

    from etl_pipeline_orchestration_spark.loader import SnapshotTable
    from etl_pipeline_orchestration_spark.streaming.ann_stream import (
        index_batch_adaptive,
        read_assignments,
    )

    vecs = spark.read.parquet(vecs_dir)
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "quant")
    kw = dict(n_centroids=2, dim=8, recall_floor=0.0, probe_k=1, n_probe=1)
    index_batch_adaptive(loader, snaps, "assign", vecs, 0, "ck", **kw)
    n = vecs.count()
    assert read_assignments(loader, "assign", snaps, "ck").count() == n
    # orphan: assignments written for batch 7, crash before the flip
    orphan = os.path.join(loader._path("assign"), "lineage=0", "batch_id=7")
    spark.createDataFrame(
        [(999_999, 0)], "vec_id bigint, cluster_id int"
    ).write.mode("overwrite").parquet(orphan)
    got = read_assignments(loader, "assign", snaps, "ck")
    assert got.count() == n  # orphan invisible pre-replay
    assert got.filter(F.col("vec_id") == 999_999).count() == 0
