"""Streaming SemDeDup maintenance: stream==batch twin under the frozen
centroid model, replay/exactly-once guards, earlier-arrival-wins
semantics for out-of-order duplicates, and archive compaction."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.llm_data import (
    semdedup_with_centroids,
)
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.ann_stream import (
    read_embeddings_stream,
)
from etl_pipeline_orchestration_spark.streaming.semdedup_stream import (
    centroids_from_snapshot,
    compact_archive,
    read_archive,
    read_decisions,
    semdedup_batch,
    stream_semdedup_to_warehouse,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ordered_vecs_dir(spark, tmp_path_factory):
    """Corpus (embeddings + 50 planted exact copies at vec_id+1e6) as 4
    id-ordered parquet files with ASCENDING mtimes, so the file stream's
    arrival order is id order — the regime where stream decisions must
    equal batch decisions pair-for-pair."""
    d = str(tmp_path_factory.mktemp("sem_vecs"))
    vecs = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    planted = vecs.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    rows = vecs.unionByName(planted).orderBy("vec_id").collect()
    per = (len(rows) + 3) // 4
    for i in range(4):
        chunk = rows[i * per : (i + 1) * per]
        table = pa.table(
            {
                "vec_id": pa.array(
                    [r["vec_id"] for r in chunk], pa.int64()
                ),
                "embedding": pa.array(
                    [list(r["embedding"]) for r in chunk],
                    pa.list_(pa.float32()),
                ),
            }
        )
        path = os.path.join(d, f"part-{i}.parquet")
        pq.write_table(table, path)
        t = 1_700_000_000 + i * 100
        os.utime(path, (t, t))
    return d


def _decision_dict(df):
    return {
        r["vec_id"]: (r["cluster_id"], r["status"], r["dup_of"])
        for r in df.collect()
    }


def test_streamed_semdedup_equals_batch_frozen_model(
    spark, ordered_vecs_dir, tmp_path
):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    stream = read_embeddings_stream(
        spark, ordered_vecs_dir, max_files_per_trigger=1
    )
    snaps = stream_semdedup_to_warehouse(
        stream, loader, "sem_cents", "sem_archive", "sem_decisions", ckpt
    )
    assert len(snaps.versions()) == 4  # one publish per micro-batch
    got = _decision_dict(
        read_decisions(loader, "sem_decisions", snaps, os.path.abspath(ckpt))
    )
    cents = centroids_from_snapshot(snaps)
    want = _decision_dict(
        semdedup_with_centroids(spark.read.parquet(ordered_vecs_dir), cents)
    )
    assert got == want
    n_dropped = sum(1 for (_, s, _) in got.values() if s == "dropped")
    assert n_dropped >= 50  # the planted copies make it non-vacuous
    # every streamed vector got exactly one decision
    assert len(got) == spark.read.parquet(ordered_vecs_dir).count()


def _one_hot_batch(spark, specs):
    """[(vec_id, axis)] -> (vec_id, embedding) DataFrame of one-hot
    64-dim vectors: pairwise cosine is 1.0 on the same axis, 0.0
    otherwise — fully deterministic dup structure."""
    rows = [
        (int(v), [1.0 if i == axis else 0.0 for i in range(64)])
        for v, axis in specs
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_semdedup_replayed_batch_is_skipped(spark, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "c")
    b0 = _one_hot_batch(spark, [(i, i % 16) for i in range(24)])
    assert semdedup_batch(loader, snaps, "arch", "dec", b0, 0, "ck") is True
    once = _decision_dict(read_decisions(loader, "dec", snaps, "ck"))
    n_arch = read_archive(loader, "arch", snaps, "ck").count()
    assert n_arch == 24
    # checkpoint replay of an applied batch id: no-op
    assert semdedup_batch(loader, snaps, "arch", "dec", b0, 0, "ck") is False
    assert _decision_dict(read_decisions(loader, "dec", snaps, "ck")) == once
    assert read_archive(loader, "arch", snaps, "ck").count() == n_arch
    # empty batches leave the watermark untouched
    empty = b0.limit(0)
    assert semdedup_batch(loader, snaps, "arch", "dec", empty, 1, "ck") is False
    # a fresh checkpoint against the existing archive fails loudly
    with pytest.raises(ValueError, match="checkpoint"):
        semdedup_batch(loader, snaps, "arch", "dec", b0, 0, "other-ck")


def test_semdedup_out_of_order_arrival_keeps_early(spark, tmp_path):
    """A duplicate pair arriving in reverse id order: the stream keeps
    the EARLY-arriving high-id copy and drops the late low-id original
    (earlier arrival wins — the keep-early-evidence trade-off the
    module docstring owns; a batch rerun would decide by min id)."""
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "c")
    # batch 0: vectors on axes 0..19 plus the future-duplicate's copy
    # (id 1000, axis 50 — unique in its batch); batch 1: the original
    # (id 5, axis 50).
    b0 = _one_hot_batch(
        spark, [(100 + i, i) for i in range(20)] + [(1000, 50)]
    )
    b1 = _one_hot_batch(spark, [(5, 50), (6, 40)])
    assert semdedup_batch(loader, snaps, "arch", "dec", b0, 0, "ck") is True
    assert semdedup_batch(loader, snaps, "arch", "dec", b1, 1, "ck") is True
    d = _decision_dict(read_decisions(loader, "dec", snaps, "ck"))
    assert d[1000][1] == "kept"  # early copy never re-decided
    # late original drops against the archived higher-id copy — the
    # decision a min-id batch rerun would invert.
    assert d[5][1] == "dropped" and d[5][2] == 1000
    assert d[6][1] == "kept"  # axis 40 has no mate anywhere


def test_semdedup_archive_compaction_preserves_decisions(spark, tmp_path):
    """Compacting published archive partitions must not change any
    later batch's decisions, and must bound the partition count."""
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "c")
    b0 = _one_hot_batch(spark, [(i, i % 16) for i in range(24)])
    b1 = _one_hot_batch(spark, [(30 + i, 16 + i) for i in range(8)])
    semdedup_batch(loader, snaps, "arch", "dec", b0, 0, "ck")
    semdedup_batch(loader, snaps, "arch", "dec", b1, 1, "ck")
    before = {
        r["vec_id"]: (r["j"], list(r["xq"]))
        for r in read_archive(loader, "arch", snaps, "ck").collect()
    }
    folded = compact_archive(loader, "arch", snaps, "ck")
    assert folded == 2
    subtree = os.path.join(loader._path("arch"), "lineage=0")
    parts = [p for p in os.listdir(subtree) if p.startswith("batch_id=")]
    assert parts == ["batch_id=1"]  # one consolidated watermark partition
    after = {
        r["vec_id"]: (r["j"], list(r["xq"]))
        for r in read_archive(loader, "arch", snaps, "ck").collect()
    }
    assert after == before
    # a post-compaction batch still dedups against the folded archive:
    # id 50 duplicates archived axis-3 vector id 3.
    b2 = _one_hot_batch(spark, [(50, 3), (51, 60)])
    assert semdedup_batch(loader, snaps, "arch", "dec", b2, 2, "ck") is True
    d = _decision_dict(read_decisions(loader, "dec", snaps, "ck"))
    assert d[50][1] == "dropped" and d[50][2] == 3
    assert d[51][1] == "kept"


def test_refit_triggers_and_occupancy_drops(spark, tmp_path):
    """VERDICT r6 item 1, done-criterion 1: a stream whose archive has
    outgrown the first-batch model refits — k rescales to
    _semdedup_k(archive), the archive re-buckets under a new lineage,
    and mean occupancy drops back toward the constant-occupancy
    target. Nothing to refit -> "skipped"."""
    from etl_pipeline_orchestration_spark.plans.llm_data import _semdedup_k
    from etl_pipeline_orchestration_spark.streaming.semdedup_stream import (
        refit_semdedup_model,
    )

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "c")
    # refit on a virgin store is a no-op
    assert refit_semdedup_model(loader, snaps, "arch", "ck") == "skipped"
    # batch 0: 768 vectors -> k frozen at the floor (8)
    per = 768
    b0 = _one_hot_batch(spark, [(i, i % 64) for i in range(per)])
    assert semdedup_batch(loader, snaps, "arch", "dec", b0, 0, "ck") is True
    assert len(centroids_from_snapshot(snaps)) == 8
    # archive small -> still skipped (k would not grow)
    assert refit_semdedup_model(loader, snaps, "arch", "ck") == "skipped"
    # two more batches: archive reaches 2304 -> _semdedup_k = 9 > 8
    for bid in (1, 2):
        b = _one_hot_batch(
            spark,
            [(bid * 10_000 + i, (bid * 7 + i) % 64) for i in range(per)],
        )
        assert semdedup_batch(loader, snaps, "arch", "dec", b, bid, "ck")
    n = read_archive(loader, "arch", snaps, "ck").count()
    assert n == 3 * per and _semdedup_k(n) == 9
    assert refit_semdedup_model(loader, snaps, "arch", "ck") == "refit"
    cents = centroids_from_snapshot(snaps)
    assert len(cents) == 9  # retrained at archive scale
    # re-bucketed archive: same vectors, complete, under the new model
    rebucketed = read_archive(loader, "arch", snaps, "ck")
    assert rebucketed.count() == n
    occ = [
        r["cnt"]
        for r in rebucketed.groupBy("j").count().withColumnRenamed(
            "count", "cnt"
        ).collect()
    ]
    assert len(occ) <= 9 and sum(occ) == n
    # immediately re-running finds nothing to do
    assert refit_semdedup_model(loader, snaps, "arch", "ck") == "skipped"
    # superseded lineage survives the flip until pruned
    from etl_pipeline_orchestration_spark.streaming.semdedup_stream import (
        prune_stale_lineages,
    )

    root = loader._path("arch")
    assert os.path.isdir(os.path.join(root, "lineage=0"))
    assert prune_stale_lineages(loader, "arch", snaps) == [0]
    assert not os.path.isdir(os.path.join(root, "lineage=0"))
    assert read_archive(loader, "arch", snaps, "ck").count() == n


def test_growth_alone_triggers_auto_refit(spark, tmp_path):
    """VERDICT r7 item 3: archive GROWTH alone — no manual refit call —
    trips the per-batch occupancy probe. Batches stream in with
    ``auto_refit=True``; nothing refits while mean occupancy stays
    under 256*slack; the first batch pushing past the line triggers
    EXACTLY one refit (k rescales to the archive, occupancy drops back
    under the probe line), published decisions stay byte-identical,
    and replay skips survive the lineage flip."""
    from etl_pipeline_orchestration_spark.streaming.ann_stream import (
        lineage_from_snapshot,
    )

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "c")
    per = 1000

    def spread_batch(bid):
        # deterministic spread vectors (one-hot collapses the integer
        # k-means to 2 effective clusters — means of uniform axis mixes
        # are near-identical — which would make the k-rescale vacuous)
        rows = [
            (
                bid * per + v,
                [((v * 31 + i * 17 + bid * 7) % 101) / 101.0 for i in range(64)],
            )
            for v in range(per)
        ]
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>"
        )

    for bid in range(4):
        assert semdedup_batch(
            loader, snaps, "arch", "dec", spread_batch(bid), bid, "ck",
            auto_refit=True,
        )
        # n <= 4096 = 256 * slack(2) * k(8): under the line, no refit
        assert lineage_from_snapshot(snaps) == 0
    assert len(centroids_from_snapshot(snaps)) == 8  # first-batch floor
    before = _decision_dict(read_decisions(loader, "dec", snaps, "ck"))
    last = spread_batch(4)
    assert semdedup_batch(
        loader, snaps, "arch", "dec", last, 4, "ck", auto_refit=True
    )
    # growth alone triggered exactly one refit: one lineage flip, k
    # rescaled to the archive, occupancy back at the design point
    assert lineage_from_snapshot(snaps) == 1
    k1 = len(centroids_from_snapshot(snaps))
    assert k1 > 8  # retrained at archive scale (target 19, minus empties)
    n = read_archive(loader, "arch", snaps, "ck").count()
    assert n == 5 * per
    assert n / k1 <= 256 * 2.0
    # decisions immutable across the refit; the last batch got decided
    after = _decision_dict(read_decisions(loader, "dec", snaps, "ck"))
    assert {v: after[v] for v in before} == before
    assert len(after) == 5 * per
    # replay of the batch that caused the refit still skips
    assert (
        semdedup_batch(
            loader, snaps, "arch", "dec", last, 4, "ck", auto_refit=True
        )
        is False
    )


def test_refit_preserves_decisions_and_replay_skip(spark, tmp_path):
    """VERDICT r6 item 1, done-criteria 2+3: published decisions are
    byte-identical across a refit (the archive is evidence, never
    re-decided), replayed batch ids stay skipped, and post-refit
    batches dedup correctly against the re-bucketed archive."""
    from etl_pipeline_orchestration_spark.streaming.semdedup_stream import (
        refit_semdedup_model,
    )

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "c")
    b0 = _one_hot_batch(spark, [(i, i % 32) for i in range(64)])
    b1 = _one_hot_batch(spark, [(100 + i, 32 + i % 16) for i in range(32)])
    semdedup_batch(loader, snaps, "arch", "dec", b0, 0, "ck")
    semdedup_batch(loader, snaps, "arch", "dec", b1, 1, "ck")
    before = _decision_dict(read_decisions(loader, "dec", snaps, "ck"))
    # force a refit regardless of scale via target_k (the effective
    # cluster count can shrink below target_k — empty clusters vanish
    # in the Lloyd update — so pin the LINEAGE flip, not k)
    from etl_pipeline_orchestration_spark.streaming.ann_stream import (
        lineage_from_snapshot,
    )

    assert (
        refit_semdedup_model(loader, snaps, "arch", "ck", target_k=12)
        == "refit"
    )
    assert lineage_from_snapshot(snaps) == 1
    # decisions untouched by the refit
    assert _decision_dict(read_decisions(loader, "dec", snaps, "ck")) == before
    # replay of an applied batch is still skipped after the flip
    assert semdedup_batch(loader, snaps, "arch", "dec", b0, 0, "ck") is False
    assert semdedup_batch(loader, snaps, "arch", "dec", b1, 1, "ck") is False
    assert _decision_dict(read_decisions(loader, "dec", snaps, "ck")) == before
    # a post-refit batch drops exact copies of ARCHIVED vectors: the
    # twin semantics hold across the refit boundary (identical vectors
    # co-assign under any centroid set, so candidate routing survives
    # the re-bucket).
    b2 = _one_hot_batch(spark, [(500, 3), (501, 63)])  # 3 dups axis-3 id 3
    assert semdedup_batch(loader, snaps, "arch", "dec", b2, 2, "ck") is True
    d = _decision_dict(read_decisions(loader, "dec", snaps, "ck"))
    assert d[500][1] == "dropped" and d[500][2] == 3
    assert d[501][1] == "kept"
    # and the new batch's archive partition landed in the NEW lineage
    sub = os.path.join(loader._path("arch"), "lineage=1")
    assert "batch_id=2" in os.listdir(sub)


def test_refit_crash_window_leaves_old_pair_current(spark, tmp_path):
    """A staged-but-unflipped refit (crash between stage and flip) is
    invisible: readers keep the old (model, archive) pair, and the
    retried refit overwrites the same staged subtree and completes."""
    from etl_pipeline_orchestration_spark.streaming.semdedup_stream import (
        _archive_subtree,
        _assign_exact,
        centroids_from_snapshot as cfs,
        refit_semdedup_model,
    )
    from etl_pipeline_orchestration_spark.plans.llm_data import (
        _lloyd_round_centroids,
    )

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "c")
    b0 = _one_hot_batch(spark, [(i, i % 24) for i in range(48)])
    semdedup_batch(loader, snaps, "arch", "dec", b0, 0, "ck")
    arch = read_archive(loader, "arch", snaps, "ck")
    # simulate the crash: stage lineage=1 manually, never flip
    dfq = arch.select("vec_id", "xq")
    cents = _lloyd_round_centroids(dfq, 10)
    staged = os.path.join(
        _archive_subtree(loader, "arch", 1), "batch_id=0"
    )
    _assign_exact(dfq, cents).write.mode("overwrite").parquet(staged)
    # readers still resolve lineage 0: old model, old bucketing
    assert len(cfs(snaps)) == 8
    assert read_archive(loader, "arch", snaps, "ck").count() == 48
    # the retried refit overwrites the orphan and completes atomically
    assert (
        refit_semdedup_model(loader, snaps, "arch", "ck", target_k=10)
        == "refit"
    )
    from etl_pipeline_orchestration_spark.streaming.ann_stream import (
        lineage_from_snapshot,
    )

    assert lineage_from_snapshot(snaps) == 1  # flip landed
    assert read_archive(loader, "arch", snaps, "ck").count() == 48


def test_refit_retry_after_watermark_advance_leaves_no_orphan(
    spark, tmp_path
):
    """Review r7: a refit that crashed after staging at watermark W,
    with the stream then advancing to W+1, must not leave the stale
    batch_id=W staging visible after the retried refit flips — the
    whole lineage=L+1 subtree is cleared before re-staging."""
    from etl_pipeline_orchestration_spark.plans.llm_data import (
        _lloyd_round_centroids,
    )
    from etl_pipeline_orchestration_spark.streaming.semdedup_stream import (
        _archive_subtree,
        _assign_exact,
        refit_semdedup_model,
    )

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "c")
    b0 = _one_hot_batch(spark, [(i, i % 24) for i in range(48)])
    semdedup_batch(loader, snaps, "arch", "dec", b0, 0, "ck")
    # crashed refit: staged lineage=1/batch_id=0, never flipped
    arch0 = read_archive(loader, "arch", snaps, "ck")
    cents = _lloyd_round_centroids(arch0.select("vec_id", "xq"), 10)
    orphan = os.path.join(_archive_subtree(loader, "arch", 1), "batch_id=0")
    _assign_exact(arch0.select("vec_id", "xq"), cents).write.mode(
        "overwrite"
    ).parquet(orphan)
    # stream advances: batch 1 lands under lineage 0, watermark -> 1
    b1 = _one_hot_batch(spark, [(200 + i, 24 + i % 8) for i in range(16)])
    assert semdedup_batch(loader, snaps, "arch", "dec", b1, 1, "ck") is True
    n_total = 48 + 16
    # retried refit stages at batch_id=1 and must CLEAR the orphan
    assert (
        refit_semdedup_model(loader, snaps, "arch", "ck", target_k=12)
        == "refit"
    )
    assert not os.path.isdir(orphan)  # stale staging gone
    got = read_archive(loader, "arch", snaps, "ck")
    assert got.count() == n_total  # every vector exactly once
    assert got.select("vec_id").distinct().count() == n_total


def test_compact_archive_virgin_store_is_noop(spark, tmp_path):
    """Review r7: compacting before the first publish must return 0,
    not raise FileNotFoundError from the snapshot read."""
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "c")
    assert compact_archive(loader, "arch", snaps, "ck") == 0


def test_flat_legacy_archive_layout_refuses_loudly(spark, tmp_path):
    """Review r7: a pre-lineage flat archive must not silently read as
    EMPTY (that would keep every duplicate) — it raises with the
    one-time migration command."""
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "c")
    b0 = _one_hot_batch(spark, [(i, i % 8) for i in range(16)])
    semdedup_batch(loader, snaps, "arch", "dec", b0, 0, "ck")
    # simulate the legacy layout: move lineage=0 partitions to the root
    import shutil

    root = loader._path("arch")
    sub = os.path.join(root, "lineage=0")
    for d in os.listdir(sub):
        shutil.move(os.path.join(sub, d), os.path.join(root, d))
    os.rmdir(sub)
    with pytest.raises(ValueError, match="migrate"):
        read_archive(loader, "arch", snaps, "ck")
