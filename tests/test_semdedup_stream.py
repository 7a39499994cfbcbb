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
    parts = [
        p
        for p in os.listdir(loader._path("arch"))
        if p.startswith("batch_id=")
    ]
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
