"""Streaming quality-classifier maintenance
(streaming/classifier_stream.py): the (y, f1..f5) feature-profile
histogram is a lossless additive sufficient statistic for the whole
6-iteration training trajectory — z is cell-constant, so every
gradient/M2/confusion aggregate is an exact weighted sum over cells.
Streamed cells, the re-derived weights, AND the published confusion
must equal a from-scratch batch run on the whole history bit-for-bit
under BOTH arrival orders; sum-merge is not replay-idempotent, so the
applied-upto skip is pinned as correctness."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.operators.classifier import (
    classifier_features,
    confusion_summary,
    train_logistic_int,
)
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.classifier_stream import (
    classifier_cells,
    classifier_cells_batch,
    published_classifier_confusion,
    read_documents_stream,
    stream_classifier_cells_to_warehouse,
    train_from_cells,
)

SF = "/root/testdata/sf0.001"


def _chunked_docs_dir(tmp_path_factory, order) -> str:
    """documents as 4 id-ordered parquet files whose mtimes realize the
    given arrival order (FileStreamSource drains oldest-mtime-first)."""
    d = str(tmp_path_factory.mktemp(f"clf_{''.join(map(str, order))}"))
    t = pq.read_table(f"{SF}/documents.parquet")
    idx = sorted(range(t.num_rows), key=lambda i: t["doc_id"][i].as_py())
    per = (len(idx) + 3) // 4
    chunks = [idx[i * per : (i + 1) * per] for i in range(4)]
    for arrival, ci in enumerate(order):
        import pyarrow as pa

        path = os.path.join(d, f"part-{ci}.parquet")
        pq.write_table(t.take(pa.array(chunks[ci], pa.int64())), path)
        mt = 1_700_000_000 + arrival * 100
        os.utime(path, (mt, mt))
    return d


@pytest.fixture(scope="module")
def fwd_dir(tmp_path_factory):
    return _chunked_docs_dir(tmp_path_factory, (0, 1, 2, 3))


@pytest.fixture(scope="module")
def rev_dir(tmp_path_factory):
    return _chunked_docs_dir(tmp_path_factory, (2, 0, 3, 1))


def _drain(spark, docs_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_documents_stream(spark, docs_dir, max_files_per_trigger=1)
    return stream_classifier_cells_to_warehouse(
        stream, loader, "clf_cells", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_cells_weights_confusion_equal_batch(
    spark, fwd_dir, tmp_path
):
    snaps = _drain(spark, fwd_dir, tmp_path)
    assert len(snaps.versions()) == 4
    docs = load_table(spark, SF, "documents")
    want_cells = _rows(classifier_cells(docs))
    assert _rows(snaps.read()) == want_cells
    # compressive: far fewer profile cells than documents
    assert len(want_cells) < docs.count()

    feats = classifier_features(docs)
    want_betas, want_m2 = train_logistic_int(feats)
    got_betas, got_m2 = train_from_cells(snaps.read())
    assert got_betas == want_betas
    assert got_m2 == want_m2

    want_conf = _rows(confusion_summary(feats, want_betas))
    assert _rows(published_classifier_confusion(spark, snaps)) == want_conf


def test_streamed_confusion_arrival_order_free(spark, rev_dir, tmp_path):
    snaps = _drain(spark, rev_dir, tmp_path)
    docs = load_table(spark, SF, "documents")
    assert _rows(snaps.read()) == _rows(classifier_cells(docs))
    feats = classifier_features(docs)
    betas, _ = train_logistic_int(feats)
    assert _rows(published_classifier_confusion(spark, snaps)) == _rows(
        confusion_summary(feats, betas)
    )


def test_published_confusion_matches_registered_query(spark, fwd_dir, tmp_path):
    """The streaming member's published output is the same surface the
    driver certifies (quality_classifier_train) — pin them equal."""
    from etl_pipeline_orchestration_spark.plans import registry

    registry.load_all()
    snaps = _drain(spark, fwd_dir, tmp_path)
    want = _rows(registry.QUERIES["quality_classifier_train"](spark, SF))
    assert _rows(published_classifier_confusion(spark, snaps)) == want


def test_replay_skip_pins_state(spark, fwd_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh2"))
    snaps = SnapshotTable(loader, "clf_cells_replay")
    app_id = "/ckpt/replay-test"
    batch = (
        spark.read.parquet(fwd_dir)
        .orderBy("doc_id")
        .limit(100)
    )
    assert classifier_cells_batch(snaps, batch, 0, app_id) is True
    before = _rows(snaps.read())
    # replayed batch id: must be skipped, or counts double
    assert classifier_cells_batch(snaps, batch, 0, app_id) is False
    assert _rows(snaps.read()) == before
    assert classifier_cells_batch(snaps, batch, 1, app_id) is True
    after = _rows(snaps.read())
    assert after != before  # second distinct batch really folded in
