"""Streaming TextRank maintenance: the published keyword table must
equal the one-shot batch query under BOTH in-order and reversed file
arrival (co-occurrence counts are additive — documents are atomic
rows), and the additive merge must be replay-safe."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans import registry
from etl_pipeline_orchestration_spark.streaming.textrank_stream import (
    merge_cooc_batch,
    published_textrank,
    read_documents_stream,
    stream_textrank_to_warehouse,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _chunked_docs_dir(tmp_path_factory, reverse: bool) -> str:
    name = "tr_rev" if reverse else "tr_fwd"
    d = str(tmp_path_factory.mktemp(name))
    t = pq.read_table(f"{SF}/documents.parquet")
    idx = sorted(range(t.num_rows), key=lambda i: t["doc_id"][i].as_py())
    per = (len(idx) + 3) // 4
    chunks = [c for c in (idx[i * per : (i + 1) * per] for i in range(4)) if c]
    if reverse:
        chunks = chunks[::-1]
    for i, chunk in enumerate(chunks):
        path = os.path.join(d, f"part-{i}.parquet")
        pq.write_table(t.take(pa.array(chunk, pa.int64())), path)
        mt = 1_700_000_000 + i * 100
        os.utime(path, (mt, mt))
    return d


@pytest.fixture(scope="module")
def fwd_dir(tmp_path_factory):
    return _chunked_docs_dir(tmp_path_factory, reverse=False)


@pytest.fixture(scope="module")
def rev_dir(tmp_path_factory):
    return _chunked_docs_dir(tmp_path_factory, reverse=True)


def _drain(spark, docs_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_documents_stream(spark, docs_dir, max_files_per_trigger=1)
    return stream_textrank_to_warehouse(
        stream, loader, "cooc_state", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_keywords_equal_batch_in_order(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    assert len(snaps.versions()) == 4
    batch = _rows(registry.QUERIES["textrank_keywords"](spark, SF))
    assert _rows(published_textrank(spark, snaps)) == batch


def test_streamed_keywords_equal_batch_reversed_arrival(
    spark, rev_dir, tmp_path
):
    snaps = _drain(spark, rev_dir, tmp_path)
    batch = _rows(registry.QUERIES["textrank_keywords"](spark, SF))
    assert _rows(published_textrank(spark, snaps)) == batch


def test_additive_merge_skips_replayed_batch(spark, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "cooc_state")
    batch = spark.read.parquet(f"{SF}/documents.parquet")
    assert merge_cooc_batch(snaps, batch, 0, "app") is True
    before = _rows(snaps.read())
    assert merge_cooc_batch(snaps, batch, 0, "app") is False
    assert _rows(snaps.read()) == before
    assert merge_cooc_batch(snaps, batch, 1, "app") is True
    after = {(r[0], r[1]): r[2] for r in _rows(snaps.read())}
    assert all(after[(s, d)] == 2 * w for s, d, w in before)


def test_stored_state_is_vocabulary_bounded(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    stored = snaps.read()
    vocab = (
        registry.QUERIES["textrank_keywords"](spark, SF).count()
    )
    assert stored.count() <= vocab * vocab
    assert stored.select("s").distinct().count() <= vocab


def test_min_count_floor_drops_rare_edges(spark):
    from etl_pipeline_orchestration_spark.plans.llm_data import (
        textrank_cooc_edges,
    )

    # wide-vocab corpus: 'hub x hub' repeats make (hub, x) weight-2;
    # every (rare_i, rare_j) adjacent pair occurs exactly once
    docs = spark.createDataFrame(
        [(i, f"rare{i}a rare{i}b hub x hub") for i in range(50)],
        "doc_id bigint, text string",
    )
    no_floor = textrank_cooc_edges(docs)
    floored = textrank_cooc_edges(docs, min_count=2)
    assert no_floor.count() > floored.count()
    assert floored.filter("w < 2").count() == 0
    # the frequent backbone survives the floor
    assert floored.filter("s = 'hub' and d = 'x'").count() == 1


def test_oversized_graph_trips_collect_cap(spark, monkeypatch):
    """A wide-vocabulary co-occurrence graph must raise at the
    driver_collect_cap instead of collecting unbounded."""
    from etl_pipeline_orchestration_spark.operators import graph
    from etl_pipeline_orchestration_spark.plans import llm_data

    monkeypatch.setattr(
        graph, "driver_collect_cap", lambda *a, **k: 10
    )
    docs = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c") for i in range(20)],
        "doc_id bigint, text string",
    )
    e = llm_data.textrank_cooc_edges(docs)
    with pytest.raises(ValueError, match="min_count frequency floor"):
        llm_data.textrank_ratings(spark, e)
    # a floor that shrinks the graph under the cap fits again
    monkeypatch.undo()
    out = llm_data.textrank_ratings(
        spark, llm_data.textrank_cooc_edges(docs)
    )
    assert out.count() > 0
