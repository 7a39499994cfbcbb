"""Streaming PCA maintenance: the published dominant-direction table
must equal the one-shot batch query under BOTH in-order and reversed
file arrival (Gram partials and counts are additive), and the additive
merge must be replay-safe. State is always exactly 4097 rows."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans import registry
from etl_pipeline_orchestration_spark.streaming.pca_stream import (
    merge_gram_batch,
    published_pca,
    read_embeddings_stream,
    stream_pca_to_warehouse,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _chunked_vecs_dir(tmp_path_factory, reverse: bool) -> str:
    name = "pca_rev" if reverse else "pca_fwd"
    d = str(tmp_path_factory.mktemp(name))
    t = pq.read_table(f"{SF}/embeddings.parquet")
    idx = sorted(range(t.num_rows), key=lambda i: t["vec_id"][i].as_py())
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
    return _chunked_vecs_dir(tmp_path_factory, reverse=False)


@pytest.fixture(scope="module")
def rev_dir(tmp_path_factory):
    return _chunked_vecs_dir(tmp_path_factory, reverse=True)


def _drain(spark, vec_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_embeddings_stream(spark, vec_dir, max_files_per_trigger=1)
    return stream_pca_to_warehouse(
        stream, loader, "gram_state", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_pca_equals_batch_in_order(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    assert len(snaps.versions()) == 4
    batch = _rows(registry.QUERIES["embedding_pca_power_exact"](spark, SF))
    assert _rows(published_pca(spark, snaps)) == batch


def test_streamed_pca_equals_batch_reversed_arrival(spark, rev_dir, tmp_path):
    snaps = _drain(spark, rev_dir, tmp_path)
    batch = _rows(registry.QUERIES["embedding_pca_power_exact"](spark, SF))
    assert _rows(published_pca(spark, snaps)) == batch


def test_additive_merge_skips_replayed_batch(spark, tmp_path):
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "gram_state")
    batch = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    assert merge_gram_batch(snaps, batch, 0, "app") is True
    before = _rows(snaps.read())
    assert merge_gram_batch(snaps, batch, 0, "app") is False
    assert _rows(snaps.read()) == before
    assert merge_gram_batch(snaps, batch, 1, "app") is True
    after = {(r[0], r[1]): r[2] for r in _rows(snaps.read())}
    assert all(after[(i, j)] == 2 * g for i, j, g in before)


def test_stored_state_is_constant_model_size(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    stored = snaps.read()
    assert stored.count() == 4097  # 64x64 grid + the (0,0,n) count row
    n = stored.filter("i = 0 AND j = 0").collect()[0]["g"]
    vecs = pq.ParquetFile(f"{SF}/embeddings.parquet").metadata.num_rows
    assert int(n) == vecs
