"""Streaming HITS maintenance: the published hub/authority table must
equal the one-shot batch query under BOTH in-order and reversed file
arrival (supply-edge counts are additive — lineitem rows are atomic),
and the additive merge must be replay-safe."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans import registry
from etl_pipeline_orchestration_spark.streaming.hits_stream import (
    merge_supply_batch,
    published_hits,
    read_lineitem_stream,
    stream_hits_to_warehouse,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _chunked_lineitem_dir(tmp_path_factory, reverse: bool) -> str:
    name = "hits_rev" if reverse else "hits_fwd"
    d = str(tmp_path_factory.mktemp(name))
    t = pq.read_table(f"{SF}/lineitem.parquet")
    idx = sorted(
        range(t.num_rows),
        key=lambda i: (
            t["l_orderkey"][i].as_py(),
            t["l_linenumber"][i].as_py(),
        ),
    )
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
    return _chunked_lineitem_dir(tmp_path_factory, reverse=False)


@pytest.fixture(scope="module")
def rev_dir(tmp_path_factory):
    return _chunked_lineitem_dir(tmp_path_factory, reverse=True)


def _drain(spark, li_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_lineitem_stream(spark, li_dir, max_files_per_trigger=1)
    return stream_hits_to_warehouse(
        stream, loader, "supply_state", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_hits_equal_batch_in_order(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    assert len(snaps.versions()) == 4
    batch = _rows(registry.QUERIES["hits_supplier_part"](spark, SF))
    assert _rows(published_hits(spark, snaps)) == batch


def test_streamed_hits_equal_batch_reversed_arrival(spark, rev_dir, tmp_path):
    snaps = _drain(spark, rev_dir, tmp_path)
    batch = _rows(registry.QUERIES["hits_supplier_part"](spark, SF))
    assert _rows(published_hits(spark, snaps)) == batch


def test_additive_merge_skips_replayed_batch(spark, tmp_path):
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "supply_state")
    batch = load_table(spark, SF, "lineitem")
    assert merge_supply_batch(snaps, batch, 0, "app") is True
    before = _rows(snaps.read())
    assert merge_supply_batch(snaps, batch, 0, "app") is False
    assert _rows(snaps.read()) == before
    assert merge_supply_batch(snaps, batch, 1, "app") is True
    after = {(r[0], r[1]): r[2] for r in _rows(snaps.read())}
    assert all(after[(s, p)] == 2 * w for s, p, w in before)


def test_stored_state_is_item_domain_bounded(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    stored = snaps.read()
    n_lines = pq.ParquetFile(f"{SF}/lineitem.parquet").metadata.num_rows
    assert stored.count() <= n_lines
    assert stored.count() == stored.select("s", "p").distinct().count()
