"""Streaming item-item CF maintenance (streaming/itemitem_stream.py):
published recommendations must equal the one-shot batch query under
BOTH arrival orders, with chunks that deliberately split orders
mid-basket (the pair-count-isn't-additive hazard the basket-set state
exists to dodge); distinct-union is replay-idempotent but the skip is
still pinned."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans import registry
from etl_pipeline_orchestration_spark.plans.analytics_ext import (
    basket_pairs,
    itemitem_topk_of,
)
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.itemitem_stream import (
    baskets_batch,
    merge_baskets,
    published_itemitem_topk,
    read_lineitem_stream,
    stream_baskets_to_warehouse,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _chunked_li_dir(tmp_path_factory, order) -> str:
    d = str(tmp_path_factory.mktemp(f"ii_{''.join(map(str, order))}"))
    t = pq.read_table(f"{SF}/lineitem.parquet")
    # orderkey-sorted chunks: boundary orders straddle chunks, so a
    # pair-count state would drop cross-batch pairs — the twin's point
    idx = sorted(
        range(t.num_rows),
        key=lambda i: (
            t["l_orderkey"][i].as_py(),
            t["l_linenumber"][i].as_py(),
        ),
    )
    per = (len(idx) + 3) // 4
    chunks = [idx[i * per : (i + 1) * per] for i in range(4)]
    for arrival, ci in enumerate(order):
        path = os.path.join(d, f"part-{ci}.parquet")
        pq.write_table(t.take(pa.array(chunks[ci], pa.int64())), path)
        mt = 1_700_000_000 + arrival * 100
        os.utime(path, (mt, mt))
    return d


@pytest.fixture(scope="module")
def fwd_dir(tmp_path_factory):
    return _chunked_li_dir(tmp_path_factory, (0, 1, 2, 3))


@pytest.fixture(scope="module")
def rev_dir(tmp_path_factory):
    return _chunked_li_dir(tmp_path_factory, (3, 1, 0, 2))


def _drain(spark, li_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_lineitem_stream(spark, li_dir, max_files_per_trigger=1)
    return stream_baskets_to_warehouse(
        stream, loader, "baskets", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_topk_equals_batch_in_order(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    assert len(snaps.versions()) == 4
    li = load_table(spark, SF, "lineitem")
    assert _rows(snaps.read()) == _rows(basket_pairs(li))
    batch = _rows(registry.QUERIES["itemitem_cf_topk"](spark, SF))
    assert _rows(published_itemitem_topk(spark, snaps)) == batch


def test_streamed_topk_equals_batch_reversed(spark, rev_dir, tmp_path):
    snaps = _drain(spark, rev_dir, tmp_path)
    batch = _rows(registry.QUERIES["itemitem_cf_topk"](spark, SF))
    assert _rows(published_itemitem_topk(spark, snaps)) == batch


def test_straddled_order_pairs_only_complete_after_both_chunks(
    spark, fwd_dir, tmp_path
):
    """After only chunk 0, some boundary order is incomplete: its
    cross-chunk pairs are absent from a pair table built on the partial
    state, and appear once the full history drains — pins WHY the
    state is the basket set, not pair counts."""
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "baskets")
    first = sorted(os.listdir(fwd_dir))[0]
    batch = spark.read.parquet(os.path.join(fwd_dir, first))
    assert baskets_batch(snaps, batch, 0, "app") is True
    partial_pairs = {
        (r.part_i, r.part_j)
        for r in itemitem_topk_of(snaps.read())
        .select("part_i", "part_j")
        .collect()
    }
    li = load_table(spark, SF, "lineitem")
    full_bp = {tuple(r) for r in basket_pairs(li).collect()}
    stored = {tuple(r) for r in snaps.read().collect()}
    assert stored < full_bp  # strictly partial
    assert partial_pairs  # derivation still well-formed on partials


def test_merge_idempotent_and_replay_guard(spark, tmp_path):
    li = load_table(spark, SF, "lineitem")
    a = basket_pairs(li.filter("l_orderkey % 2 = 0"))
    b = basket_pairs(li.filter("l_orderkey % 2 = 1"))
    assert _rows(merge_baskets(a, b)) == _rows(basket_pairs(li))
    # idempotent: merging a with itself is a no-op on the SET
    assert _rows(merge_baskets(a, a)) == _rows(a)

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "bk")
    small = li.limit(80)
    assert baskets_batch(snaps, small, 0, "ck") is True
    before = _rows(snaps.read())
    assert baskets_batch(snaps, small, 0, "ck") is False
    assert _rows(snaps.read()) == before
