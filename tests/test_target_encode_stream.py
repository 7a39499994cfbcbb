"""Streaming target-encoding maintenance
(streaming/target_encode_stream.py): the published out-of-fold
encoding table must equal the one-shot batch query under BOTH arrival
orders; the per-customer count state is additive, so the replay skip
is pinned as correctness (sum-merge is not idempotent)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans import registry
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.target_encode_stream import (
    counts_batch,
    merge_counts,
    published_oof_encodings,
    read_orders_stream,
    stream_target_counts_to_warehouse,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _chunked_orders_dir(tmp_path_factory, order) -> str:
    d = str(tmp_path_factory.mktemp(f"te_{''.join(map(str, order))}"))
    t = pq.read_table(f"{SF}/orders.parquet")
    # customer-ordered chunks: a customer's orders straddle chunks only
    # at boundaries — the additive-merge case the twin must cover, so
    # sort by custkey to maximize same-customer adjacency splits
    idx = sorted(
        range(t.num_rows),
        key=lambda i: (t["o_custkey"][i].as_py(), t["o_orderkey"][i].as_py()),
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
    return _chunked_orders_dir(tmp_path_factory, (0, 1, 2, 3))


@pytest.fixture(scope="module")
def rev_dir(tmp_path_factory):
    return _chunked_orders_dir(tmp_path_factory, (3, 1, 0, 2))


def _drain(spark, orders_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_orders_stream(spark, orders_dir, max_files_per_trigger=1)
    return stream_target_counts_to_warehouse(
        stream, loader, "cust_counts", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_encodings_equal_batch_in_order(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    assert len(snaps.versions()) == 4
    cust = load_table(spark, SF, "customer")
    batch = _rows(registry.QUERIES["target_encode_oof"](spark, SF))
    assert _rows(published_oof_encodings(cust, snaps)) == batch
    # a straddled customer's count really is the sum of its partials
    from etl_pipeline_orchestration_spark.plans.ml_analytics import (
        customer_order_counts,
    )

    want = _rows(customer_order_counts(load_table(spark, SF, "orders")))
    assert _rows(snaps.read()) == want


def test_streamed_encodings_equal_batch_reversed(spark, rev_dir, tmp_path):
    snaps = _drain(spark, rev_dir, tmp_path)
    cust = load_table(spark, SF, "customer")
    batch = _rows(registry.QUERIES["target_encode_oof"](spark, SF))
    assert _rows(published_oof_encodings(cust, snaps)) == batch


def test_merge_laws_and_replay_guard(spark, tmp_path):
    from etl_pipeline_orchestration_spark.plans.ml_analytics import (
        customer_order_counts,
    )

    orders = load_table(spark, SF, "orders")
    a = customer_order_counts(orders.filter("o_orderkey % 2 = 0"))
    b = customer_order_counts(orders.filter("o_orderkey % 2 = 1"))
    assert _rows(merge_counts(a, b)) == _rows(customer_order_counts(orders))

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "cc")
    small = orders.limit(60)
    assert counts_batch(snaps, small, 0, "ck") is True
    before = _rows(snaps.read())
    assert counts_batch(snaps, small, 0, "ck") is False
    assert _rows(snaps.read()) == before
    assert counts_batch(snaps, small, 1, "ck") is True
    doubled = {k[0]: k[1] for k in _rows(snaps.read())}
    assert doubled == {k[0]: 2 * k[1] for k in before}
