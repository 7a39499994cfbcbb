"""Streaming GBT maintenance (streaming/gbt_stream.py): the per-cell
(count, target-sum) state is a lossless additive sufficient statistic
for squared-loss stump boosting — stumps split on features only, so
residuals are cell-constant — and therefore the streamed cells AND the
stump sequence trained from them must equal a from-scratch batch run
on the whole history bit-for-bit under BOTH arrival orders; sum-merge
is not replay-idempotent, so the applied-upto skip is pinned as
correctness."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.ml_analytics import (
    gbt_stumps_from_cells,
    order_gbt_cells,
)
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.gbt_stream import (
    gbt_cells_batch,
    merge_gbt_cells,
    published_gbt_stumps,
    read_orders_stream,
    stream_gbt_cells_to_warehouse,
)

SF = "/root/testdata/sf0.001"


def _chunked_orders_dir(tmp_path_factory, order) -> str:
    d = str(tmp_path_factory.mktemp(f"gbt_{''.join(map(str, order))}"))
    t = pq.read_table(f"{SF}/orders.parquet")
    idx = sorted(range(t.num_rows), key=lambda i: t["o_orderkey"][i].as_py())
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
    return _chunked_orders_dir(tmp_path_factory, (2, 0, 3, 1))


def _drain(spark, orders_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_orders_stream(spark, orders_dir, max_files_per_trigger=1)
    return stream_gbt_cells_to_warehouse(
        stream, loader, "gbt_cells", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_cells_and_stumps_equal_batch(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    assert len(snaps.versions()) == 4
    orders = load_table(spark, SF, "orders")
    want_cells = _rows(order_gbt_cells(orders))
    assert _rows(snaps.read()) == want_cells
    # state is domain-bounded: 8 bands x 12 months x 5 prios x 7 years,
    # regardless of rows drained
    assert len(want_cells) <= 8 * 12 * 5 * 7
    want_stumps = _rows(gbt_stumps_from_cells(order_gbt_cells(orders)))
    assert len(want_stumps) == 3  # _GBT_ROUNDS
    assert _rows(published_gbt_stumps(spark, snaps)) == want_stumps


def test_streamed_stumps_arrival_order_free(spark, rev_dir, tmp_path):
    snaps = _drain(spark, rev_dir, tmp_path)
    orders = load_table(spark, SF, "orders")
    assert _rows(snaps.read()) == _rows(order_gbt_cells(orders))
    assert _rows(published_gbt_stumps(spark, snaps)) == _rows(
        gbt_stumps_from_cells(order_gbt_cells(orders))
    )


def test_cells_stumps_match_rowlevel_training(spark):
    """The cells-derived stump sequence must equal row-level histogram
    boosting on the SAME feature frame — the sufficient-statistic
    claim, pinned against the independent row-based code path
    (_gbt_train_from). The row path's stack is hard-wired to
    _GBT_FEATURES, so the price band rides in under the f_items column
    name; relative alphabetical position is identical (both sort first),
    so tie-breaks agree and only the label needs mapping back."""
    from pyspark.sql import functions as F

    from etl_pipeline_orchestration_spark.plans.ml_analytics import (
        _gbt_train_from,
    )

    orders = load_table(spark, SF, "orders")
    rowframe = orders.select(
        F.expr(
            "cast(cast(o_totalprice as decimal(18,2)) * 100 as bigint)"
            " div 100"
        ).alias("y"),
        F.least(F.floor(F.col("o_totalprice") / 25000), F.lit(7))
        .cast("bigint")
        .alias("f_items"),  # band under the row path's column name
        F.month("o_orderdate").cast("bigint").alias("f_month"),
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("f_prio"),
        (F.year("o_orderdate") - 1992).cast("bigint").alias("f_year"),
    )
    _, _, stumps, _ = _gbt_train_from(rowframe)
    rename = {"f_items": "f_band"}
    want = [
        (
            t + 1,
            rename.get(b["feature"], b["feature"]),
            int(b["threshold"]),
            int(b["gain_q"]),
            int(b["n_left"]),
            int(b["n_right"]),
            int(b["left_value"]),
            int(b["right_value"]),
        )
        for t, b in enumerate(stumps)
    ]
    got = [tuple(r) for r in gbt_stumps_from_cells(
        order_gbt_cells(orders)
    ).orderBy("round").collect()]
    assert got == want


def test_merge_laws_and_replay_guard(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    a = order_gbt_cells(orders.filter("o_orderkey % 2 = 0"))
    b = order_gbt_cells(orders.filter("o_orderkey % 2 = 1"))
    assert _rows(merge_gbt_cells(a, b)) == _rows(order_gbt_cells(orders))

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "gc")
    small = orders.limit(50)
    assert gbt_cells_batch(snaps, small, 0, "ck") is True
    before = _rows(snaps.read())
    # replayed batch id: skipped, state unchanged (sum-merge is NOT
    # idempotent — without the skip every count AND sum doubles)
    assert gbt_cells_batch(snaps, small, 0, "ck") is False
    assert _rows(snaps.read()) == before
    # same rows under a NEW batch id DO double both n and sy (additive)
    assert gbt_cells_batch(snaps, small, 1, "ck") is True
    doubled = {k[:4]: k[4:] for k in _rows(snaps.read())}
    base = {k[:4]: k[4:] for k in before}
    assert doubled == {k: (2 * n, 2 * sy) for k, (n, sy) in base.items()}
