"""Streaming decision-tree maintenance (streaming/dtree_stream.py):
the contingency-table state is a lossless additive sufficient
statistic, so the streamed cells — and the splits trained from them —
must equal a from-scratch batch run on the whole history bit-for-bit
under BOTH arrival orders; sum-merge is not replay-idempotent, so the
applied-upto skip is pinned as correctness."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.ml_analytics import (
    dtree_splits_from_cells,
    order_feature_cells,
)
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.dtree_stream import (
    cells_batch,
    merge_cells,
    published_tree_splits,
    read_orders_stream,
    stream_tree_cells_to_warehouse,
)

SF = "/root/testdata/sf0.001"


def _chunked_orders_dir(tmp_path_factory, order) -> str:
    d = str(tmp_path_factory.mktemp(f"dt_{''.join(map(str, order))}"))
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
    return _chunked_orders_dir(tmp_path_factory, (3, 1, 0, 2))


def _drain(spark, orders_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_orders_stream(spark, orders_dir, max_files_per_trigger=1)
    return stream_tree_cells_to_warehouse(
        stream, loader, "tree_cells", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_cells_and_splits_equal_batch(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    assert len(snaps.versions()) == 4
    orders = load_table(spark, SF, "orders")
    want_cells = _rows(order_feature_cells(orders))
    assert _rows(snaps.read()) == want_cells
    # state is domain-bounded: 8 bands x 12 months x 5 prios x 7 years
    # x 2 labels, regardless of rows drained
    assert len(want_cells) <= 8 * 12 * 5 * 7 * 2
    want_splits = _rows(dtree_splits_from_cells(order_feature_cells(orders)))
    assert len(want_splits) >= 2  # root + at least one child split
    assert _rows(published_tree_splits(spark, snaps)) == want_splits


def test_streamed_splits_arrival_order_free(spark, rev_dir, tmp_path):
    snaps = _drain(spark, rev_dir, tmp_path)
    orders = load_table(spark, SF, "orders")
    assert _rows(snaps.read()) == _rows(order_feature_cells(orders))
    assert _rows(published_tree_splits(spark, snaps)) == _rows(
        dtree_splits_from_cells(order_feature_cells(orders))
    )


def test_cells_split_matches_rowlevel_training(spark):
    """The cells-derived tree must equal row-level histogram training
    on the SAME feature frame — the sufficient-statistic claim, pinned
    against the independent row-based code path."""
    from pyspark.sql import functions as F

    from etl_pipeline_orchestration_spark.plans.ml_analytics import (
        _dtree_best_splits,
    )

    orders = load_table(spark, SF, "orders")
    rowframe = orders.select(
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
        F.least(F.floor(F.col("o_totalprice") / 25000), F.lit(7))
        .cast("bigint")
        .alias("f_band"),
        F.month("o_orderdate").cast("bigint").alias("f_month"),
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("f_prio"),
        (F.year("o_orderdate") - 1992).cast("bigint").alias("f_year"),
    )

    def unpivot(node_col):
        feats = ("f_band", "f_month", "f_prio", "f_year")
        stack = ", ".join(f"'{f}', {f}" for f in feats)
        return rowframe.select(
            node_col.cast("bigint").alias("node"), "y", *feats
        ).selectExpr("node", "y", f"stack(4, {stack}) AS (f, v)")

    b0 = _dtree_best_splits(unpivot(F.lit(0))).head()
    side = F.when(
        F.col(b0["feature"]) <= F.lit(int(b0["threshold"])), F.lit(1)
    ).otherwise(F.lit(2))
    want = [tuple(b0)] + sorted(
        tuple(r) for r in _dtree_best_splits(unpivot(side)).collect()
    )
    got_df = dtree_splits_from_cells(order_feature_cells(orders))
    got_rows = got_df.collect()
    got = [tuple(r) for r in got_rows if r["node"] == 0] + sorted(
        tuple(r) for r in got_rows if r["node"] != 0
    )
    assert got == want


def test_merge_laws_and_replay_guard(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    a = order_feature_cells(orders.filter("o_orderkey % 2 = 0"))
    b = order_feature_cells(orders.filter("o_orderkey % 2 = 1"))
    assert _rows(merge_cells(a, b)) == _rows(order_feature_cells(orders))

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "tc")
    small = orders.limit(50)
    assert cells_batch(snaps, small, 0, "ck") is True
    before = _rows(snaps.read())
    # replayed batch id: skipped, state unchanged (sum-merge is NOT
    # idempotent — without the skip every count doubles)
    assert cells_batch(snaps, small, 0, "ck") is False
    assert _rows(snaps.read()) == before
    # same rows under a NEW batch id DO double the counts (additive)
    assert cells_batch(snaps, small, 1, "ck") is True
    doubled = {k[:-1]: k[-1] for k in _rows(snaps.read())}
    base = {k[:-1]: k[-1] for k in before}
    assert doubled == {k: 2 * v for k, v in base.items()}
