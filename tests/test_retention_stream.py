"""Streaming retention-cohort maintenance: the published matrix must
equal the one-shot batch query under BOTH in-order and reversed file
arrival. Chunks are DATE-ordered, so reversed arrival delivers the
latest months first — every customer is initially mis-cohorted to a
late month and must be re-cohorted when the earlier orders land, the
exact failure a mergeable-looking (cohort, month) count would hide."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans import registry
from etl_pipeline_orchestration_spark.streaming.retention_stream import (
    merge_activity_batch,
    published_retention,
    read_orders_stream,
    stream_retention_to_warehouse,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _chunked_orders_dir(tmp_path_factory, reverse: bool) -> str:
    name = "ret_rev" if reverse else "ret_fwd"
    d = str(tmp_path_factory.mktemp(name))
    t = pq.read_table(f"{SF}/orders.parquet")
    # date-ordered chunks: reversed arrival = latest months first
    idx = sorted(
        range(t.num_rows),
        key=lambda i: (str(t["o_orderdate"][i]), t["o_orderkey"][i].as_py()),
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
    return _chunked_orders_dir(tmp_path_factory, reverse=False)


@pytest.fixture(scope="module")
def rev_dir(tmp_path_factory):
    return _chunked_orders_dir(tmp_path_factory, reverse=True)


def _drain(spark, orders_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_orders_stream(spark, orders_dir, max_files_per_trigger=1)
    return stream_retention_to_warehouse(
        stream, loader, "activity_state", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_matrix_equals_batch_in_order(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    assert len(snaps.versions()) == 4
    batch = _rows(registry.QUERIES["retention_cohort_matrix"](spark, SF))
    assert _rows(published_retention(spark, snaps)) == batch


def test_streamed_matrix_equals_batch_reversed_arrival(
    spark, rev_dir, tmp_path
):
    snaps = _drain(spark, rev_dir, tmp_path)
    batch = _rows(registry.QUERIES["retention_cohort_matrix"](spark, SF))
    assert _rows(published_retention(spark, snaps)) == batch


def test_reversed_first_batch_miscohorts_then_heals(spark, rev_dir, tmp_path):
    """After only the LAST date chunk, cohorts are provably wrong
    (every cohort month is late); the full drain heals them — pins that
    the state really re-derives cohorts rather than freezing them."""
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "activity_state")
    first_file = sorted(os.listdir(rev_dir))[0]
    batch = spark.read.parquet(os.path.join(rev_dir, first_file))
    assert merge_activity_batch(snaps, batch, 0, "app") is True
    early_min = min(
        r.cohort_m for r in published_retention(spark, snaps).collect()
    )
    full_min = min(
        r.cohort_m
        for r in registry.QUERIES["retention_cohort_matrix"](
            spark, SF
        ).collect()
    )
    assert early_min > full_min  # latest-months-first => late cohorts


def test_merge_skips_replayed_batch(spark, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "activity_state")
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    batch = load_table(spark, SF, "orders")
    assert merge_activity_batch(snaps, batch, 0, "app") is True
    before = _rows(snaps.read())
    assert merge_activity_batch(snaps, batch, 0, "app") is False
    assert _rows(snaps.read()) == before
    # a genuinely new batch with the same rows is a no-op on the SET
    assert merge_activity_batch(snaps, batch, 1, "app") is True
    assert _rows(snaps.read()) == before


def test_stored_state_is_customer_month_bounded(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    stored = snaps.read()
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert stored.count() < n_orders  # set grain, not order grain
    assert stored.count() == stored.distinct().count()
