"""Streaming Bradley-Terry maintenance: the published rating table must
equal the one-shot batch query under BOTH in-order and reversed file
arrival — with chunk boundaries deliberately SPLITTING orders across
micro-batches (the quantity partials must merge at order grain before
any duel is decided) — and the additive merge must be replay-safe."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans import registry
from etl_pipeline_orchestration_spark.streaming.preference_stream import (
    merge_duel_state_batch,
    published_bradley_terry,
    read_lineitem_stream,
    stream_preferences_to_warehouse,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _chunked_lineitem_dir(tmp_path_factory, reverse: bool) -> str:
    """lineitem.parquet split into 4 orderkey-sorted chunks with
    controlled mtimes; chunk boundaries fall mid-order (the row count
    is not a multiple of lines-per-order), so quantity partials for a
    boundary order arrive in TWO batches. ``reverse=True`` makes the
    later key range arrive first."""
    name = "pref_rev" if reverse else "pref_fwd"
    d = str(tmp_path_factory.mktemp(name))
    t = pq.read_table(f"{SF}/lineitem.parquet")
    idx = sorted(
        range(t.num_rows),
        key=lambda i: (t["l_orderkey"][i].as_py(), i),
    )
    per = (len(idx) + 3) // 4 + 1  # +1 so boundaries straddle orders
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


def _part(spark):
    return spark.read.parquet(f"{SF}/part.parquet")


def _drain(spark, lineitem_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_lineitem_stream(spark, lineitem_dir, max_files_per_trigger=1)
    return stream_preferences_to_warehouse(
        stream, _part(spark), loader, "duel_state", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_ratings_equal_batch_in_order(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    assert len(snaps.versions()) == 4  # one merge per file
    batch = _rows(registry.QUERIES["bradley_terry_brand_prefs"](spark, SF))
    assert _rows(published_bradley_terry(spark, snaps)) == batch


def test_streamed_ratings_equal_batch_reversed_arrival(
    spark, rev_dir, tmp_path
):
    snaps = _drain(spark, rev_dir, tmp_path)
    batch = _rows(registry.QUERIES["bradley_terry_brand_prefs"](spark, SF))
    assert _rows(published_bradley_terry(spark, snaps)) == batch


def test_additive_merge_skips_replayed_batch(spark, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "duel_state")
    batch = spark.read.parquet(f"{SF}/lineitem.parquet")
    part = _part(spark)
    assert merge_duel_state_batch(snaps, batch, part, 0, "app") is True
    before = _rows(snaps.read())
    assert merge_duel_state_batch(snaps, batch, part, 0, "app") is False
    assert _rows(snaps.read()) == before
    assert merge_duel_state_batch(snaps, batch, part, 1, "app") is True
    after = {(r[0], r[1]): r[2] for r in _rows(snaps.read())}
    assert all(after[(o, b)] == 2 * q for o, b, q in before)


def test_stored_state_is_order_brand_grain(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    stored = snaps.read()
    n_orders = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_orderkey")
        .distinct()
        .count()
    )
    # brands-per-order is bounded by lines-per-order (~4): state is a
    # small constant factor of the order count, not the line count
    assert stored.count() <= 4 * n_orders
    assert stored.groupBy("l_orderkey", "brand").count().filter(
        "count > 1"
    ).count() == 0
