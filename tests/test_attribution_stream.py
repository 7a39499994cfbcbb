"""Streaming attribution maintenance: the three published credit
tables (Markov, Shapley, heuristics) must equal the one-shot batch
queries under BOTH in-order and reversed file arrival. Chunks are
TIME-ordered, so journeys straddle chunk boundaries in-order, and
reversed arrival delivers conversions BEFORE the touches that led to
them — the exact failure any journey-grain (non-additive) state would
hide and the event-set union must heal."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans import registry
from etl_pipeline_orchestration_spark.streaming.attribution_stream import (
    merge_journey_state_batch,
    published_attribution_heuristics,
    published_markov_attribution,
    published_shapley_attribution,
    read_events_stream,
    stream_attribution_to_warehouse,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _chunked_events_dir(tmp_path_factory, reverse: bool) -> str:
    name = "attr_rev" if reverse else "attr_fwd"
    d = str(tmp_path_factory.mktemp(name))
    t = pq.read_table(SF + "/events.parquet")
    # time-ordered chunks: in-order arrival splits journeys across
    # batches; reversed arrival delivers conversions first
    idx = sorted(
        range(t.num_rows),
        key=lambda i: (t["ts"][i].value, t["event_id"][i].as_py()),
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
    return _chunked_events_dir(tmp_path_factory, reverse=False)


@pytest.fixture(scope="module")
def rev_dir(tmp_path_factory):
    return _chunked_events_dir(tmp_path_factory, reverse=True)


def _drain(spark, events_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    return stream_attribution_to_warehouse(
        stream, loader, "journey_state", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _batch_tables(spark):
    return (
        _rows(registry.QUERIES["markov_attribution_events"](spark, SF)),
        _rows(registry.QUERIES["shapley_attribution_events"](spark, SF)),
        _rows(registry.QUERIES["attribution_heuristics_events"](spark, SF)),
    )


def test_streamed_attribution_equals_batch_in_order(spark, fwd_dir, tmp_path):
    snaps = _drain(spark, fwd_dir, tmp_path)
    assert len(snaps.versions()) == 4
    mk, sh, he = _batch_tables(spark)
    assert _rows(published_markov_attribution(spark, snaps)) == mk
    assert _rows(published_shapley_attribution(spark, snaps)) == sh
    assert _rows(published_attribution_heuristics(spark, snaps)) == he


def test_streamed_attribution_equals_batch_reversed_arrival(
    spark, rev_dir, tmp_path
):
    snaps = _drain(spark, rev_dir, tmp_path)
    mk, sh, he = _batch_tables(spark)
    assert _rows(published_markov_attribution(spark, snaps)) == mk
    assert _rows(published_shapley_attribution(spark, snaps)) == sh
    assert _rows(published_attribution_heuristics(spark, snaps)) == he


def test_partial_reversed_state_miscredits_then_heals(
    spark, rev_dir, tmp_path
):
    """After only the LATEST time chunk, credits are computed from
    orphaned journey tails (conversions without their touches); the
    full drain heals them — pins that the publishers re-derive journey
    cuts from state rather than freezing per-batch credits."""
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "journey_state")
    first_file = sorted(os.listdir(rev_dir))[0]
    batch = spark.read.parquet(os.path.join(rev_dir, first_file))
    assert merge_journey_state_batch(snaps, batch, 0, "app") is True
    partial = _rows(published_attribution_heuristics(spark, snaps))
    _, _, full = _batch_tables(spark)
    assert partial != full  # provably wrong on a journey prefix
    for i, f in enumerate(sorted(os.listdir(rev_dir))[1:], start=1):
        b = spark.read.parquet(os.path.join(rev_dir, f))
        assert merge_journey_state_batch(snaps, b, i, "app") is True
    assert _rows(published_attribution_heuristics(spark, snaps)) == full


def test_replay_skip_and_redelivery_dedup(spark, fwd_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "journey_state")
    first_file = sorted(os.listdir(fwd_dir))[0]
    batch = spark.read.parquet(os.path.join(fwd_dir, first_file))
    assert merge_journey_state_batch(snaps, batch, 0, "app") is True
    n1 = snaps.read().count()
    # checkpoint replay of the same batch id is a no-op
    assert merge_journey_state_batch(snaps, batch, 0, "app") is False
    assert snaps.read().count() == n1
    # a re-delivered file under a NEW batch id must not double-count
    assert merge_journey_state_batch(snaps, batch, 1, "app") is True
    assert snaps.read().count() == n1
