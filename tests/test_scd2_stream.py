"""Streaming SCD2 dimension maintenance (streaming/scd2_stream.py):
the maintained history table must equal the batch interval query over
all data seen so far — under ANY arrival order, because intervals
derive from event time (unlike last-write-wins upsert, no sequence
caveat exists to get wrong)."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.events_stream import (
    read_events_stream,
)
from etl_pipeline_orchestration_spark.streaming.scd2_stream import (
    read_history,
    scd2_apply_batch,
    stream_scd2_snapshots,
)

SF_DIR = "/root/testdata/sf0.001"


def _batch_twin(ev):
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


@pytest.fixture()
def sample_events(spark):
    return load_table(spark, SF_DIR, "events").filter(
        F.col("user_id") % 50 == 0
    )


def _write_chunks(spark, df, src, order_col, n_chunks=3, reverse=False):
    """n_chunks single-file chunks ordered by ``order_col``; mtimes
    ascending in the given (possibly reversed) chunk order."""
    from pyspark.sql import Window as W

    os.makedirs(src, exist_ok=True)
    n = df.count()
    ranked = df.withColumn(
        "rn", F.row_number().over(W.orderBy(order_col, "event_id"))
    )
    order = list(range(n_chunks))
    if reverse:
        order = order[::-1]
    base = 1_700_000_000
    for slot, i in enumerate(order):
        lo, hi = i * n // n_chunks, (i + 1) * n // n_chunks
        cdir = src + f"__c{i}"
        ranked.filter((F.col("rn") > lo) & (F.col("rn") <= hi)).drop(
            "rn"
        ).coalesce(1).write.mode("overwrite").parquet(cdir)
        cf = [f for f in os.listdir(cdir) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"chunk{slot}.parquet")
        shutil.copyfile(os.path.join(cdir, cf), dst)
        os.utime(dst, (base + slot, base + slot))


def test_stream_equals_batch_in_order(spark, tmp_path, sample_events):
    src = str(tmp_path / "src")
    _write_chunks(spark, sample_events, src, "ts")
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = stream_scd2_snapshots(
        read_events_stream(spark, src, max_files_per_trigger=1),
        loader,
        "scd2_hist",
        str(tmp_path / "ckpt"),
    )
    got = _rows(read_history(snaps))
    want = _rows(_batch_twin(sample_events))
    assert len(want) > 0
    assert got == want


def test_stream_equals_batch_out_of_order(spark, tmp_path, sample_events):
    """REVERSED chunk arrival: later event-time chunks land first, so
    every subsequent batch inserts into the MIDDLE/HEAD of stored
    timelines — the recompute must split intervals, not append."""
    src = str(tmp_path / "src")
    _write_chunks(spark, sample_events, src, "ts", reverse=True)
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = stream_scd2_snapshots(
        read_events_stream(spark, src, max_files_per_trigger=1),
        loader,
        "scd2_hist",
        str(tmp_path / "ckpt"),
    )
    assert _rows(read_history(snaps)) == _rows(_batch_twin(sample_events))


def test_replay_skip_and_idempotence(spark, tmp_path, sample_events):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "scd2_hist")
    b0 = sample_events.filter(F.col("event_id") % 2 == 0)
    b1 = sample_events.filter(F.col("event_id") % 2 == 1)
    assert scd2_apply_batch(snaps, b0, 0, "app")
    v_after_0 = snaps.current_version()
    assert not scd2_apply_batch(snaps, b0, 0, "app")  # replay skipped
    assert snaps.current_version() == v_after_0
    assert scd2_apply_batch(snaps, b1, 1, "app")
    assert _rows(read_history(snaps)) == _rows(_batch_twin(sample_events))


def test_history_is_time_travelable(spark, tmp_path, sample_events):
    """read(version=k) is the dimension history as of batch k: after
    batch 0 it equals the batch twin over batch-0 rows alone."""
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "scd2_hist")
    b0 = sample_events.filter(F.col("ts") < F.lit("2024-01-15"))
    b1 = sample_events.filter(F.col("ts") >= F.lit("2024-01-15"))
    scd2_apply_batch(snaps, b0, 0, "app")
    v0 = snaps.current_version()
    scd2_apply_batch(snaps, b1, 1, "app")
    assert _rows(read_history(snaps, version=v0)) == _rows(_batch_twin(b0))
    assert _rows(read_history(snaps)) == _rows(_batch_twin(sample_events))


def test_untouched_keys_copied_through(spark, tmp_path, sample_events):
    """A batch touching ONE key must not rewrite other keys' rows
    (affected-keys discipline): their interval rows survive verbatim."""
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "scd2_hist")
    scd2_apply_batch(snaps, sample_events, 0, "app")
    keys = [r.user_id for r in sample_events.select("user_id").distinct().collect()]
    k0 = keys[0]
    before = _rows(read_history(snaps).filter(F.col("user_id") != k0))
    one = sample_events.filter(F.col("user_id") == k0).limit(1).select(
        "user_id",
        (F.col("ts") + F.expr("INTERVAL 400 DAYS")).alias("ts"),
        (F.col("event_id") + 10_000_000).alias("event_id"),
        "event_type",
        "value",
        "props",
    )
    scd2_apply_batch(snaps, one, 1, "app")
    after = _rows(read_history(snaps).filter(F.col("user_id") != k0))
    assert after == before
    cur_k0 = read_history(snaps).filter(
        (F.col("user_id") == k0) & F.col("is_current")
    ).collect()
    assert len(cur_k0) == 1 and cur_k0[0].valid_from.year >= 2025
