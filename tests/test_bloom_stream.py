"""Streaming ingest with riding bloom maintenance
(streaming/bloom_stream.py): lookups through the continuously-
maintained sidecar equal full scans, replays don't double-append, and
the append-without-refresh crash window heals fail-safe."""

from __future__ import annotations

import os
import shutil

import pytest

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import WarehouseLoader
from etl_pipeline_orchestration_spark.operators import bloom_index
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.bloom_stream import (
    append_batch_with_bloom,
    stream_ingest_with_bloom,
)
from etl_pipeline_orchestration_spark.streaming.events_stream import (
    read_events_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _events_with_day(spark):
    return load_table(spark, SF_DIR, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )


def _write_chunks(spark, df, src, n_chunks=3):
    from pyspark.sql import Window as W

    os.makedirs(src, exist_ok=True)
    n = df.count()
    ranked = df.withColumn("rn", F.row_number().over(W.orderBy("event_id")))
    base = 1_800_000_000
    for i in range(n_chunks):
        lo, hi = i * n // n_chunks, (i + 1) * n // n_chunks
        cdir = src + f"__c{i}"
        ranked.filter((F.col("rn") > lo) & (F.col("rn") <= hi)).drop(
            "rn"
        ).coalesce(1).write.mode("overwrite").parquet(cdir)
        cf = [f for f in os.listdir(cdir) if f.endswith(".parquet")][0]
        dst = os.path.join(src, f"chunk{i}.parquet")
        shutil.copyfile(os.path.join(cdir, cf), dst)
        os.utime(dst, (base + i, base + i))


def test_streamed_index_serves_correct_lookups(spark, tmp_path):
    ev = _events_with_day(spark).filter(F.col("user_id") % 20 == 0)
    src = str(tmp_path / "src")
    _write_chunks(spark, ev.drop("day"), src)
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_events_stream(spark, src, max_files_per_trigger=1).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    stream_ingest_with_bloom(
        stream, loader, "ev_t", "ev_bloom", "user_id", "day",
        str(tmp_path / "ckpt"),
    )
    df = spark.read.parquet(loader._path("ev_t")).drop("ingest_batch")
    assert df.count() == ev.count()
    fp = bloom_index.table_fingerprint(df, "user_id", "day")
    for k in [r.user_id for r in ev.select("user_id").distinct().limit(8).collect()]:
        got = sorted(
            r.event_id
            for r in bloom_index.lookup(
                spark, loader, "ev_t", "ev_bloom", "user_id", "day", k,
                expect_fingerprint=fp,
            ).collect()
        )
        want = sorted(
            r.event_id for r in ev.filter(F.col("user_id") == k).collect()
        )
        assert got == want and len(want) > 0


def test_replay_skips_append_but_refreshes(spark, tmp_path):
    ev = _events_with_day(spark).filter(F.col("user_id") % 20 == 0)
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    assert append_batch_with_bloom(loader, "t", "t_b", b0, 0, "user_id", "day")
    n_after_first = spark.read.parquet(loader._path("t")).count()
    # replay of batch 0: append skipped, no duplicate rows
    assert not append_batch_with_bloom(loader, "t", "t_b", b0, 0, "user_id", "day")
    assert spark.read.parquet(loader._path("t")).count() == n_after_first


def test_crash_window_fails_safe_then_heals(spark, tmp_path):
    """Simulate a crash AFTER the batch-1 append completed (done
    marker written), BEFORE its refresh: the fingerprint-checked
    lookup must refuse (stale sidecar), and the checkpoint-style
    replay of batch 1 skips the append and heals the sidecar."""
    import os

    from etl_pipeline_orchestration_spark.streaming.bloom_stream import (
        _done_marker,
    )

    ev = _events_with_day(spark).filter(F.col("user_id") % 20 == 0)
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)
    append_batch_with_bloom(loader, "t", "t_b", b0, 0, "user_id", "day")
    # crash half: batch 1's append completed (data + done marker) but
    # the refresh never ran
    root = loader._path("t")
    (
        b1.withColumn("ingest_batch", F.lit(1))
        .write.mode("append").partitionBy("day", "ingest_batch")
        .parquet(root)
    )
    os.makedirs(os.path.dirname(_done_marker(root, 1)), exist_ok=True)
    open(_done_marker(root, 1), "w").write("done")
    df = spark.read.parquet(root).drop("ingest_batch")
    fp_now = bloom_index.table_fingerprint(df, "user_id", "day")
    k = b1.select("user_id").head()[0]
    with pytest.raises(ValueError, match="stale bloom"):
        bloom_index.lookup(
            spark, loader, "t", "t_b", "user_id", "day", k,
            expect_fingerprint=fp_now,
        )
    # replay batch 1: append skipped (marker present), refresh heals
    assert not append_batch_with_bloom(loader, "t", "t_b", b1, 1, "user_id", "day")
    got = sorted(
        r.event_id
        for r in bloom_index.lookup(
            spark, loader, "t", "t_b", "user_id", "day", k,
            expect_fingerprint=fp_now,
        ).collect()
    )
    want = sorted(r.event_id for r in ev.filter(F.col("user_id") == k).collect())
    assert got == want


def test_partial_commit_replay_reappends_cleanly(spark, tmp_path):
    """A mid-commit crash leaves SOME ingest_batch dirs but no done
    marker: the replay must remove the partials and re-append the FULL
    batch — no lost partitions, no duplicate rows."""
    ev = _events_with_day(spark).filter(F.col("user_id") % 20 == 0)
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    b0 = ev.filter(F.col("event_id") % 2 == 0)
    b1 = ev.filter(F.col("event_id") % 2 == 1)
    append_batch_with_bloom(loader, "t", "t_b", b0, 0, "user_id", "day")
    # crash half: only ONE of batch 1's partitions got committed, and
    # no done marker was written
    days = sorted(r.day for r in b1.select("day").distinct().collect())
    assert len(days) >= 2, "fixture needs multiple touched partitions"
    partial = b1.filter(F.col("day") == days[0])
    (
        partial.withColumn("ingest_batch", F.lit(1))
        .write.mode("append").partitionBy("day", "ingest_batch")
        .parquet(loader._path("t"))
    )
    # replay: partial removed, full batch appended
    assert append_batch_with_bloom(loader, "t", "t_b", b1, 1, "user_id", "day")
    df = spark.read.parquet(loader._path("t")).drop("ingest_batch")
    assert df.count() == ev.count()  # nothing lost, nothing doubled
    fp = bloom_index.table_fingerprint(df, "user_id", "day")
    k = b1.filter(F.col("day") == days[1]).select("user_id").head()[0]
    got = sorted(
        r.event_id
        for r in bloom_index.lookup(
            spark, loader, "t", "t_b", "user_id", "day", k,
            expect_fingerprint=fp,
        ).collect()
    )
    want = sorted(r.event_id for r in ev.filter(F.col("user_id") == k).collect())
    assert got == want and len(want) > 0
