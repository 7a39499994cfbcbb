"""Custom Python data source: partition-parallel synthesis must be
deterministic, complete, and actually split across partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.sources.synthetic_source import register


def _read(spark, **opts):
    register(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_source_rowcount_and_determinism(spark):
    df1 = _read(spark, n_rows=1000, n_parts=4, seed=7)
    df2 = _read(spark, n_rows=1000, n_parts=4, seed=7)
    assert df1.count() == 1000
    assert sorted(map(tuple, df1.collect())) == sorted(map(tuple, df2.collect()))
    # event_id must be the complete range (no partition gaps/overlaps)
    ids = sorted(r["event_id"] for r in df1.select("event_id").collect())
    assert ids == list(range(1000))


def test_source_partition_parallelism(spark):
    df = _read(spark, n_rows=1000, n_parts=4, seed=7)
    assert df.rdd.getNumPartitions() == 4


def test_source_feeds_normal_plans(spark):
    """The custom source composes with ordinary DataFrame ops."""
    df = _read(spark, n_rows=2000, n_parts=4, seed=1)
    agg = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r["n"] for r in agg) == 2000
    assert {r["event_type"] for r in agg} == {"view", "click", "purchase"}


def test_synthetic_stream_reader_deterministic_batches(spark, tmp_path):
    """The streaming Python data source must (a) advance offsets by
    rows_per_batch, (b) produce rows identical to a replay from the
    same offsets (exactly-once via determinism)."""
    from etl_pipeline_orchestration_spark.sources.synthetic_source import (
        register,
    )

    register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 50)
        .option("seed", 7)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("synth_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("synth_stream").count() >= 150:
                break
            time.sleep(1)
    finally:
        q.stop()

    rows = spark.table("synth_stream").collect()
    assert len(rows) >= 150
    by_id = {r["event_id"]: (r["event_type"], r["value"]) for r in rows}
    # offsets are contiguous row indices: no gaps, no duplicates
    assert len(by_id) == len(rows)
    assert set(by_id) >= set(range(150))

    # replay determinism: a fresh query from offset 0 regenerates the
    # exact same prefix
    q2 = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 50)
        .option("seed", 7)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream2")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("synth_stream2").count() >= 150:
                break
            time.sleep(1)
    finally:
        q2.stop()
    by_id2 = {
        r["event_id"]: (r["event_type"], r["value"])
        for r in spark.table("synth_stream2").collect()
    }
    for k in range(150):
        assert by_id[k] == by_id2[k]
