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
