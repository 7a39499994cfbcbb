from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_count_distinct_within_tolerance(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
            F.countDistinct("l_orderkey").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.02
