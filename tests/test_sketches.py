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


def test_approx_quantile_sketch_within_tolerance(spark):
    """GK sketch at accuracy 10000 must land within 0.1% RANK error of
    the exact quantile — checked by value against exact percentile."""
    orders = load_table(spark, SF_DIR, "orders")
    approx = (
        orders.agg(
            F.expr(
                "approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)"
            ).alias("qs")
        ).head()["qs"]
    )
    for p, a in zip((0.5, 0.9, 0.99), approx):
        lo, hi = (
            orders.agg(
                F.expr(f"percentile(o_totalprice, {max(p - 0.002, 0)})").alias("lo"),
                F.expr(f"percentile(o_totalprice, {min(p + 0.002, 1)})").alias("hi"),
            ).head()
        )
        assert lo <= a <= hi, (p, a, lo, hi)
