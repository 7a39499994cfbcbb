"""Distributed exact global rank (operators/ranking.py) — differential
tests against Spark's own unpartitioned window functions, which are the
ground truth for ntile / percent_rank semantics, plus plan-shape
assertions that the rewired queries contain no single-partition
exchange (the whole point of the operator)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.operators import ranking


def _mkdf(spark, n, dup_every=0):
    """n rows with a pseudo-random non-null numeric key (deterministic:
    xxhash64 of the id) and unique id tiebreak; dup_every>0 plants tied
    keys to exercise equal-keys-share-a-bucket."""
    df = spark.range(n).select(
        F.col("id"),
        (F.xxhash64(F.col("id")) % 1000).alias("k"),
    )
    if dup_every:
        df = df.withColumn(
            "k", F.when(F.col("id") % dup_every == 0, F.lit(7)).otherwise(F.col("k"))
        )
    return df


@pytest.mark.parametrize(
    "n,k,desc,dup",
    [
        (10, 4, False, 0),   # rem=2 — uneven tiles
        (97, 8, False, 3),   # rem=1, many ties
        (100, 7, True, 0),   # descending, rem=2
        (3, 5, False, 0),    # k > n (base=0 path)
        (1, 4, False, 0),    # single row
        (256, 4, True, 2),   # descending with ties
    ],
)
def test_ntile_percent_rank_match_spark_window(spark, n, k, desc, dup):
    df = _mkdf(spark, n, dup)
    key = F.col("k").desc() if desc else F.col("k")
    order = [key, F.col("id")]
    ranked, total = ranking.append_global_row_number(
        df, order, F.col("k"), descending=desc, n_buckets=8, out_col="rn"
    )
    assert total == n
    got = ranked.select(
        "id",
        ranking.ntile_from_row_number(F.col("rn"), total, k).alias("t"),
        ranking.percent_rank_from_row_number(F.col("rn"), total).alias("pr"),
        F.col("rn"),
    )
    w = Window.orderBy(*order)
    want = df.select(
        "id",
        F.ntile(k).over(w).alias("t"),
        F.percent_rank().over(w).alias("pr"),
        F.row_number().over(w).cast("bigint").alias("rn"),
    )
    g = {r["id"]: (r["t"], r["pr"], r["rn"]) for r in got.collect()}
    e = {r["id"]: (r["t"], r["pr"], r["rn"]) for r in want.collect()}
    assert g == e


def test_row_number_is_exact_permutation(spark):
    df = _mkdf(spark, 500, dup_every=5)
    ranked, total = ranking.append_global_row_number(
        df, [F.col("k"), F.col("id")], F.col("k"), n_buckets=16, out_col="rn"
    )
    rns = [r["rn"] for r in ranked.select("rn").collect()]
    assert sorted(rns) == list(range(1, 501)) and total == 500


def test_constant_key_degenerates_gracefully(spark):
    """All-equal bucket keys collapse to one bucket (can't be split
    without breaking tie colocation) — still correct, just serial;
    callers pick a higher-cardinality key for balance."""
    df = spark.range(50).select("id", F.lit(1).alias("k"))
    ranked, total = ranking.append_global_row_number(
        df, [F.col("k"), F.col("id")], F.col("k"), out_col="rn"
    )
    rows = {r["id"]: r["rn"] for r in ranked.collect()}
    assert rows == {i: i + 1 for i in range(50)} and total == 50


@pytest.mark.parametrize(
    "qname", ["window_ntile_percent_rank", "rfm_customer_segments"]
)
def test_rewired_queries_have_no_single_partition_exchange(spark, qname):
    import __spark_entry__ as entry

    df = entry.queries()[qname](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_descending_rank_with_nan_keys_matches_spark_window(spark):
    """Spark orders NaN largest (first under desc) — the bucket fold
    alone would misplace NaN rows in descending mode; the isnan pin to
    bucket 0 must keep exact parity with the window ordering."""
    df = spark.range(200).select(
        "id",
        F.when(F.col("id") % 17 == 0, F.lit(float("nan")))
        .otherwise((F.xxhash64("id") % 1000).cast("double"))
        .alias("k"),
    )
    order = [F.col("k").desc(), F.col("id")]
    ranked, total = ranking.append_global_row_number(
        df, order, F.col("k"), descending=True, n_buckets=8, out_col="rn"
    )
    w = Window.orderBy(*order)
    want = {
        r["id"]: r["rn"]
        for r in df.select(
            "id", F.row_number().over(w).cast("bigint").alias("rn")
        ).collect()
    }
    got = {r["id"]: r["rn"] for r in ranked.select("id", "rn").collect()}
    assert got == want and total == 200


def test_null_bucket_key_fails_loudly(spark):
    """A NULL bucketing key would silently fold into bucket 0 while the
    sort puts nulls elsewhere — the count pass must reject it instead
    of letting ranks silently diverge from window semantics."""
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 5.0)], "id bigint, k double"
    )
    with pytest.raises(ValueError, match="NULL"):
        ranking.append_global_row_number(
            df, [F.col("k"), F.col("id")], F.col("k"), n_buckets=4
        )
