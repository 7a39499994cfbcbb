"""Exact-N mixture sampling: Hamilton allocation properties and the
two-phase (histogram-threshold) selection's equality with the naive
per-stratum rank."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.operators.sampling import (
    bucket_of,
    exact_allocation,
    stratified_sample_exact,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_allocation_sums_exactly_to_n(spark, docs):
    for n in (1, 7, 200, 499, 500):
        alloc = {r["stratum"]: r["alloc_n"]
                 for r in exact_allocation(docs, "lang", n).collect()}
        assert sum(alloc.values()) == n
    # quota monotonicity: no stratum deviates from its real quota by >= 1
    rows = exact_allocation(docs, "lang", 200).collect()
    total = sum(r["n_rows"] for r in rows)
    for r in rows:
        exact_quota = 200 * r["n_rows"] / total
        assert abs(r["alloc_n"] - exact_quota) < 1.0


def test_two_phase_select_equals_naive_rank(spark, docs):
    """The histogram-threshold path must produce EXACTLY the naive
    per-stratum (bucket, id) top-alloc — same relation, cheaper sort."""
    got = {
        (r["doc_id"], r["stratum"], r["bucket"], r["rk"])
        for r in stratified_sample_exact(docs, "lang", 200).collect()
    }
    alloc = exact_allocation(docs, "lang", 200).select("stratum", "alloc_n")
    rows = docs.select(
        "doc_id",
        F.col("lang").alias("stratum"),
        bucket_of(F.col("doc_id")).cast("bigint").alias("bucket"),
    )
    w = Window.partitionBy("stratum").orderBy("bucket", "doc_id")
    naive = (
        rows.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .join(alloc, "stratum")
        .filter(F.col("rk") <= F.col("alloc_n"))
    )
    want = {
        (r["doc_id"], r["stratum"], r["bucket"], r["rk"])
        for r in naive.collect()
    }
    assert got == want
    assert len(got) == 200


def test_sample_is_deterministic_and_per_stratum_exact(spark, docs):
    a = stratified_sample_exact(docs, "lang", 100)
    b = stratified_sample_exact(docs, "lang", 100)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb
    per = {r["stratum"]: r["alloc_n"]
           for r in exact_allocation(docs, "lang", 100).collect()}
    from collections import Counter
    got = Counter(r[1] for r in ra)
    assert dict(got) == {k: v for k, v in per.items() if v > 0}


def test_over_allocation_raises_instead_of_underdelivering(spark):
    from etl_pipeline_orchestration_spark.operators.sampling import (
        exact_allocation,
        stratified_sample_exact,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "fr") for i in range(9)],
        "doc_id bigint, lang string",
    )
    with pytest.raises(ValueError, match="exceeds the corpus row count"):
        exact_allocation(docs, "lang", total_n=10)
    with pytest.raises(ValueError, match="exceeds the corpus row count"):
        stratified_sample_exact(docs, "lang", total_n=100)
    # the boundary N == T delivers every row
    assert stratified_sample_exact(docs, "lang", total_n=9).count() == 9


def test_empty_corpus_zero_n_is_a_noop_not_an_error(spark):
    from etl_pipeline_orchestration_spark.operators.sampling import (
        exact_allocation,
    )

    empty = spark.createDataFrame([], "doc_id bigint, lang string")
    # total_n=0 on an empty corpus is a legitimate empty allocation
    assert exact_allocation(empty, "lang", total_n=0).count() == 0
    # but any positive ask still raises
    with pytest.raises(ValueError, match="exceeds the corpus row count"):
        exact_allocation(empty, "lang", total_n=1)
