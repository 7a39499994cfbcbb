"""Property-based tests (hypothesis): the scalar semantics that pin
reference parity must hold on arbitrary inputs, not just the fixtures.
Each property runs ONE Spark job over the whole generated batch."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.functions.scalar import cut, safe_divide
from etl_pipeline_orchestration_spark.operators.sampling import KNUTH

FINITE = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.one_of(FINITE, st.none()), min_size=1, max_size=50))
def test_cut_matches_pandas_cut(spark, values):
    bins, labels = [0.0, 0.3, 0.6, 1.0], ["Low", "Medium", "High"]
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = [
        r["c"]
        for r in df.select(cut(F.col("x"), bins, labels).alias("c")).collect()
    ]
    want = [
        None if pd.isna(c) else c
        for c in pd.cut(pd.Series(values, dtype="float64"), bins=bins, labels=labels)
        .astype(object)
        .tolist()
    ]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(FINITE, st.one_of(FINITE, st.just(0.0))), min_size=1, max_size=50
    )
)
def test_safe_divide_never_errors_null_on_zero(spark, pairs):
    df = spark.createDataFrame(pairs, "a double, b double")
    rows = df.select(
        "a", "b", safe_divide(F.col("a"), F.col("b"), 2).alias("q")
    ).collect()
    for r in rows:
        if r["b"] == 0.0:
            assert r["q"] is None  # the one semantic guarantee: NULL, no error
        elif r["q"] is not None:
            true_q = r["a"] / r["b"]
            if math.isinf(true_q):
                # IEEE overflow (subnormal denominator) — pandas'
                # x / y.replace(0, nan) yields the same inf
                assert math.isinf(r["q"])
            else:
                # within rounding distance of the true quotient
                assert abs(r["q"] - true_q) <= 0.005 + abs(true_q) * 1e-9


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_split_bucket_is_stable_and_in_range(doc_id):
    """The split bucket used by train/val/test assignment is a pure
    function of the id and always lands in [0, 1000)."""
    b = (doc_id * KNUTH) % (2**32) % 1000
    b2 = (doc_id * KNUTH) % (2**32) % 1000
    assert b == b2
    assert 0 <= b < 1000
