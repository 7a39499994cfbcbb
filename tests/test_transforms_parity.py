"""Differential parity: the Spark transforms vs an in-test pandas
implementation of the reference semantics (reference
etl_pipeline.py:181-225), on the seeded simulator frames.

Rounded float columns are compared with half-boundary tolerance (the
reference's .round() is banker's rounding on binary doubles; the engine
uses engine-agnostic scale-then-round HALF_UP — they can differ by one
rounding unit exactly on representable halves, nowhere else).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from etl_pipeline_orchestration_spark.operators.transforms import (
    transform_customers,
    transform_finance,
    transform_sales,
)
from etl_pipeline_orchestration_spark.sources import simulators


def _pd_reference_sales(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["revenue"] = pd.to_numeric(df["revenue"], errors="coerce").fillna(0)
    df["units"] = pd.to_numeric(df["units"], errors="coerce").fillna(0)
    df["revenue_per_unit"] = (df["revenue"] / df["units"].replace(0, np.nan)).round(2)
    df["date"] = pd.to_datetime(df["date"], errors="coerce")
    df["month"] = df["date"].dt.to_period("M").astype(str)
    df["high_value"] = df["revenue"] > df["revenue"].quantile(0.9)
    return df


def _pd_reference_customers(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["email"] = df["email"].fillna("unknown@na.com")
    df["churn_label"] = pd.cut(
        df["churn_risk"], bins=[0, 0.3, 0.6, 1.0], labels=["Low", "Medium", "High"]
    ).astype(object)
    df["tenure_yrs"] = (df["tenure_days"] / 365).round(1)
    return df


def _pd_reference_finance(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["net_flow"] = df["credit"] - df["debit"]
    df["txn_date"] = pd.to_datetime(df["txn_date"], errors="coerce")
    df["is_deficit"] = df["net_flow"] < 0
    return df


def _aligned(spark_df, pdf, key):
    got = spark_df.toPandas().sort_values(key).reset_index(drop=True)
    want = pdf.sort_values(key).reset_index(drop=True)
    return got, want


def test_sales_transform_parity(spark):
    pdf = simulators.gen_sales(n=300)
    got, want = _aligned(
        transform_sales(spark.createDataFrame(pdf)), _pd_reference_sales(pdf), "sale_id"
    )
    assert list(got["month"]) == list(want["month"])
    assert list(got["high_value"]) == list(want["high_value"])
    # one-rounding-unit tolerance at half boundaries only
    assert np.allclose(got["revenue_per_unit"], want["revenue_per_unit"], atol=0.0051)
    assert np.array_equal(got["revenue"].values, want["revenue"].values)


def test_customers_transform_parity(spark):
    pdf = simulators.gen_customers(n=300)
    got, want = _aligned(
        transform_customers(spark.createDataFrame(pdf)),
        _pd_reference_customers(pdf),
        "customer_id",
    )
    assert list(got["email"]) == list(want["email"])
    g = got["churn_label"].where(got["churn_label"].notna(), None)
    w = want["churn_label"].where(want["churn_label"].notna(), None)
    assert list(g) == list(w)
    assert np.allclose(got["tenure_yrs"], want["tenure_yrs"], atol=0.051)


def test_finance_transform_parity(spark):
    pdf = simulators.gen_finance(n=300)
    got, want = _aligned(
        transform_finance(spark.createDataFrame(pdf)),
        _pd_reference_finance(pdf),
        "txn_id",
    )
    # unrounded arithmetic: bitwise-identical IEEE doubles
    assert np.array_equal(got["net_flow"].values, want["net_flow"].values)
    assert list(got["is_deficit"]) == list(want["is_deficit"])
    assert list(got["txn_date"]) == list(want["txn_date"])
