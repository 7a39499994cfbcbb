"""Per-source transforms — lazy DataFrame->DataFrame, registry-dispatched.

Parity with reference etl_pipeline.py:178-225 (`TransformationEngine`).
Every derivation is a built-in-function Column expression (codegen'd); the
only multi-pass construct is the exact global quantile (two scans, see
functions/scalar.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.functions.scalar import (
    coerce_numeric,
    cut,
    month_bucket,
    safe_divide,
    with_global_quantile_flag,
)


def transform_sales(df: DataFrame) -> DataFrame:
    """Parity: reference etl_pipeline.py:192-199.

    revenue/units coerced-to-numeric with 0-fill; revenue_per_unit NULL when
    units=0; month 'YYYY-MM'; high_value = revenue > exact p90.
    """
    out = (
        df.withColumn("revenue", coerce_numeric(F.col("revenue")))
        .withColumn("units", coerce_numeric(F.col("units")))
        .withColumn(
            "revenue_per_unit", safe_divide(F.col("revenue"), F.col("units"), 2)
        )
        # try_to_timestamp = coerce-to-null date parse (reference
        # etl_pipeline.py:196 pd.to_datetime(errors="coerce")) that holds
        # even under an ANSI-enabled session.
        .withColumn("date", F.try_to_timestamp(F.col("date")))
        .withColumn("month", month_bucket(F.col("date")))
    )
    return with_global_quantile_flag(out, "revenue", "high_value", q=0.9)


def transform_customers(df: DataFrame) -> DataFrame:
    """Parity: reference etl_pipeline.py:201-208.

    email null-fill; churn_label via pd.cut (0,.3]/( .3,.6]/(.6,1.0], value
    0.0 → NULL; tenure_yrs = round(days/365, 1).
    """
    return (
        df.na.fill({"email": "unknown@na.com"})
        .withColumn(
            "churn_label",
            cut(F.col("churn_risk"), [0.0, 0.3, 0.6, 1.0], ["Low", "Medium", "High"]),
        )
        # round(x*10)/10, not F.round(x, 1): engine-agnostic at half
        # boundaries (see functions/scalar.py safe_divide).
        .withColumn("tenure_yrs", F.round(F.col("tenure_days") / 365 * 10) / 10)
    )


def transform_finance(df: DataFrame) -> DataFrame:
    """Parity: reference etl_pipeline.py:210-215."""
    return (
        df.withColumn("net_flow", F.col("credit") - F.col("debit"))
        .withColumn("txn_date", F.try_to_timestamp(F.col("txn_date")))
        .withColumn("is_deficit", F.col("net_flow") < 0)
    )


# Registry dispatch — identity for unregistered sources (parity:
# reference etl_pipeline.py:217-225).
TRANSFORMS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "CSV_SALES": transform_sales,
    "JSON_API": transform_customers,
    "SQL_FINANCE": transform_finance,
}


def apply_transform(source_name: str, df: DataFrame) -> DataFrame:
    fn = TRANSFORMS.get(source_name)
    return fn(df) if fn else df
