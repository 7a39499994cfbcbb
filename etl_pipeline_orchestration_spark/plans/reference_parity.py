"""Reference-parity queries expressed over the driver's test corpus.

The reference pipeline's operator surface (clean → derive → flag →
bucket; reference etl_pipeline.py:181-225) re-expressed on the TPC-H-ish
tables so the DuckDB oracle can check it. Each query exercises the same
operator the reference applies to its simulated sources.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.functions.scalar import (
    cut,
    month_bucket,
    safe_divide,
    with_global_quantile_flag,
)
from etl_pipeline_orchestration_spark.operators.cleaning import clean_common
from etl_pipeline_orchestration_spark.plans.registry import query
from etl_pipeline_orchestration_spark.sources.tables import load_table


@query(
    "sales_pipeline_monthly",
    oracle="""
    WITH base AS (
      SELECT round(l_extendedprice * (1 - l_discount) * 100) / 100 AS revenue,
             strftime(l_shipdate, '%Y-%m') AS month
      FROM lineitem
    ),
    t AS (
      SELECT percentile_cont(0.9) WITHIN GROUP (ORDER BY revenue) AS thresh
      FROM base
    )
    SELECT month,
           CAST(count(*) AS BIGINT) AS n_sales,
           round(sum(revenue), 2) AS total_revenue,
           CAST(sum(CASE WHEN revenue > t.thresh THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high_value
    FROM base, t
    GROUP BY month
    """,
)
def sales_pipeline_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the reference sales chain (derive revenue → month bucket →
    exact-p90 high_value flag → monthly rollup; reference
    etl_pipeline.py:192-199) on lineitem.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Per-row rounding uses scale-then-round-to-integer: 2dp-price × 2dp-
    # discount products sit exactly on half-cent boundaries where Spark's
    # BigDecimal HALF_UP and DuckDB's fractional round() disagree.
    base = li.select(
        (F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100) / 100)
        .alias("revenue"),
        month_bucket(F.col("l_shipdate")).alias("month"),
    )
    flagged = with_global_quantile_flag(base, "revenue", "high_value", q=0.9)
    return flagged.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_sales"),
        F.round(F.sum("revenue"), 2).alias("total_revenue"),
        F.sum(F.col("high_value").cast("long")).alias("n_high_value"),
    )


@query(
    "clean_dedup_nulldrop",
    oracle="""
    SELECT DISTINCT doc_id, text, lang, source, n_chars
    FROM documents
    WHERE doc_id IS NOT NULL AND lang IS NOT NULL
      AND source IS NOT NULL AND n_chars IS NOT NULL
    """,
)
def clean_dedup_nulldrop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference clean stage (full-row dedup + null-drop with an exempt
    column; reference etl_pipeline.py:181-189). ``text`` plays the role of
    the exempt ``email`` column.
    """
    docs = load_table(spark, sf_dir, "documents")
    return clean_common(docs, null_exempt=("text",))


@query(
    "customer_churn_labels",
    oracle="""
    SELECT c_custkey,
           c_mktsegment,
           CASE WHEN c_acctbal > 0    AND c_acctbal <= 3000  THEN 'Low'
                WHEN c_acctbal > 3000 AND c_acctbal <= 7000  THEN 'Medium'
                WHEN c_acctbal > 7000 AND c_acctbal <= 10000 THEN 'High'
                ELSE NULL END AS balance_label,
           CAST(round(c_acctbal / 365 * 10) AS BIGINT) AS balance_rate_x10
    FROM customer
    """,
)
def customer_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference customer transform's binning + scaled ratio
    (pd.cut left-open/right-closed semantics + round; reference
    etl_pipeline.py:204-207) on customer.c_acctbal.

    The rate is emitted as an integer of tenths (``balance_rate_x10``):
    dividing the rounded value back by 10 yields ``-0.0`` in engines that
    round with sign-preserving ``std::round`` (DuckDB) but ``0.0`` in
    Spark's BigDecimal HALF_UP — an integer column sidesteps the
    negative-zero mismatch entirely.
    """
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        cut(F.col("c_acctbal"), [0.0, 3000.0, 7000.0, 10000.0], ["Low", "Medium", "High"]).alias(
            "balance_label"
        ),
        F.round(F.col("c_acctbal") / 365 * 10).cast("long").alias("balance_rate_x10"),
    )


@query(
    "finance_net_flow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round((l_extendedprice * (1 - l_discount) * (1 + l_tax)
                 - l_extendedprice) * 100) / 100 AS net_flow,
           (l_extendedprice * (1 - l_discount) * (1 + l_tax)
                 - l_extendedprice) < 0 AS is_deficit
    FROM lineitem
    """,
)
def finance_net_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference finance transform (arithmetic derive + boolean
    predicate column; reference etl_pipeline.py:212-214) on lineitem
    charge-vs-base-price.
    """
    li = load_table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (
        1 + F.col("l_tax")
    ) - F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.round(net * 100) / 100).alias("net_flow"),
        (net < 0).alias("is_deficit"),
    )


@query(
    "safe_divide_revenue_per_unit",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round((l_extendedprice * 100) / nullif(l_quantity, 0)) / 100
             AS price_per_unit
    FROM lineitem
    """,
)
def safe_divide_revenue_per_unit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe-divide with NULL-on-zero-denominator (reference
    etl_pipeline.py:195).

    Rounded via scale-then-round-to-integer on BOTH sides: division
    results sit exactly on half-cent boundaries (2-dp price / small int),
    where Spark's BigDecimal HALF_UP and DuckDB's fractional round()
    disagree; integer-boundary rounding is engine-agnostic.
    """
    li = load_table(spark, sf_dir, "lineitem")
    scaled = (F.col("l_extendedprice") * 100) / F.when(
        F.col("l_quantity") == 0, F.lit(None)
    ).otherwise(F.col("l_quantity"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.round(scaled) / 100).alias("price_per_unit"),
    )
