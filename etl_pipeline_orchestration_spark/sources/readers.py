"""Spark readers for the six heterogeneous source formats.

Each simulator in the reference stands for a real connector
(reference etl_pipeline.py:89, README.md:41-50); these are those
connectors, Spark-first:

* explicit ``StructType`` schemas everywhere — no inference scan, and
  Catalyst gets exact types for pruning/pushdown;
* malformed rows degrade to NULL (PERMISSIVE mode), matching the
  reference's coerce-to-null posture;
* small/driver-bound formats (SQLite file, spreadsheet export) go through
  an Arrow bridge into a distributed DataFrame and are meant for dims —
  facts should arrive as CSV/JSON/Parquet directories or via JDBC with
  ``partitionColumn`` so the scan parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SALES_SCHEMA = T.StructType(
    [
        T.StructField("sale_id", T.StringType(), False),
        T.StructField("date", T.StringType(), True),
        T.StructField("region", T.StringType(), True),
        T.StructField("product", T.StringType(), True),
        T.StructField("revenue", T.DoubleType(), True),
        T.StructField("units", T.LongType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

CUSTOMERS_SCHEMA = T.StructType(
    [
        T.StructField("customer_id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("email", T.StringType(), True),
        T.StructField("segment", T.StringType(), True),
        T.StructField("tenure_days", T.LongType(), True),
        T.StructField("churn_risk", T.DoubleType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

FINANCE_SCHEMA = T.StructType(
    [
        T.StructField("txn_id", T.StringType(), False),
        T.StructField("account", T.StringType(), True),
        T.StructField("debit", T.DoubleType(), True),
        T.StructField("credit", T.DoubleType(), True),
        T.StructField("balance", T.DoubleType(), True),
        T.StructField("txn_date", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

INVENTORY_SCHEMA = T.StructType(
    [
        T.StructField("sku", T.StringType(), False),
        T.StructField("product", T.StringType(), True),
        T.StructField("quantity", T.LongType(), True),
        T.StructField("warehouse", T.StringType(), True),
        T.StructField("reorder_pt", T.LongType(), True),
        T.StructField("unit_cost", T.DoubleType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

HR_SCHEMA = T.StructType(
    [
        T.StructField("emp_id", T.StringType(), False),
        T.StructField("department", T.StringType(), True),
        T.StructField("salary", T.DoubleType(), True),
        T.StructField("join_date", T.StringType(), True),
        T.StructField("rating", T.LongType(), True),
        T.StructField("active", T.BooleanType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

WEB_LOG_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType(), False),
        T.StructField("user_id", T.StringType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("timestamp", T.StringType(), True),
        T.StructField("session_id", T.StringType(), True),
        T.StructField("device", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

# event_id user_id [ts] "event_type" session_id device
_LOG_PATTERN = r'^(\S+) (\S+) \[([^\]]+)\] "([^"]*)" (\S+) (\S+)$'


def read_sales_csv(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(SALES_SCHEMA).csv(path, header=True, mode="PERMISSIVE")


def read_customers_json(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines landing files (an API puller writes pages here; Spark
    then reads the directory in parallel)."""
    return spark.read.schema(CUSTOMERS_SCHEMA).json(path, mode="PERMISSIVE")


def read_finance_sqlite(
    spark: SparkSession, db_path: str, table: str = "transactions"
) -> DataFrame:
    """SQLite bridge: file databases are single-reader, so pull through
    Arrow on the driver and parallelize from there. For server databases
    use ``read_finance_jdbc`` which partitions the scan."""
    import sqlite3

    import pandas as pd

    with sqlite3.connect(db_path) as conn:
        pdf = pd.read_sql_query(f"SELECT * FROM {table}", conn)
    return spark.createDataFrame(pdf, schema=FINANCE_SCHEMA)


def read_finance_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str],
    partition_column: str | None = None,
    num_partitions: int = 16,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """Partitioned JDBC scan — the at-scale path for SQL sources. With
    ``partition_column`` Spark issues ``num_partitions`` range-bounded
    queries in parallel instead of one serial cursor."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in properties.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def read_inventory_excel(spark: SparkSession, path: str) -> DataFrame:
    """Spreadsheet exports are small dims: pandas-read on the driver
    (openpyxl when present; CSV exports directly), then distribute."""
    import pandas as pd

    if path.endswith((".xlsx", ".xls")):
        pdf = pd.read_excel(path)
    else:
        pdf = pd.read_csv(path)
    return spark.createDataFrame(pdf, schema=INVENTORY_SCHEMA)


def read_hr_flat_file(spark: SparkSession, path: str, sep: str = "|") -> DataFrame:
    return spark.read.schema(HR_SCHEMA).csv(path, header=True, sep=sep)


def read_web_logs(spark: SparkSession, path: str) -> DataFrame:
    """Raw log-line parse: ``spark.read.text`` + one regexp_extract per
    field (single pass, codegen'd). Unparseable lines yield NULL fields
    and are swept out by the clean stage."""
    lines = spark.read.text(path)
    cols = [
        F.regexp_extract("value", _LOG_PATTERN, i + 1).alias(name)
        for i, name in enumerate(
            ["event_id", "user_id", "timestamp", "event_type", "session_id", "device"]
        )
    ]
    out = lines.select(*cols).withColumn("source", F.lit("WEB_LOGS"))
    # regexp_extract returns '' on no-match; normalize to NULL so cleaning
    # drops garbage lines.
    return out.select(
        *[
            F.when(F.col(c) == "", F.lit(None)).otherwise(F.col(c)).alias(c)
            if c != "source"
            else F.col(c)
            for c in ["event_id", "user_id", "event_type", "timestamp", "session_id", "device", "source"]
        ]
    )


def read_parquet_evolved(
    spark: SparkSession, path: str, expected: T.StructType | None = None
) -> DataFrame:
    """Schema-evolution-tolerant parquet scan: ``mergeSchema=true``
    unions the footers of every file, so landing zones where a
    producer ADDED columns over time read as one relation (old files
    yield nulls for new columns). With ``expected`` given, the result
    is projected/cast onto that exact schema — missing columns
    materialize as typed nulls, extra columns are dropped — which is
    the contract a downstream pipeline wants: additive producer
    changes never break the job, and the job's output schema never
    drifts.

    Scale note: schema merging reads footers only (a driver-side
    listing pass, parallelized by Spark); the data scan is unchanged.
    Do NOT leave mergeSchema on for single-schema tables — footer
    merging on millions of files costs real listing time, which is
    why it's opt-in here rather than a session default."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    if expected is None:
        return df
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in expected.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
