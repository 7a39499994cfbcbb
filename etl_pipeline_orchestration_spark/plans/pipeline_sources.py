"""The six-source orchestrated pipeline, under oracle coverage.

Each query runs a real source path — native-format landing file → Spark
reader → clean → transform — while the oracle runs the equivalent SQL
over a parquet copy of the *same generated input* (sources/landing.py),
so the reader parse, the clean stage, and every transform derivation are
value-checked end to end. ``pipeline_health_summary`` runs the full
orchestrator (all six sources → warehouse → health sink) and checks the
monitoring table's counters against SQL-computed expectations.

Parity surface: reference etl_pipeline.py:88-175 (sources), 181-225
(clean/transform), 248-351 (orchestration + health monitoring).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.operators.cleaning import clean_common
from etl_pipeline_orchestration_spark.operators.transforms import apply_transform
from etl_pipeline_orchestration_spark.orchestrator import ETLOrchestrator, default_sources
from etl_pipeline_orchestration_spark.plans.registry import query
from etl_pipeline_orchestration_spark.sources import landing, readers


def _clean_where(cols: list[str], exempt: tuple[str, ...] = ()) -> str:
    return " AND ".join(f"{c} IS NOT NULL" for c in cols if c not in exempt)


_SALES_COLS = ["sale_id", "date", "region", "product", "revenue", "units", "source"]
_CUST_COLS = ["customer_id", "name", "email", "segment", "tenure_days", "churn_risk", "source"]
_FIN_COLS = ["txn_id", "account", "debit", "credit", "balance", "txn_date", "source"]
_INV_COLS = ["sku", "product", "quantity", "warehouse", "reorder_pt", "unit_cost", "source"]
_HR_COLS = ["emp_id", "department", "salary", "join_date", "rating", "active", "source"]
_LOG_COLS = ["event_id", "user_id", "event_type", "timestamp", "session_id", "device", "source"]


@query(
    "pipeline_sales",
    oracle=f"""
    WITH cleaned AS (
      SELECT DISTINCT * FROM read_parquet('{landing.oracle_path("sales")}')
      WHERE {_clean_where(_SALES_COLS)}
    ),
    base AS (
      SELECT sale_id, region, product, source,
             COALESCE(TRY_CAST(revenue AS DOUBLE), 0.0) AS revenue,
             COALESCE(TRY_CAST(units AS DOUBLE), 0.0) AS units,
             CAST(date AS TIMESTAMP) AS date,
             strftime(CAST(date AS TIMESTAMP), '%Y-%m') AS month
      FROM cleaned
    ),
    t AS (
      SELECT percentile_cont(0.9) WITHIN GROUP (ORDER BY revenue) AS thresh
      FROM base
    )
    SELECT sale_id, date, region, product, revenue, units,
           round((revenue / nullif(units, 0)) * 100) / 100 AS revenue_per_unit,
           month, revenue > t.thresh AS high_value, source
    FROM base, t
    """,
)
def pipeline_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: CSV scan → clean → sales transform (coerce, safe-divide, month
    bucket, exact-p90 flag; reference etl_pipeline.py:91-103,192-199)."""
    paths = landing.ensure_landing()
    df = readers.read_sales_csv(spark, paths["sales_csv"])
    return apply_transform("CSV_SALES", clean_common(df, null_exempt=()))


@query(
    "pipeline_customers",
    oracle=f"""
    WITH cleaned AS (
      SELECT DISTINCT * FROM read_parquet('{landing.oracle_path("customers")}')
      WHERE {_clean_where(_CUST_COLS, exempt=("email",))}
    )
    SELECT customer_id, name,
           COALESCE(email, 'unknown@na.com') AS email,
           segment, tenure_days, churn_risk, source,
           CASE WHEN churn_risk > 0.0 AND churn_risk <= 0.3 THEN 'Low'
                WHEN churn_risk > 0.3 AND churn_risk <= 0.6 THEN 'Medium'
                WHEN churn_risk > 0.6 AND churn_risk <= 1.0 THEN 'High'
                ELSE NULL END AS churn_label,
           round(tenure_days / 365 * 10) / 10 AS tenure_yrs
    FROM cleaned
    """,
)
def pipeline_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: JSON-lines scan → clean (email exempt) → customer transform
    (null-fill, pd.cut binning, scaled ratio; reference
    etl_pipeline.py:105-117,201-208)."""
    paths = landing.ensure_landing()
    df = readers.read_customers_json(spark, paths["customers_json"])
    return apply_transform("JSON_API", clean_common(df, null_exempt=("email",)))


@query(
    "pipeline_finance",
    oracle=f"""
    WITH cleaned AS (
      SELECT DISTINCT * FROM read_parquet('{landing.oracle_path("finance")}')
      WHERE {_clean_where(_FIN_COLS)}
    )
    SELECT txn_id, account, debit, credit, balance,
           CAST(txn_date AS TIMESTAMP) AS txn_date, source,
           credit - debit AS net_flow,
           (credit - debit) < 0 AS is_deficit
    FROM cleaned
    """,
)
def pipeline_finance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: SQL-database scan (SQLite → Arrow bridge; JDBC at scale) →
    clean → finance transform (reference etl_pipeline.py:119-131,210-215)."""
    paths = landing.ensure_landing()
    df = readers.read_finance_sqlite(spark, paths["finance_db"])
    return apply_transform("SQL_FINANCE", clean_common(df, null_exempt=()))


@query(
    "pipeline_inventory",
    oracle=f"""
    SELECT DISTINCT * FROM read_parquet('{landing.oracle_path("inventory")}')
    WHERE {_clean_where(_INV_COLS)}
    """,
)
def pipeline_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: spreadsheet-export scan (driver bridge — dims only) → clean;
    no registered transform, like the reference (etl_pipeline.py:303)."""
    paths = landing.ensure_landing()
    df = readers.read_inventory_excel(spark, paths["inventory_excel"])
    return apply_transform("", clean_common(df, null_exempt=()))


@query(
    "pipeline_hr",
    oracle=f"""
    SELECT DISTINCT * FROM read_parquet('{landing.oracle_path("hr")}')
    WHERE {_clean_where(_HR_COLS)}
    """,
)
def pipeline_hr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: pipe-delimited flat-file scan → clean (reference
    etl_pipeline.py:147-160)."""
    paths = landing.ensure_landing()
    df = readers.read_hr_flat_file(spark, paths["hr_flat"])
    return apply_transform("", clean_common(df, null_exempt=()))


@query(
    "pipeline_weblogs",
    oracle=f"""
    SELECT DISTINCT * FROM read_parquet('{landing.oracle_path("weblogs")}')
    WHERE {_clean_where(_LOG_COLS)}
    """,
)
def pipeline_weblogs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: raw log-line scan (spark.read.text + regexp_extract) → clean
    (reference etl_pipeline.py:162-175)."""
    paths = landing.ensure_landing()
    df = readers.read_web_logs(spark, paths["web_logs"])
    return apply_transform("", clean_common(df, null_exempt=()))


def _health_oracle() -> str:
    """Expected pipeline_health counters, computed independently in SQL
    from the oracle input copies: in = raw rows, out = rows surviving
    dedup + null-drop (email exempt for customers)."""
    spec = [
        ("Sales CSV", "csv_file", "sales", _SALES_COLS, ()),
        ("Customer API", "json_api", "customers", _CUST_COLS, ("email",)),
        ("Finance DB", "sql_database", "finance", _FIN_COLS, ()),
        ("Inventory Excel", "excel_file", "inventory", _INV_COLS, ()),
        ("HR Flat File", "flat_file", "hr", _HR_COLS, ()),
        ("Web Logs", "log_file", "weblogs", _LOG_COLS, ()),
    ]
    parts = []
    for name, stype, key, cols, exempt in spec:
        p = landing.oracle_path(key)
        parts.append(f"""
        SELECT '{name}' AS source_name, '{stype}' AS source_type,
               (SELECT CAST(count(*) AS BIGINT) FROM read_parquet('{p}'))
                 AS records_in,
               (SELECT CAST(count(*) AS BIGINT) FROM
                 (SELECT DISTINCT * FROM read_parquet('{p}')
                  WHERE {_clean_where(cols, exempt)}))
                 AS records_out,
               'SUCCESS' AS status
        """)
    return (
        "SELECT source_name, source_type, records_in, records_out, "
        "records_in - records_out AS records_dropped, status FROM ("
        + " UNION ALL ".join(parts)
        + ")"
    )


@query("pipeline_health_summary", oracle=_health_oracle())
def pipeline_health_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full orchestrated run (six sources, concurrent, per-source failure
    isolation) into a scratch warehouse; returns the ``pipeline_health``
    monitoring table's deterministic columns (reference
    etl_pipeline.py:248-351,317-333)."""
    paths = landing.ensure_landing()
    warehouse = tempfile.mkdtemp(prefix="etl_warehouse_")
    orch = ETLOrchestrator(
        spark, default_sources(paths), warehouse, parallel=True, quiet=True
    )
    orch.run_pipeline()
    health = orch.loader.read("pipeline_health")
    return health.select(
        "source_name",
        "source_type",
        "records_in",
        "records_out",
        "records_dropped",
        "status",
    )


@query(
    "pii_scrub_customers",
    oracle=f"""
    SELECT customer_id,
           regexp_replace(email, '^[^@]+@', '***@') AS masked_email,
           regexp_extract(email, '@(.+)$', 1) AS email_domain
    FROM read_parquet('{landing.oracle_path("customers")}')
    WHERE email IS NOT NULL
    """,
)
def pii_scrub_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII masking on the customer feed: redact the email local-part,
    keep the domain for analytics. Pure per-row regexp expressions
    (JVM-side, no shuffle) — the shape a 100 TB PII-scrub pass takes:
    narrow map over the scan, fully pushdown-compatible."""
    paths = landing.ensure_landing()
    df = readers.read_customers_json(spark, paths["customers_json"])
    return df.filter(F.col("email").isNotNull()).select(
        "customer_id",
        F.regexp_replace("email", r"^[^@]+@", "***@").alias("masked_email"),
        F.regexp_extract("email", r"@(.+)$", 1).alias("email_domain"),
    )


@query(
    "avro_roundtrip_doc_stats",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id,
           CAST(sum(length(text)) AS BIGINT) AS text_len_sum
    FROM documents GROUP BY lang
    """,
)
def avro_roundtrip_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro source/sink under the oracle gate: land the documents table
    as a directory of Avro object-container files (sources/avro_io —
    the JVM spark-avro datasource when present, else the pure-python
    OCF fallback), read it back, and aggregate per language. The
    DuckDB oracle computes the same aggregate from the original
    parquet, so a hash match proves the Avro round trip preserves
    every doc_id/lang/n_chars/text value bit-for-bit — the
    Kafka-landing-format path is driver-grade verified, not just
    unit-tested. Scratch dir lifecycle mirrors snapshot_timetravel_diff
    (lazy read → cleanup at process exit)."""
    import atexit
    import os
    import shutil

    from etl_pipeline_orchestration_spark.sources import avro_io
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    scratch = tempfile.mkdtemp(prefix="etl_avro_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    path = os.path.join(scratch, "documents_avro")
    avro_io.write_avro(docs, path)
    back = avro_io.read_avro(spark, path)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").cast("bigint").alias("min_id"),
        F.max("doc_id").cast("bigint").alias("max_id"),
        F.sum(F.length("text")).cast("bigint").alias("text_len_sum"),
    )


@query(
    "xml_roundtrip_doc_stats",
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS min_id,
           CAST(max(doc_id) AS BIGINT) AS max_id,
           CAST(sum(length(text)) AS BIGINT) AS text_len_sum
    FROM documents GROUP BY source
    """,
)
def xml_roundtrip_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink under the oracle gate (the Avro-round-trip
    discipline, sources/xml_io — Spark 4's in-box xml datasource):
    land the documents table as ``<doc>`` elements, read it back with
    an EXPLICIT schema (inference would double-scan and stringify),
    and aggregate per source. A hash match against the DuckDB
    aggregate over the original parquet proves the XML round trip
    preserves every doc_id/source/n_chars/text value — including
    text entity-escaping (&, <, >) surviving both directions."""
    import atexit
    import os
    import shutil

    from etl_pipeline_orchestration_spark.sources import xml_io
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "text"
    )
    scratch = tempfile.mkdtemp(prefix="etl_xml_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    path = os.path.join(scratch, "documents_xml")
    xml_io.write_xml(docs, path, row_tag="doc", root_tag="docs")
    back = xml_io.read_xml(spark, path, row_tag="doc", schema=docs.schema)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").cast("bigint").alias("min_id"),
        F.max("doc_id").cast("bigint").alias("max_id"),
        F.sum(F.length("text")).cast("bigint").alias("text_len_sum"),
    )
