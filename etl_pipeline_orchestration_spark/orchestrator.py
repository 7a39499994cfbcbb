"""End-to-end pipeline orchestration: the reference's main surface.

Parity with reference etl_pipeline.py:248-351 (`ETLOrchestrator`):
extract → clean → transform → load per source, with per-source
try/except isolation (one failed source doesn't kill the run), a
``pipeline_health`` append sink, and a printed run summary with
uptime%. Differences are deliberate and Spark-first:

* each source's extract→clean→transform is ONE lazy plan; the only
  action is the warehouse write, and the in/out row counters ride that
  write via ``Observation`` instead of extra count() jobs (which would
  re-extract the source — reference runs eagerly so never hits this);
* sources run concurrently on a driver thread pool (Spark's scheduler
  multiplexes the jobs) instead of the reference's serial loop with a
  simulated 0.1 s sleep (etl_pipeline.py:308-310);
* the warehouse is parquet (columnar, splittable) rather than SQLite
  row inserts, so the reference's load-time datetime→str / bool→int
  coercion (etl_pipeline.py:270-274) is unnecessary; it is kept behind
  ``sqlite_compat=True`` for byte-level parity with the reference's
  warehouse schema.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_orchestration_spark.loader import WarehouseLoader
from etl_pipeline_orchestration_spark.metrics import (
    PipelineMetric,
    PipelineRun,
    PipelineStatus,
)
from etl_pipeline_orchestration_spark.operators.cleaning import CleanStats, clean_common
from etl_pipeline_orchestration_spark.operators.transforms import apply_transform
from etl_pipeline_orchestration_spark.sources import readers


@dataclass(frozen=True)
class SourceSpec:
    """One pipeline source: how to read it, where it lands, which
    transform applies (parity: the hard-coded 6-tuple list at reference
    etl_pipeline.py:299-306)."""

    display_name: str
    source_type: str
    reader: Callable[[SparkSession], DataFrame]
    target_table: str
    transform_key: str
    null_exempt: tuple[str, ...] = ()
    partition_by: tuple[str, ...] = ()


def default_sources(landing: dict[str, str]) -> list[SourceSpec]:
    """The six reference sources wired to their landing files."""
    return [
        SourceSpec(
            "Sales CSV", "csv_file",
            lambda s: readers.read_sales_csv(s, landing["sales_csv"]),
            "fact_sales", "CSV_SALES",
            # hive-partition the fact by the derived month bucket: monthly
            # downstream reads prune to one directory (SURVEY §4 table)
            partition_by=("month",),
        ),
        SourceSpec(
            "Customer API", "json_api",
            lambda s: readers.read_customers_json(s, landing["customers_json"]),
            "dim_customers", "JSON_API", null_exempt=("email",),
        ),
        SourceSpec(
            "Finance DB", "sql_database",
            lambda s: readers.read_finance_sqlite(s, landing["finance_db"]),
            "fact_finance", "SQL_FINANCE",
        ),
        SourceSpec(
            "Inventory Excel", "excel_file",
            lambda s: readers.read_inventory_excel(s, landing["inventory_excel"]),
            "dim_inventory", "",
        ),
        SourceSpec(
            "HR Flat File", "flat_file",
            lambda s: readers.read_hr_flat_file(s, landing["hr_flat"]),
            "dim_employees", "",
        ),
        SourceSpec(
            "Web Logs", "log_file",
            lambda s: readers.read_web_logs(s, landing["web_logs"]),
            "fact_web_events", "",
        ),
    ]


HEALTH_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("source_name", T.StringType(), False),
        T.StructField("source_type", T.StringType(), False),
        T.StructField("records_in", T.LongType(), False),
        T.StructField("records_out", T.LongType(), False),
        T.StructField("records_dropped", T.LongType(), False),
        T.StructField("duration_seconds", T.DoubleType(), False),
        T.StructField("drop_rate", T.DoubleType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("logged_at", T.TimestampType(), False),
    ]
)


class ETLOrchestrator:
    def __init__(
        self,
        spark: SparkSession,
        sources: list[SourceSpec],
        warehouse_dir: str,
        parallel: bool = True,
        sqlite_compat: bool = False,
        quiet: bool = False,
    ):
        self.spark = spark
        self.sources = sources
        self.loader = WarehouseLoader(spark, warehouse_dir)
        self.parallel = parallel
        self.sqlite_compat = sqlite_compat
        self.quiet = quiet

    # -- per-source stage sequence (reference etl_pipeline.py:256-292) --

    def _run_source(self, spec: SourceSpec) -> PipelineMetric:
        metric = PipelineMetric(
            source_name=spec.display_name,
            source_type=spec.source_type,
            start_time=datetime.now(timezone.utc),
            status=PipelineStatus.RUNNING.value,
        )
        try:
            df = spec.reader(self.spark)
            stats = CleanStats()
            cleaned = clean_common(df, null_exempt=spec.null_exempt, stats=stats)
            transformed = apply_transform(spec.transform_key, cleaned)
            if self.sqlite_compat:
                transformed = _sqlite_compat_coerce(transformed)
            # The write is the single action; both Observation counters
            # (pre-clean, post-clean) ride it — no extra jobs, no
            # double-extract.
            self.loader.load(
                transformed,
                spec.target_table,
                if_exists="replace",
                partition_by=list(spec.partition_by) or None,
            )
            metric.records_in = stats.records_in
            metric.records_out = stats.records_out
            metric.records_dropped = stats.records_dropped
            metric.status = PipelineStatus.SUCCESS.value
        except Exception as e:  # per-source isolation (reference :286-292)
            metric.status = PipelineStatus.FAILED.value
            metric.error_message = str(e)[:500]
        metric.end_time = datetime.now(timezone.utc)
        return metric

    # -- run loop (reference etl_pipeline.py:294-315) --

    def run_pipeline(self) -> PipelineRun:
        run = PipelineRun()
        if self.parallel and len(self.sources) > 1:
            with ThreadPoolExecutor(max_workers=len(self.sources)) as pool:
                run.metrics = list(pool.map(self._run_source, self.sources))
        else:
            run.metrics = [self._run_source(s) for s in self.sources]
        run.total_records = sum(m.records_out for m in run.metrics)
        run.end_time = datetime.now(timezone.utc)
        run.status = (
            PipelineStatus.SUCCESS.value
            if all(m.status == PipelineStatus.SUCCESS.value for m in run.metrics)
            else PipelineStatus.FAILED.value
        )
        self._save_health_metrics(run)
        if not self.quiet:
            self._print_run_summary(run)
        return run

    # -- monitoring sink (reference etl_pipeline.py:317-333) --

    def _save_health_metrics(self, run: PipelineRun) -> None:
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        rows = [
            (
                run.run_id,
                m.source_name,
                m.source_type,
                m.records_in,
                m.records_out,
                m.records_dropped,
                m.duration_seconds,
                m.drop_rate,
                m.status,
                m.error_message or None,
                now,
            )
            for m in run.metrics
        ]
        health = self.spark.createDataFrame(rows, HEALTH_SCHEMA)
        self.loader.load(health, "pipeline_health", if_exists="append")

    # -- run summary (reference etl_pipeline.py:335-348) --

    def _print_run_summary(self, run: PipelineRun) -> None:
        dur = (run.end_time - run.start_time).total_seconds() if run.end_time else 0.0
        print(f"run {run.run_id}: {run.status} in {dur:.1f}s")
        for m in run.metrics:
            print(
                f"  {m.source_name:<16} {m.status:<8} in={m.records_in:<7}"
                f" out={m.records_out:<7} dropped={m.records_dropped:<5}"
                f" ({m.duration_seconds:.1f}s)"
                + (f" err={m.error_message}" if m.error_message else "")
            )
        print(
            f"  total={run.total_records} uptime={run.uptime_pct}%"
            f" sources={len(run.metrics)}"
        )


def _sqlite_compat_coerce(df: DataFrame) -> DataFrame:
    """Reference load-time coercion (etl_pipeline.py:270-274): timestamp →
    'YYYY-MM-DD HH:MM:SS' strings, bool → int. Only needed when the sink
    can't represent these types (SQLite); parquet keeps native types."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (T.TimestampType, T.DateType)):
            cols.append(F.date_format(c, "yyyy-MM-dd HH:mm:ss").alias(f.name))
        elif isinstance(f.dataType, T.BooleanType):
            cols.append(c.cast("int").alias(f.name))
        else:
            cols.append(c)
    return df.select(*cols)
