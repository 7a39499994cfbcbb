"""End-to-end orchestration tests: full six-source run, health-table
arithmetic, append semantics, and per-source failure isolation
(reference etl_pipeline.py:248-351)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.metrics import PipelineStatus
from etl_pipeline_orchestration_spark.orchestrator import (
    ETLOrchestrator,
    SourceSpec,
    default_sources,
)
from etl_pipeline_orchestration_spark.sources import landing

EXPECTED_COUNTS = {
    "fact_sales": 1000,
    "dim_customers": 800,
    "fact_finance": 600,
    "dim_inventory": 400,
    "dim_employees": 300,
    "fact_web_events": 2000,
}


@pytest.fixture(scope="module")
def landing_paths(tmp_path_factory):
    return landing.ensure_landing(str(tmp_path_factory.mktemp("landing")))


def test_full_run_e2e(spark, landing_paths, tmp_path):
    orch = ETLOrchestrator(
        spark, default_sources(landing_paths), str(tmp_path / "wh"), quiet=True
    )
    run = orch.run_pipeline()

    assert run.status == PipelineStatus.SUCCESS.value
    assert run.uptime_pct == 100.0
    assert len(run.metrics) == 6
    for m in run.metrics:
        assert m.status == PipelineStatus.SUCCESS.value
        assert m.records_in - m.records_out == m.records_dropped
        assert m.records_out > 0
        assert m.duration_seconds > 0

    # warehouse tables landed with the generated row counts (no dirty rows
    # in the deterministic corpus, so clean drops nothing)
    for table, n in EXPECTED_COUNTS.items():
        assert orch.loader.table_count(table) == n
    assert run.total_records == sum(EXPECTED_COUNTS.values())

    # health sink: one row per source, arithmetic consistent
    health = orch.loader.read("pipeline_health").collect()
    assert len(health) == 6
    by_name = {r["source_name"]: r for r in health}
    assert by_name["Sales CSV"]["records_in"] == 1000
    assert all(r["status"] == "SUCCESS" for r in health)
    assert all(r["run_id"] == run.run_id for r in health)


def test_health_append_across_runs(spark, landing_paths, tmp_path):
    orch = ETLOrchestrator(
        spark, default_sources(landing_paths), str(tmp_path / "wh"), quiet=True
    )
    r1 = orch.run_pipeline()
    r2 = orch.run_pipeline()
    health = orch.loader.read("pipeline_health").collect()
    assert len(health) == 12  # append, not replace (reference :317-333)
    assert {r["run_id"] for r in health} == {r1.run_id, r2.run_id}
    # warehouse tables use replace mode -> second run does not double rows
    assert orch.loader.table_count("fact_sales") == 1000


def test_failure_isolation(spark, landing_paths, tmp_path):
    """A poisoned source records FAILED with its error, the run continues,
    and uptime reflects the partial success (reference :286-292, :81-85)."""

    def _boom(_spark):
        raise RuntimeError("source exploded")

    sources = default_sources(landing_paths)
    sources[2] = SourceSpec(
        "Finance DB", "sql_database", _boom, "fact_finance", "SQL_FINANCE"
    )
    orch = ETLOrchestrator(spark, sources, str(tmp_path / "wh"), quiet=True)
    run = orch.run_pipeline()

    assert run.status == PipelineStatus.FAILED.value
    statuses = {m.source_name: m.status for m in run.metrics}
    assert statuses["Finance DB"] == PipelineStatus.FAILED.value
    assert sum(1 for s in statuses.values() if s == "SUCCESS") == 5
    assert run.uptime_pct == 83.3  # round(5/6*100, 1)

    failed = next(m for m in run.metrics if m.status == "FAILED")
    assert "source exploded" in failed.error_message
    assert failed.records_in == 0

    health = orch.loader.read("pipeline_health").collect()
    assert sum(1 for r in health if r["status"] == "FAILED") == 1


def test_fact_sales_partition_pruning(spark, landing_paths, tmp_path):
    """fact_sales lands hive-partitioned by month; a month-filtered read
    must prune at the directory level (PartitionFilters, not a post-scan
    filter over all data)."""
    import contextlib
    import io

    orch = ETLOrchestrator(
        spark, default_sources(landing_paths), str(tmp_path / "wh"), quiet=True
    )
    orch.run_pipeline()
    sales = orch.loader.read("fact_sales")
    months = [r["month"] for r in sales.select("month").distinct().collect()]
    one = sales.filter(sales.month == months[0])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one.explain("formatted")
    plan = buf.getvalue()
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf_lines and any("month" in l for l in pf_lines)  # directory-level prune
    n_one = one.count()
    assert 0 < n_one < sales.count()


def test_sqlite_compat_coercion(spark, landing_paths, tmp_path):
    """Load-time dtype-driven coercion behind the sqlite_compat flag
    (reference etl_pipeline.py:270-274): timestamps → strings, bools →
    ints, selected by schema dtype, all other columns untouched."""
    orch = ETLOrchestrator(
        spark,
        default_sources(landing_paths),
        str(tmp_path / "wh"),
        sqlite_compat=True,
        quiet=True,
    )
    run = orch.run_pipeline()
    assert run.uptime_pct == 100.0

    sales = dict(orch.loader.read("fact_sales").dtypes)
    assert sales["date"] == "string"  # timestamp -> 'YYYY-MM-DD HH:MM:SS'
    assert sales["high_value"] == "int"  # bool -> 0/1
    assert sales["revenue"] == "double"  # untouched
    row = orch.loader.read("fact_sales").select("date", "high_value").head()
    assert len(row["date"]) == 19 and row["high_value"] in (0, 1)

    hr = dict(orch.loader.read("dim_employees").dtypes)
    assert hr["active"] == "int"


def test_sequential_mode_matches_parallel(spark, landing_paths, tmp_path):
    orch = ETLOrchestrator(
        spark,
        default_sources(landing_paths),
        str(tmp_path / "wh"),
        parallel=False,
        quiet=True,
    )
    run = orch.run_pipeline()
    assert run.uptime_pct == 100.0
    assert [m.source_name for m in run.metrics] == [
        s.display_name for s in default_sources(landing_paths)
    ]


def test_sqlite_sink_round_trip(spark, landing_paths, tmp_path):
    """The SQLite-compat warehouse sink writes the same rows the
    reference's pandas to_sql path does, and a sqlite3 read-back agrees
    with the DataFrame (reference etl_pipeline.py:234-236)."""
    import sqlite3

    from etl_pipeline_orchestration_spark.loader import WarehouseLoader
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    nat = load_table(spark, "/root/testdata/sf0.001", "nation")
    db = str(tmp_path / "wh.db")
    n = loader.load_sqlite(nat, "nation", db, if_exists="replace")
    assert n == nat.count()
    with sqlite3.connect(db) as conn:
        rows = conn.execute(
            "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"
        ).fetchall()
    want = [
        (r["n_nationkey"], r["n_name"])
        for r in nat.orderBy("n_nationkey").select("n_nationkey", "n_name").collect()
    ]
    assert rows == want
    # append mode accumulates
    loader.load_sqlite(nat, "nation", db, if_exists="append")
    with sqlite3.connect(db) as conn:
        assert conn.execute("SELECT count(*) FROM nation").fetchone()[0] == 2 * n


def test_orc_round_trip(spark, tmp_path):
    """ORC sink/source parity: same rows, schema, and pushdown-capable
    columnar layout as the parquet default."""
    from etl_pipeline_orchestration_spark.loader import WarehouseLoader

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, None, None)], ["id", "s", "v"]
    )
    loader.load(df, "orc_t", if_exists="replace", fmt="orc")
    back = loader.read("orc_t", fmt="orc")
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_merge_schema_evolution(spark, tmp_path):
    """Landing files whose schema grew a column: reading with
    mergeSchema unifies old and new footers; the old files' missing
    column reads as NULL — the standard forward-compatible evolution
    path for an append-only landing zone."""
    d = str(tmp_path / "land")
    spark.createDataFrame([(1, "a")], ["id", "s"]).write.mode("append").parquet(d)
    spark.createDataFrame(
        [(2, "b", 9.5)], ["id", "s", "score"]
    ).write.mode("append").parquet(d)
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"id", "s", "score"}
    rows = {r["id"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_high_watermark_incremental_load(spark, tmp_path):
    """High-watermark ingestion: the second run must pick up ONLY rows
    newer than the warehouse's max(ts) — the incremental-extract
    pattern every periodic batch load uses (a 100 TB source is read
    through a ts >= watermark scan predicate, never fully)."""
    from datetime import datetime

    from etl_pipeline_orchestration_spark.loader import WarehouseLoader

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    src = str(tmp_path / "src")

    def write_batch(rows):
        spark.createDataFrame(rows, "id BIGINT, ts TIMESTAMP").write.mode(
            "append"
        ).parquet(src)

    def incremental_load():
        from pyspark.errors import AnalysisException

        try:
            wm = loader.read("inc_t").agg(F.max("ts")).head()[0]
        except AnalysisException:  # first run: table not yet created
            wm = None
        new = spark.read.parquet(src)
        if wm is not None:
            new = new.filter(F.col("ts") > F.lit(wm))
        loader.load(new, "inc_t", if_exists="append")

    t = datetime(2026, 1, 1)
    write_batch([(1, t), (2, datetime(2026, 1, 2))])
    incremental_load()
    assert loader.table_count("inc_t") == 2

    write_batch([(3, datetime(2026, 1, 3))])
    incremental_load()
    got = sorted(r["id"] for r in loader.read("inc_t").collect())
    assert got == [1, 2, 3], got  # no duplicates of 1/2, 3 picked up


def test_dynamic_partition_overwrite_backfill(spark, tmp_path):
    """Backfill semantics: with partitionOverwriteMode=dynamic, an
    overwrite write touching only month B replaces ONLY month B's
    partition — month A survives. Static mode (the default) would
    clobber the whole table; this is the correction-run pattern for a
    month-partitioned 100 TB fact."""
    d = str(tmp_path / "fact")
    df = spark.createDataFrame(
        [("2026-01", 1, 10.0), ("2026-02", 2, 20.0)], ["month", "id", "v"]
    )
    df.write.partitionBy("month").parquet(d)

    fixed = spark.createDataFrame([("2026-02", 2, 99.0)], ["month", "id", "v"])
    (
        fixed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("month")
        .parquet(d)
    )
    got = {r["month"]: r["v"] for r in spark.read.parquet(d).collect()}
    assert got == {"2026-01": 10.0, "2026-02": 99.0}
