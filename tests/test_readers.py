"""Reader tests: native-format round-trips and dirty-input degradation."""

from __future__ import annotations

import pytest

from etl_pipeline_orchestration_spark.operators.cleaning import clean_common
from etl_pipeline_orchestration_spark.sources import landing, readers


@pytest.fixture(scope="module")
def landing_paths(tmp_path_factory):
    return landing.ensure_landing(str(tmp_path_factory.mktemp("landing_rd")))


def test_all_readers_roundtrip(spark, landing_paths):
    checks = [
        (readers.read_sales_csv, "sales_csv", 1000, "sale_id"),
        (readers.read_customers_json, "customers_json", 800, "customer_id"),
        (readers.read_inventory_excel, "inventory_excel", 400, "sku"),
        (readers.read_hr_flat_file, "hr_flat", 300, "emp_id"),
        (readers.read_web_logs, "web_logs", 2000, "event_id"),
    ]
    for fn, key, n, idcol in checks:
        df = fn(spark, landing_paths[key])
        assert df.count() == n, key
        assert df.filter(f"{idcol} IS NULL").count() == 0, key


def test_sqlite_reader(spark, landing_paths):
    df = readers.read_finance_sqlite(spark, landing_paths["finance_db"])
    assert df.count() == 600
    assert dict(df.dtypes)["debit"] == "double"


def test_hr_boolean_parses(spark, landing_paths):
    df = readers.read_hr_flat_file(spark, landing_paths["hr_flat"])
    vals = {r["active"] for r in df.select("active").distinct().collect()}
    assert vals == {True, False}  # pandas writes True/False; parser must cope


def test_weblog_garbage_lines_null_then_cleaned(spark, tmp_path):
    p = tmp_path / "bad.log"
    p.write_text(
        'EVT1 U1 [2026-01-01 10:00:00] "click" SES1 mobile\n'
        "this line is garbage\n"
        'EVT2 U2 [2026-01-01 10:01:00] "login" SES2 desktop\n'
    )
    raw = readers.read_web_logs(spark, str(p))
    assert raw.count() == 3  # garbage parses to all-NULL fields
    cleaned = clean_common(raw, null_exempt=())
    assert sorted(r["event_id"] for r in cleaned.collect()) == ["EVT1", "EVT2"]


def test_sales_csv_bad_numeric_degrades_to_null(spark, tmp_path):
    p = tmp_path / "sales_bad.csv"
    p.write_text(
        "sale_id,date,region,product,revenue,units,source\n"
        "S1,2026-01-01,North,A,100.5,3,CSV_SALES\n"
        "S2,2026-01-02,South,B,not_a_number,xyz,CSV_SALES\n"
    )
    df = readers.read_sales_csv(spark, str(p))
    rows = {r["sale_id"]: r for r in df.collect()}
    assert rows["S1"]["revenue"] == 100.5
    assert rows["S2"]["revenue"] is None  # PERMISSIVE coerce-to-null
    assert rows["S2"]["units"] is None


def test_json_corrupt_record_handling(spark, tmp_path):
    """Dirty-input robustness on the JSON path: PERMISSIVE mode routes
    malformed lines into _corrupt_record (the dead-letter column) and
    keeps good rows; DROPMALFORMED silently drops them — the ETL
    chooses per source how strict to be."""
    p = str(tmp_path / "dirty.json")
    with open(p, "w") as f:
        f.write('{"id": 1, "v": "ok"}\n')
        f.write('{"id": 2, "v": BROKEN\n')
        f.write('{"id": 3, "v": "fine"}\n')

    permissive = (
        spark.read.schema("id BIGINT, v STRING, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(p)
    )
    rows = permissive.collect()
    assert len(rows) == 3
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 1 and "BROKEN" in corrupt[0]["_corrupt_record"]

    dropped = (
        spark.read.schema("id BIGINT, v STRING")
        .option("mode", "DROPMALFORMED")
        .json(p)
    )
    assert sorted(r["id"] for r in dropped.collect()) == [1, 3]


def test_file_metadata_columns(spark, tmp_path):
    """The hidden _metadata struct gives per-row file lineage (path,
    name, size, modification time) with no extra scan cost — the
    provenance column an audit pipeline selects alongside the data."""
    d = str(tmp_path / "meta_src")
    spark.range(5).write.parquet(d)
    rows = (
        spark.read.parquet(d)
        .select("id", "_metadata.file_name", "_metadata.file_size")
        .collect()
    )
    assert len(rows) == 5
    assert all(r["file_name"].endswith(".parquet") for r in rows)
    assert all(r["file_size"] > 0 for r in rows)


def test_events_load_restores_legacy_parquet_conf(spark):
    """_load_events must not leak spark.sql.legacy.parquet.nanosAsLong
    session-globally (VERDICT r2 carry-over): the conf goes back to its
    prior value right after the read call, and actions on the returned
    plan still succeed because the conf was resolved into the scan."""
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        df = load_table(spark, "/root/testdata/sf0.001", "events")
        assert spark.conf.get(key) == "false"  # restored immediately
        assert df.count() > 0  # lazy action fine after restore
        assert spark.conf.get(key) == "false"
        assert df.schema["ts"].dataType.typeName() == "timestamp"
    finally:
        spark.conf.set(key, prev)


def test_read_parquet_evolved_additive_columns(spark, tmp_path):
    """A producer added a column mid-stream: mergeSchema unions the
    footers, old files null-fill, and the expected-schema projection
    pins the output contract (order, types, no extras)."""
    from pyspark.sql import types as T

    from etl_pipeline_orchestration_spark.sources.readers import (
        read_parquet_evolved,
    )

    land = str(tmp_path / "landing")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string").write.parquet(
        land
    )
    spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    ).write.mode("append").parquet(land)

    expected = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
            T.StructField("added_later", T.IntegerType()),  # not in any file
        ]
    )
    out = read_parquet_evolved(spark, land, expected)
    assert [f.name for f in out.schema.fields] == ["id", "name", "score", "added_later"]
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 3
    assert rows[1]["score"] is None and rows[3]["score"] == 9.5
    assert all(r["added_later"] is None for r in rows.values())
    # Without an expected schema the merged relation carries the union.
    merged = read_parquet_evolved(spark, land)
    assert {f.name for f in merged.schema.fields} == {"id", "name", "score"}
