"""Bloom-filter data-skipping sidecar (operators/bloom_index.py):
no false negatives ever, real partition pruning, fail-safe staleness
refusal."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import WarehouseLoader
from etl_pipeline_orchestration_spark.operators import bloom_index
from etl_pipeline_orchestration_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    """Orders laid out by month (the natural partition), bloom-indexed
    on o_custkey (the non-partition lookup column)."""
    wh = str(tmp_path_factory.mktemp("bloom_wh"))
    loader = WarehouseLoader(spark, wh)
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    loader.load(orders, "orders_by_month", if_exists="replace",
                partition_by=["month"])
    df = spark.read.parquet(loader._path("orders_by_month"))
    bloom_index.build(loader, df, "orders_custkey_bloom", "o_custkey", "month")
    bloom_index.build_minmax(loader, df, "orders_date_mm", "o_orderdate", "month")
    bloom_index.build_minmax(loader, df, "orders_price_mm", "o_totalprice", "month")
    return loader, df


def test_lookup_equals_full_scan_for_every_probe(spark, warehouse):
    """No false negatives: for many probe keys the pruned lookup must
    return exactly the rows a full-scan filter returns."""
    loader, df = warehouse
    keys = [r.o_custkey for r in df.select("o_custkey").distinct().limit(25).collect()]
    for k in keys:
        got = sorted(
            r.o_orderkey
            for r in bloom_index.lookup(
                spark, loader, "orders_by_month", "orders_custkey_bloom",
                "o_custkey", "month", k,
            ).collect()
        )
        want = sorted(
            r.o_orderkey for r in df.filter(F.col("o_custkey") == k).collect()
        )
        assert got == want and len(want) > 0


def test_absent_key_prunes_everything_or_almost(spark, warehouse):
    """A key that exists nowhere should prune to (near) zero candidate
    partitions — the bloom's whole point; with 2^15 bits the expected
    false-positive rate is ~per-mille here, so over 50 absent probes
    the average candidate count must be far below the partition count."""
    loader, df = warehouse
    n_parts = df.select("month").distinct().count()
    total = 0
    for k in range(10_000_000, 10_000_050):
        cands = bloom_index.candidate_partitions(
            spark, loader, "orders_custkey_bloom", k
        )
        rows = bloom_index.lookup(
            spark, loader, "orders_by_month", "orders_custkey_bloom",
            "o_custkey", "month", k,
        ).count()
        assert rows == 0  # false positives never surface rows
        total += len(cands)
    assert total / 50 < n_parts / 4, (total / 50, n_parts)


def test_present_key_scans_fewer_partitions_than_table(spark, warehouse):
    """Pruning is real: a present key's candidate set is limited to
    partitions that can contain it (<= its true partition count plus
    rare false positives), not the whole table."""
    loader, df = warehouse
    k = df.select("o_custkey").distinct().head()[0]
    true_parts = {
        r.month
        for r in df.filter(F.col("o_custkey") == k).select("month").distinct().collect()
    }
    cands = set(
        bloom_index.candidate_partitions(spark, loader, "orders_custkey_bloom", k)
    )
    n_parts = df.select("month").distinct().count()
    assert true_parts <= cands  # no false negatives at partition level
    assert len(cands) < n_parts  # and it actually pruned something


def test_pruned_scan_reads_fewer_files(spark, warehouse):
    """The isin filter reaches the source as partition pruning: the
    lookup plan's inputFiles are a strict subset of the full scan's."""
    loader, df = warehouse
    k = df.select("o_custkey").distinct().head()[0]
    pruned = bloom_index.lookup(
        spark, loader, "orders_by_month", "orders_custkey_bloom",
        "o_custkey", "month", k,
    )
    n_all = len(spark.read.parquet(loader._path("orders_by_month")).inputFiles())
    n_pruned = len(pruned.inputFiles())
    assert 0 < n_pruned < n_all, (n_pruned, n_all)


def test_stale_sidecar_refuses_to_prune(spark, warehouse, tmp_path):
    """Fail-safe: pruning with a fingerprint that no longer matches the
    sidecar's stored one must raise, because a stale bloom could
    silently drop rows (the unforgivable false negative)."""
    loader, df = warehouse
    fp = bloom_index.table_fingerprint(df, "o_custkey", "month")
    k = df.select("o_custkey").distinct().head()[0]
    # correct fingerprint: fine
    bloom_index.candidate_partitions(
        spark, loader, "orders_custkey_bloom", k, expect_fingerprint=fp
    )
    with pytest.raises(ValueError, match="stale bloom"):
        bloom_index.candidate_partitions(
            spark, loader, "orders_custkey_bloom", k, expect_fingerprint=fp + 1
        )


def test_range_scan_equals_full_scan(spark, warehouse):
    """Zone maps: for correlated (order date vs month) and
    uncorrelated (total price) keys alike, the pruned range scan must
    equal the full-scan range filter — pruning may differ, rows may
    not."""
    import datetime

    loader, df = warehouse
    lo, hi = datetime.date(1995, 3, 1), datetime.date(1995, 9, 30)
    got = sorted(
        r.o_orderkey
        for r in bloom_index.range_scan(
            spark, loader, "orders_by_month", "orders_date_mm",
            "o_orderdate", "month", lo, hi,
        ).collect()
    )
    want = sorted(
        r.o_orderkey
        for r in df.filter(
            (F.col("o_orderdate") >= F.lit(lo)) & (F.col("o_orderdate") <= F.lit(hi))
        ).collect()
    )
    assert got == want and len(want) > 0
    got_p = sorted(
        r.o_orderkey
        for r in bloom_index.range_scan(
            spark, loader, "orders_by_month", "orders_price_mm",
            "o_totalprice", "month", 1000.0, 5000.0,
        ).collect()
    )
    want_p = sorted(
        r.o_orderkey
        for r in df.filter(F.col("o_totalprice").between(1000.0, 5000.0)).collect()
    )
    assert got_p == want_p and len(want_p) > 0


def test_range_scan_prunes_correlated_key(spark, warehouse):
    """A date window over the month-partitioned table must prune to
    roughly the window's months (the zone map's whole point when the
    key correlates with layout)."""
    import datetime

    loader, df = warehouse
    n_parts = df.select("month").distinct().count()
    cands = bloom_index.range_candidates(
        loader, "orders_date_mm",
        datetime.date(1995, 3, 1), datetime.date(1995, 9, 30),
    )
    assert 0 < len(cands) <= 8, cands
    assert len(cands) < n_parts / 4


def test_minmax_stale_refusal(spark, warehouse):
    loader, df = warehouse
    fp = bloom_index.table_fingerprint(df, "o_orderdate", "month")
    with pytest.raises(ValueError, match="stale minmax"):
        bloom_index.range_candidates(
            loader, "orders_date_mm", None, None, expect_fingerprint=fp + 1
        )


def test_partitioned_compact_preserves_layout(spark, tmp_path):
    """Partition-aware compaction: many small appended files collapse
    to few per hive partition, the month=... layout (and thus
    partition pruning) survives, and content is unchanged."""
    import os

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    for i in range(6):  # six small appends -> many files per partition
        loader.load(
            orders.filter(F.col("o_orderkey") % 6 == i).repartition(4),
            "orders_small", if_exists="append", partition_by=["month"],
        )
    path = loader._path("orders_small")
    before_files = len(spark.read.parquet(path).inputFiles())
    before = sorted(r.o_orderkey for r in spark.read.parquet(path).collect())
    loader.compact("orders_small", target_files=2, partition_by=["month"])
    after_df = spark.read.parquet(path)
    assert sorted(r.o_orderkey for r in after_df.collect()) == before
    assert "month" in after_df.columns  # hive layout survived
    assert any(d.startswith("month=") for d in os.listdir(path))
    after_files = len(after_df.inputFiles())
    assert after_files < before_files / 3, (before_files, after_files)
    # each hive partition holds at most target_files files
    for d in os.listdir(path):
        if d.startswith("month="):
            n = len([f for f in os.listdir(os.path.join(path, d))
                     if f.endswith(".parquet")])
            assert n <= 2, (d, n)


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path):
    """Append rows into TWO partitions, refresh only those two: the
    sidecar must behave identically to a from-scratch rebuild (same
    candidates for every probe), and the untouched partitions' bitmaps
    must carry forward byte-for-byte."""
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    base = orders.filter(F.col("o_orderkey") % 2 == 0)
    loader.load(base, "t", if_exists="replace", partition_by=["month"])
    df0 = spark.read.parquet(loader._path("t"))
    bloom_index.build(loader, df0, "t_bloom", "o_custkey", "month")
    old_side = {
        r.part: bytes(r.bloom)
        for r in __import__(
            "etl_pipeline_orchestration_spark.loader", fromlist=["SnapshotTable"]
        ).SnapshotTable(loader, "t_bloom").read().collect()
    }
    # Append odd orders belonging to two specific months
    extra = orders.filter(
        (F.col("o_orderkey") % 2 == 1) & F.col("month").isin("1995-03", "1996-07")
    )
    assert extra.count() > 0
    loader.load(extra, "t", if_exists="append", partition_by=["month"])
    df1 = spark.read.parquet(loader._path("t"))
    bloom_index.refresh_partitions(
        loader, df1, "t_bloom", "o_custkey", "month", ["1995-03", "1996-07"]
    )
    # full rebuild reference
    bloom_index.build(loader, df1, "t_bloom_ref", "o_custkey", "month")
    fp = bloom_index.table_fingerprint(df1, "o_custkey", "month")
    keys = [r.o_custkey for r in extra.select("o_custkey").distinct().limit(10).collect()]
    for k in keys:
        got = sorted(bloom_index.candidate_partitions(
            spark, loader, "t_bloom", k, expect_fingerprint=fp))
        ref = sorted(bloom_index.candidate_partitions(
            spark, loader, "t_bloom_ref", k, expect_fingerprint=fp))
        assert got == ref
    # untouched partitions carried forward byte-for-byte
    from etl_pipeline_orchestration_spark.loader import SnapshotTable

    new_side = {
        r.part: bytes(r.bloom)
        for r in SnapshotTable(loader, "t_bloom").read().collect()
    }
    for part, bits in old_side.items():
        if part not in ("1995-03", "1996-07"):
            assert new_side[part] == bits, part
    # lookups through the refreshed sidecar find the appended rows
    k = extra.select("o_custkey").head()[0]
    got_rows = sorted(
        r.o_orderkey
        for r in bloom_index.lookup(
            spark, loader, "t", "t_bloom", "o_custkey", "month", k,
            expect_fingerprint=fp,
        ).collect()
    )
    want_rows = sorted(
        r.o_orderkey for r in df1.filter(F.col("o_custkey") == k).collect()
    )
    assert got_rows == want_rows and len(want_rows) > 0


def test_float_and_decimal_keys_fail_fast(spark, warehouse):
    """The unforgivable-false-negative guards: float/decimal key
    COLUMNS refuse at build, float PROBES refuse at lookup."""
    loader, df = warehouse
    with pytest.raises(TypeError, match="float/decimal"):
        bloom_index.build(loader, df, "bad_bloom", "o_totalprice", "month")
    k = df.select("o_custkey").head()[0]
    with pytest.raises(TypeError, match="must not be floats"):
        bloom_index.candidate_partitions(
            spark, loader, "orders_custkey_bloom", float(k)
        )


def test_empty_sidecar_fails_safe_once_table_has_rows(spark, tmp_path):
    """A sidecar built on an EMPTY table must refuse fingerprint-
    checked pruning after rows appear — not silently return zero
    candidates."""
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    empty = orders.filter(F.lit(False))
    loader.load(empty, "t", if_exists="replace", partition_by=["month"])
    bloom_index.build(loader, empty, "t_bloom", "o_custkey", "month")
    # table gains rows; sidecar is now stale
    loader.load(orders, "t", if_exists="append", partition_by=["month"])
    df = spark.read.parquet(loader._path("t"))
    fp = bloom_index.table_fingerprint(df, "o_custkey", "month")
    with pytest.raises(ValueError, match="empty"):
        bloom_index.candidate_partitions(
            spark, loader, "t_bloom", 1, expect_fingerprint=fp
        )


def test_hive_escaping_of_partition_values():
    from etl_pipeline_orchestration_spark.operators.bloom_index import (
        _escape_hive,
    )

    assert _escape_hive("2024-01-01 00:00:00") == "2024-01-01 00%3A00%3A00"
    assert _escape_hive("a/b*c[d]") == "a%2Fb%2Ac%5Bd%5D"
    assert _escape_hive("plain-1.2_x") == "plain-1.2_x"


def test_null_candidates_consumes_has_null(spark, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    orders = load_table(spark, SF_DIR, "orders").withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    ).withColumn(
        "maybe_key",
        F.when(F.col("month") == "1995-01", F.lit(None).cast("bigint"))
        .otherwise(F.col("o_custkey")),
    )
    loader.load(orders, "t", if_exists="replace", partition_by=["month"])
    df = spark.read.parquet(loader._path("t"))
    bloom_index.build_minmax(loader, df, "t_mm", "maybe_key", "month")
    nulls = bloom_index.null_candidates(loader, "t_mm")
    assert nulls == ["1995-01"]
