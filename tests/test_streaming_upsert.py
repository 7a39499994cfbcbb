"""Streaming upsert and range-clustered layout tests."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import WarehouseLoader
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming import read_events_stream
from etl_pipeline_orchestration_spark.streaming.upsert import (
    stream_upsert_to_warehouse,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("upsert_events"))
    load_table(spark, SF, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_stream_upsert_equals_batch_latest(spark, events_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    stream_upsert_to_warehouse(
        stream.select("user_id", "event_id", "ts", "value"),
        loader,
        table="user_latest",
        key="user_id",
        seq_col="event_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    # batch twin: latest event per user over ALL the data, by the same
    # (event_id) sequence order the incremental merge used
    ev = spark.read.parquet(events_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("event_id").desc())
    expected = (
        ev.select("user_id", "event_id", "ts", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    got = sorted(tuple(r) for r in loader.read("user_latest").collect())
    want = sorted(tuple(r) for r in expected.collect())
    assert got == want


def test_snapshot_upsert_stream_equals_batch_latest(spark, events_dir, tmp_path):
    """Snapshot-versioned path twin: CURRENT == batch recompute, one
    version per micro-batch, and time travel to version k shows the
    state BEFORE the later batches merged."""
    from etl_pipeline_orchestration_spark.streaming.upsert import (
        stream_upsert_snapshots,
    )

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    snaps = stream_upsert_snapshots(
        stream.select("user_id", "event_id", "ts", "value"),
        loader,
        table="user_latest_v",
        key="user_id",
        seq_col="event_id",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    assert len(snaps.versions()) == 4  # one per input file
    ev = spark.read.parquet(events_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("event_id").desc())
    expected = (
        ev.select("user_id", "event_id", "ts", "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    got = sorted(tuple(r) for r in snaps.read().collect())
    want = sorted(tuple(r) for r in expected.collect())
    assert got == want
    # time travel: every version's max sequence is monotone and the
    # first version holds strictly fewer-or-equal keys than CURRENT
    v0 = snaps.read(version=snaps.versions()[0])
    assert v0.count() <= snaps.read().count()
    maxes = [
        snaps.read(version=v).agg(F.max("event_id")).head()[0]
        for v in snaps.versions()
    ]
    assert maxes == sorted(maxes)


def test_snapshot_upsert_replay_skipped(spark, tmp_path):
    from etl_pipeline_orchestration_spark.loader import SnapshotTable
    from etl_pipeline_orchestration_spark.streaming.upsert import (
        upsert_batch_versioned,
    )

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "t")
    b0 = spark.createDataFrame([(1, 10, "a"), (2, 11, "b")], "k int, seq int, v string")
    assert upsert_batch_versioned(snaps, "k", b0, "seq", 0, "ck") is True
    assert upsert_batch_versioned(snaps, "k", b0, "seq", 0, "ck") is False
    assert len(snaps.versions()) == 1  # replay published nothing
    # stale row (seq 5 < 10) must not clobber; new key merges in
    b1 = spark.createDataFrame([(1, 5, "stale"), (3, 12, "c")], "k int, seq int, v string")
    assert upsert_batch_versioned(snaps, "k", b1, "seq", 1, "ck") is True
    got = {r["k"]: (r["seq"], r["v"]) for r in snaps.read().collect()}
    assert got == {1: (10, "a"), 2: (11, "b"), 3: (12, "c")}
    with pytest.raises(ValueError, match="checkpoint"):
        upsert_batch_versioned(snaps, "k", b1, "seq", 0, "other")


def test_upsert_recovers_interrupted_swap(spark, tmp_path):
    """A crash between the swap's two renames leaves the table absent
    and the rename-aside dir holding the full history; the next
    upsert_batch must restore it and merge on top — not silently
    rebuild from the current batch alone (ADVICE r2)."""
    import os

    from etl_pipeline_orchestration_spark.streaming.upsert import upsert_batch

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    b1 = spark.createDataFrame(
        [(1, 10, 100.0), (2, 11, 200.0)], "user_id long, event_id long, value double"
    )
    upsert_batch(loader, "t", "user_id", b1, "event_id")

    # Simulate the crash window: table renamed aside, new dir not yet in.
    os.rename(loader._path("t"), loader._path("__upsert_t.old"))
    assert not os.path.isdir(loader._path("t"))

    b2 = spark.createDataFrame(
        [(2, 12, 250.0), (3, 13, 300.0)], "user_id long, event_id long, value double"
    )
    upsert_batch(loader, "t", "user_id", b2, "event_id")

    got = {r["user_id"]: (r["event_id"], r["value"]) for r in loader.read("t").collect()}
    # user 1 survives from the recovered history; user 2 updated; 3 new
    assert got == {1: (10, 100.0), 2: (12, 250.0), 3: (13, 300.0)}
    assert not os.path.isdir(loader._path("__upsert_t.old"))  # cleaned up


def test_zorder_layout_tightens_both_dimensions(spark, tmp_path):
    """Z-order layout must keep per-file min/max spans bounded on BOTH
    cluster columns, where a linear sort on the first column leaves the
    second column's spans at ~the full domain (no skipping). Spans are
    read from the written files, so this pins the actual data-skipping
    benefit, not just the z-value math (which has its own oracle)."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    orders = load_table(spark, SF, "orders").withColumn(
        "o_days",
        F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1992-01-01"))),
    )
    a, b = F.col("o_custkey"), F.col("o_days")

    def mean_norm_span(table, col):
        files = sorted(glob.glob(str(tmp_path / "wh" / table / "*.parquet")))
        assert len(files) >= 4
        spans, los, his = [], [], []
        for f in files:
            md = pq.read_metadata(f)
            idx = md.schema.names.index(col)
            st = [md.row_group(rg).column(idx).statistics for rg in range(md.num_row_groups)]
            lo, hi = min(s.min for s in st), max(s.max for s in st)
            spans.append(hi - lo)
            los.append(lo)
            his.append(hi)
        domain = max(his) - min(los)
        return sum(spans) / len(spans) / domain

    loader.write_zorder_clustered(orders, "orders_z", a, b, target_files=16)
    loader.write_range_clustered(orders, "orders_lin", ["o_custkey"], target_files=16)

    # Linear layout: first column tight, second column ~full domain.
    assert mean_norm_span("orders_lin", "o_custkey") < 0.2
    assert mean_norm_span("orders_lin", "o_days") > 0.8
    # Z-order: BOTH columns bounded well below the full domain.
    z_cust = mean_norm_span("orders_z", "o_custkey")
    z_days = mean_norm_span("orders_z", "o_days")
    assert z_cust < 0.6, z_cust
    assert z_days < 0.6, z_days


def test_range_clustered_files_have_disjoint_key_ranges(spark, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    orders = load_table(spark, SF, "orders")
    loader.write_range_clustered(
        orders, "orders_by_date", cluster_cols=["o_orderdate"], target_files=4
    )
    files = sorted(glob.glob(str(tmp_path / "wh" / "orders_by_date" / "*.parquet")))
    assert len(files) >= 3  # range partitioner may merge tiny tails
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.names.index("o_orderdate")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # each file owns a disjoint key range -> stats-based file skipping works
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo
