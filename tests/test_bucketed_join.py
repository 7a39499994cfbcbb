"""Bucketed co-located join: two tables bucketed on the join key must
join with NO exchange — the shuffle was pre-paid at write time."""

from __future__ import annotations

import contextlib
import io

import pytest

from etl_pipeline_orchestration_spark.loader import WarehouseLoader


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    import glob

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    loader.load(orders.repartition(32), "orders_frag", if_exists="replace")
    frag_files = glob.glob(str(tmp_path / "wh" / "orders_frag" / "*.parquet"))
    assert len(frag_files) == 32
    n_before = loader.table_count("orders_frag")

    loader.compact("orders_frag", target_files=4)
    compact_files = glob.glob(str(tmp_path / "wh" / "orders_frag" / "*.parquet"))
    assert len(compact_files) == 4
    assert loader.table_count("orders_frag") == n_before


def test_bucketed_join_no_shuffle(spark, tmp_path, no_broadcast):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    loader.save_bucketed(orders, "b_orders", ["o_custkey"], num_buckets=8)
    loader.save_bucketed(cust, "b_customer", ["c_custkey"], num_buckets=8)

    bo = spark.table("b_orders")
    bc = spark.table("b_customer")
    joined = bo.join(bc, bo.o_custkey == bc.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain("simple")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
    # and the join is still correct
    assert joined.count() == orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).count()


def test_compaction_swap_never_leaves_table_absent(spark, tmp_path, monkeypatch):
    """The rename-aside swap must keep a readable table directory at
    every crash point: simulate a crash right after the first rename
    and verify the old directory still holds the full data."""
    import glob
    import os

    from etl_pipeline_orchestration_spark.loader import WarehouseLoader

    loader = WarehouseLoader(spark, str(tmp_path / "wh2"))
    df = spark.range(1000).selectExpr("id", "id * 2 AS v")
    loader.load(df, "t", if_exists="replace")
    src = str(tmp_path / "wh2" / "t")

    real_rename = os.rename
    calls = []

    def crashing_rename(a, b):
        real_rename(a, b)
        calls.append((a, b))
        if len(calls) == 1:  # crash after renaming old aside
            raise RuntimeError("simulated crash mid-swap")

    monkeypatch.setattr(os, "rename", crashing_rename)
    try:
        loader.compact("t", target_files=2)
    except RuntimeError:
        pass
    monkeypatch.setattr(os, "rename", real_rename)
    # Data survives in SOME directory (old-aside or new) — nothing lost.
    surviving = [
        p for p in glob.glob(str(tmp_path / "wh2" / "*"))
        if glob.glob(os.path.join(p, "*.parquet"))
    ]
    assert surviving, "no readable table directory after simulated crash"
    total = sum(
        spark.read.parquet(p).count() for p in surviving[:1]
    )
    assert total == 1000


def test_compaction_crash_window_self_heals(spark, tmp_path, monkeypatch):
    """A crash BETWEEN the two swap renames leaves the table path absent
    (data safe in the aside dir); the next compact() must roll the aside
    back and complete normally — no manual rename, no data loss."""
    import glob
    import os

    from etl_pipeline_orchestration_spark.loader import WarehouseLoader

    loader = WarehouseLoader(spark, str(tmp_path / "wh3"))
    df = spark.range(777).selectExpr("id", "id * 3 AS v")
    loader.load(df, "t", if_exists="replace")
    src = str(tmp_path / "wh3" / "t")

    real_rename = os.rename
    calls = []

    def crashing_rename(a, b):
        real_rename(a, b)
        calls.append((a, b))
        if len(calls) == 1:  # crash after rename(src, old), before rename(tmp, src)
            raise RuntimeError("simulated crash mid-swap")

    monkeypatch.setattr(os, "rename", crashing_rename)
    with pytest.raises(RuntimeError):
        loader.compact("t", target_files=2)
    monkeypatch.setattr(os, "rename", real_rename)

    assert not os.path.exists(src)  # the crash window is real...
    loader.compact("t", target_files=2)  # ...and recovery closes it
    assert spark.read.parquet(src).count() == 777
    assert len(glob.glob(os.path.join(src, "*.parquet"))) <= 2
    assert not os.path.exists(str(tmp_path / "wh3" / "__compact_old_t"))
