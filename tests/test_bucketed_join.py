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
