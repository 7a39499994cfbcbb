"""Streaming governance maintenance (streaming/governance_stream.py):
ONE additive cell relation must reproduce all three batch governance
audits — k-anonymity, l-diversity, t-closeness — bit-for-bit on the
drained history, under BOTH arrival orders, with the replay guard
pinned (sum-merge is not idempotent)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.registry import QUERIES, load_all
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.governance_stream import (
    governance_cells,
    governance_cells_batch,
    k_anonymity_from_cells,
    l_diversity_from_cells,
    merge_governance_cells,
    read_customers_stream,
    stream_governance_cells_to_warehouse,
    t_closeness_from_cells,
)

SF = "/root/testdata/sf0.001"


def _chunked_customers_dir(tmp_path_factory, order) -> str:
    d = str(tmp_path_factory.mktemp(f"gov_{''.join(map(str, order))}"))
    t = pq.read_table(f"{SF}/customer.parquet")
    idx = sorted(range(t.num_rows), key=lambda i: t["c_custkey"][i].as_py())
    per = (len(idx) + 3) // 4
    chunks = [idx[i * per : (i + 1) * per] for i in range(4)]
    for arrival, ci in enumerate(order):
        path = os.path.join(d, f"part-{ci}.parquet")
        pq.write_table(t.take(pa.array(chunks[ci], pa.int64())), path)
        mt = 1_700_000_000 + arrival * 100
        os.utime(path, (mt, mt))
    return d


@pytest.fixture(scope="module")
def fwd_dir(tmp_path_factory):
    return _chunked_customers_dir(tmp_path_factory, (0, 1, 2, 3))


@pytest.fixture(scope="module")
def rev_dir(tmp_path_factory):
    return _chunked_customers_dir(tmp_path_factory, (3, 0, 2, 1))


def _drain(spark, customers_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_customers_stream(spark, customers_dir, max_files_per_trigger=1)
    return stream_governance_cells_to_warehouse(
        stream, loader, "gov_cells", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_cells_reproduce_all_three_audits(spark, fwd_dir, tmp_path):
    load_all()
    snaps = _drain(spark, fwd_dir, tmp_path)
    assert len(snaps.versions()) == 4
    cust = load_table(spark, SF, "customer")
    assert _rows(snaps.read()) == _rows(governance_cells(cust))
    cells = snaps.read()
    # each derived audit must equal the INDEPENDENT batch query path
    assert _rows(k_anonymity_from_cells(cells)) == _rows(
        QUERIES["k_anonymity_risk_report"](spark, SF)
    )
    assert _rows(l_diversity_from_cells(cells)) == _rows(
        QUERIES["l_diversity_risk_report"](spark, SF)
    )
    assert _rows(t_closeness_from_cells(cells)) == _rows(
        QUERIES["t_closeness_risk_report"](spark, SF)
    )


def test_streamed_cells_arrival_order_free(spark, rev_dir, tmp_path):
    snaps = _drain(spark, rev_dir, tmp_path)
    cust = load_table(spark, SF, "customer")
    assert _rows(snaps.read()) == _rows(governance_cells(cust))


def test_merge_laws_and_replay_guard(spark, tmp_path):
    cust = load_table(spark, SF, "customer")
    a = governance_cells(cust.filter("c_custkey % 2 = 0"))
    b = governance_cells(cust.filter("c_custkey % 2 = 1"))
    assert _rows(merge_governance_cells(a, b)) == _rows(governance_cells(cust))

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "gc")
    small = cust.limit(50)
    assert governance_cells_batch(snaps, small, 0, "ck") is True
    before = _rows(snaps.read())
    assert governance_cells_batch(snaps, small, 0, "ck") is False
    assert _rows(snaps.read()) == before
    assert governance_cells_batch(snaps, small, 1, "ck") is True
    doubled = {k[:3]: k[3] for k in _rows(snaps.read())}
    base = {k[:3]: k[3] for k in before}
    assert doubled == {k: 2 * v for k, v in base.items()}
