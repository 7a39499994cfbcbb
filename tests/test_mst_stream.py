"""Streaming MSF maintenance (streaming/mst_stream.py): the forest
published from the maintained basket relation must equal the one-shot
batch query edge-for-edge under BOTH arrival orders, with chunks that
split orders mid-basket (edge weights derive from pair counts, which
are not batch-additive — the basket set is the statistic that is)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import WarehouseLoader
from etl_pipeline_orchestration_spark.plans import registry
from etl_pipeline_orchestration_spark.streaming.mst_stream import (
    published_msf,
    read_lineitem_stream,
    stream_baskets_to_warehouse,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _chunked_li_dir(tmp_path_factory, order) -> str:
    d = str(tmp_path_factory.mktemp(f"mst_{''.join(map(str, order))}"))
    t = pq.read_table(f"{SF}/lineitem.parquet")
    idx = sorted(
        range(t.num_rows),
        key=lambda i: (
            t["l_orderkey"][i].as_py(),
            t["l_linenumber"][i].as_py(),
        ),
    )
    per = (len(idx) + 3) // 4
    chunks = [idx[i * per : (i + 1) * per] for i in range(4)]
    for arrival, ci in enumerate(order):
        path = os.path.join(d, f"part-{ci}.parquet")
        pq.write_table(t.take(pa.array(chunks[ci], pa.int64())), path)
        mt = 1_700_000_000 + arrival * 100
        os.utime(path, (mt, mt))
    return d


def _drain(spark, li_dir, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_lineitem_stream(spark, li_dir, max_files_per_trigger=1)
    return stream_baskets_to_warehouse(
        stream, loader, "mst_baskets", str(tmp_path / "ckpt")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("order", [(0, 1, 2, 3), (2, 0, 3, 1)])
def test_published_forest_equals_batch(spark, tmp_path_factory, tmp_path, order):
    li_dir = _chunked_li_dir(tmp_path_factory, order)
    snaps = _drain(spark, li_dir, tmp_path)
    want = _rows(
        registry.QUERIES["mst_copurchase_parts"](spark, SF).selectExpr(
            "part_a as u", "part_b as v", "w"
        )
    )
    got = _rows(published_msf(spark, snaps))
    assert got == want
    assert len(got) > 50


@pytest.mark.parametrize("order", [(0, 1, 2, 3), (2, 0, 3, 1)])
def test_published_spectral_and_walks_equal_batch(
    spark, tmp_path_factory, tmp_path, order
):
    """The basket statistic serves every graph product: spectral
    bipartition and DeepWalk pair counts re-derived from streamed
    baskets must equal their one-shot batch queries bit-for-bit under
    both arrival orders."""
    from etl_pipeline_orchestration_spark.streaming.mst_stream import (
        published_deepwalk_pairs,
        published_spectral_bipartition,
    )

    li_dir = _chunked_li_dir(tmp_path_factory, order)
    snaps = _drain(spark, li_dir, tmp_path)
    want_spec = _rows(registry.QUERIES["spectral_bipartition_parts"](spark, SF))
    assert _rows(published_spectral_bipartition(spark, snaps)) == want_spec
    want_walks = _rows(registry.QUERIES["deepwalk_skipgram_pairs"](spark, SF))
    assert _rows(published_deepwalk_pairs(spark, snaps)) == want_walks
