"""Streaming count-min maintenance (streaming/cms_stream.py): the cell
grid is an exact commutative monoid — stream == batch bit-for-bit in
any arrival order, point estimates never underestimate true counts
across the whole drained history, replay-skipped, checkpoint-guarded."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import (
    SnapshotTable,
    WarehouseLoader,
)
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.cms_stream import (
    batch_cells,
    cms_batch,
    cms_point_estimates,
    merge_cells,
    stream_cms_to_warehouse,
)

SF = "/root/testdata/sf0.001"

DOCS_SCHEMA = "doc_id long, text string, source string"


def _doc_rows(spark):
    return (
        load_table(spark, SF, "documents")
        .select("doc_id", "text", "source")
        .orderBy("doc_id")
        .collect()
    )


def _grid(df):
    return {(r.i, r.pos): r.total for r in df.collect()}


def _write_chunks(rows, d, order):
    per = (len(rows) + len(order) - 1) // len(order)
    chunks = [rows[i * per : (i + 1) * per] for i in range(len(order))]
    for arrival, idx in enumerate(order):
        chunk = chunks[idx]
        table = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in chunk], pa.int64()),
                "text": pa.array([r["text"] for r in chunk], pa.string()),
                "source": pa.array([r["source"] for r in chunk], pa.string()),
            }
        )
        path = os.path.join(d, f"part-{idx}.parquet")
        pq.write_table(table, path)
        t = 1_700_000_000 + arrival * 100
        os.utime(path, (t, t))


def _run_stream(spark, rows, tmp_path, order, tag):
    d = str(tmp_path / f"docs_{tag}")
    os.makedirs(d)
    _write_chunks(rows, d, order)
    loader = WarehouseLoader(spark, str(tmp_path / f"wh_{tag}"))
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    return stream_cms_to_warehouse(
        stream, loader, "cms_cells", str(tmp_path / f"ckpt_{tag}")
    )


def test_streamed_grid_equals_batch_in_any_order(spark, tmp_path):
    rows = _doc_rows(spark)
    docs = load_table(spark, SF, "documents")
    want = _grid(batch_cells(docs))
    assert len(want) > 50 and sum(want.values()) > 0

    snaps = _run_stream(spark, rows, tmp_path, [0, 1, 2, 3], "ord")
    assert len(snaps.versions()) == 4
    assert _grid(snaps.read()) == want

    # cell-wise sums commute: ANY arrival order gives the SAME state
    snaps_rev = _run_stream(spark, rows, tmp_path, [2, 0, 3, 1], "rev")
    assert _grid(snaps_rev.read()) == want

    # point estimates from the streamed state: never under the true
    # whole-history count, and an unseen term estimates 0
    true_counts = {
        r.w: r.cnt
        for r in docs.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    terms = sorted(true_counts)[:10] + ["never-seen-token"]
    est = {
        r.term: r.cm_est
        for r in cms_point_estimates(snaps.read(), terms).collect()
    }
    for t in terms[:-1]:
        assert est[t] >= true_counts[t], t
    assert est["never-seen-token"] == 0


def test_merge_is_associative_and_additive(spark):
    docs = load_table(spark, SF, "documents")
    a = batch_cells(docs.filter("doc_id % 3 = 0"))
    b = batch_cells(docs.filter("doc_id % 3 = 1"))
    c = batch_cells(docs.filter("doc_id % 3 = 2"))
    left = merge_cells(merge_cells(a, b), c)
    right = merge_cells(a, merge_cells(b, c))
    assert _grid(left) == _grid(right)
    # counts are ADDITIVE (not idempotent like KMV): a+a doubles
    da = _grid(merge_cells(a, a))
    ga = _grid(a)
    assert da == {k: 2 * v for k, v in ga.items()}
    # and the split-merge equals the direct grid of everything
    assert _grid(left) == _grid(batch_cells(docs))


def test_replay_skip_and_checkpoint_guard(spark, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "cm")
    docs = load_table(spark, SF, "documents").limit(50)
    assert cms_batch(snaps, docs, 0, "ck")
    state = _grid(snaps.read())
    assert not cms_batch(snaps, docs, 0, "ck")  # replayed: skipped
    assert _grid(snaps.read()) == state
    with pytest.raises(ValueError, match="checkpoint"):
        cms_batch(snaps, docs, 0, "other-ck")
