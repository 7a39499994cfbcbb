"""Streaming length-histogram maintenance (streaming/hist_stream.py):
lossless additive state — streamed histogram equals batch bit-for-bit
in any arrival order, and quantiles read from state equal a sorted
python replay of the whole history EXACTLY."""

from __future__ import annotations

import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import (
    SnapshotTable,
    WarehouseLoader,
)
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.hist_stream import (
    batch_hist,
    hist_batch,
    hist_quantiles,
    merge_hists,
    stream_hist_to_warehouse,
)

SF = "/root/testdata/sf0.001"

DOCS_SCHEMA = "doc_id long, n_chars long, source string"


def _rows(spark):
    return (
        load_table(spark, SF, "documents")
        .select("doc_id", "n_chars", "source")
        .orderBy("doc_id")
        .collect()
    )


def _hist(df):
    return {(r.source, r.v): r.n for r in df.collect()}


def _write_chunks(rows, d, order):
    per = (len(rows) + len(order) - 1) // len(order)
    chunks = [rows[i * per : (i + 1) * per] for i in range(len(order))]
    for arrival, idx in enumerate(order):
        chunk = chunks[idx]
        table = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in chunk], pa.int64()),
                "n_chars": pa.array([r["n_chars"] for r in chunk], pa.int64()),
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
    return stream_hist_to_warehouse(
        stream, loader, "len_hist", str(tmp_path / f"ckpt_{tag}")
    )


def test_streamed_hist_equals_batch_and_exact_quantiles(spark, tmp_path):
    rows = _rows(spark)
    docs = load_table(spark, SF, "documents")
    want = _hist(batch_hist(docs))
    assert len(want) > 100

    snaps = _run_stream(spark, rows, tmp_path, [0, 1, 2, 3], "ord")
    assert _hist(snaps.read()) == want
    snaps_rev = _run_stream(spark, rows, tmp_path, [3, 1, 0, 2], "rev")
    assert _hist(snaps_rev.read()) == want

    # EXACT order statistics from state == sorted replay of history
    got = {
        (r.source, r.q_permille): r.value
        for r in hist_quantiles(snaps.read(), [0.1, 0.5, 0.9, 1.0]).collect()
    }
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.n_chars)
    for src, vals in by_src.items():
        vals.sort()
        n = len(vals)
        for q in (0.1, 0.5, 0.9, 1.0):
            target = (int(q * 1000) * n + 999) // 1000
            assert got[(src, int(q * 1000))] == vals[target - 1], (src, q)


def test_hist_merge_laws_and_replay_guard(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    a = batch_hist(docs.filter("doc_id % 2 = 0"))
    b = batch_hist(docs.filter("doc_id % 2 = 1"))
    assert _hist(merge_hists(a, b)) == _hist(batch_hist(docs))
    da = _hist(merge_hists(a, a))
    assert da == {k: 2 * v for k, v in _hist(a).items()}

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "lh")
    small = docs.limit(40)
    assert hist_batch(snaps, small, 0, "ck")
    state = _hist(snaps.read())
    assert not hist_batch(snaps, small, 0, "ck")
    assert _hist(snaps.read()) == state
    with pytest.raises(ValueError, match="checkpoint"):
        hist_batch(snaps, small, 0, "other")
