"""Streaming KMV sketch maintenance (streaming/kmv_stream.py): the
state itself is order-independent (KMV closure), stream == batch
exactly, replay-skipped, checkpoint-guarded."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import (
    SnapshotTable,
    WarehouseLoader,
)
from etl_pipeline_orchestration_spark.sources.tables import load_table
from etl_pipeline_orchestration_spark.streaming.kmv_stream import (
    batch_sketch,
    kmv_batch,
    kmv_estimates,
    merge_sketches,
    stream_kmv_to_warehouse,
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


def _sketch_set(df):
    return {(r.source, r.h) for r in df.collect()}


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
    return stream_kmv_to_warehouse(
        stream, loader, "kmv_sketch", str(tmp_path / f"ckpt_{tag}")
    )


def test_streamed_sketch_equals_batch_in_any_order(spark, tmp_path):
    rows = _doc_rows(spark)
    docs = load_table(spark, SF, "documents")
    want = _sketch_set(batch_sketch(docs))
    assert len(want) > 1000  # 20 sources approaching k each

    snaps = _run_stream(spark, rows, tmp_path, [0, 1, 2, 3], "ord")
    assert len(snaps.versions()) == 4
    assert _sketch_set(snaps.read()) == want

    # KMV closure: ANY arrival order converges to the identical state
    snaps_rev = _run_stream(spark, rows, tmp_path, [2, 0, 3, 1], "rev")
    assert _sketch_set(snaps_rev.read()) == want

    # and the estimates derived from the streamed state match the
    # batch query's estimates exactly
    from etl_pipeline_orchestration_spark.plans import registry

    registry.load_all()
    batch_est = {
        (r.source, r.sketch_size, r.kth_min, r.est_distinct)
        for r in registry.QUERIES["kmv_distinct_by_source"](spark, SF)
        .select("source", "sketch_size", "kth_min", "est_distinct")
        .collect()
    }
    stream_est = {
        (r.source, r.sketch_size, r.kth_min, r.est_distinct)
        for r in kmv_estimates(snaps.read()).collect()
    }
    assert stream_est == batch_est


def test_merge_is_associative_and_idempotent(spark):
    docs = load_table(spark, SF, "documents")
    a = batch_sketch(docs.filter("doc_id % 3 = 0"))
    b = batch_sketch(docs.filter("doc_id % 3 = 1"))
    c = batch_sketch(docs.filter("doc_id % 3 = 2"))
    left = merge_sketches(merge_sketches(a, b), c)
    right = merge_sketches(a, merge_sketches(b, c))
    assert _sketch_set(left) == _sketch_set(right)
    # idempotent: merging a sketch with itself is the sketch
    assert _sketch_set(merge_sketches(a, a)) == _sketch_set(a)
    # and equals the direct sketch of the union
    assert _sketch_set(left) == _sketch_set(batch_sketch(docs))


def test_replay_skip_and_checkpoint_guard(spark, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "sk")
    docs = load_table(spark, SF, "documents").limit(50)
    assert kmv_batch(snaps, docs, 0, "ck")
    state = _sketch_set(snaps.read())
    assert not kmv_batch(snaps, docs, 0, "ck")  # replayed: skipped
    assert _sketch_set(snaps.read()) == state
    with pytest.raises(ValueError, match="checkpoint"):
        kmv_batch(snaps, docs, 0, "other-ck")
