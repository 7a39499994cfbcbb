"""Streaming substring-dedup maintenance (streaming/substring_stream):
stream==batch keep-first twin under id-ordered arrival, replay and
exactly-once guards, earlier-arrival-wins for out-of-order repeats,
index compaction, and the parameter-mismatch refusal."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.corpus_ops import (
    _planted_substring_corpus,
    substring_spans_keep_first,
)
from etl_pipeline_orchestration_spark.streaming.substring_stream import (
    compact_fps,
    read_documents_stream,
    read_fp_index,
    read_spans,
    stream_substring_to_warehouse,
    substring_batch,
)

SF = "/root/testdata/sf0.001"


def _span_set(df):
    return {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_tokens"])
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def ordered_docs_dir(spark, tmp_path_factory):
    """The planted substring corpus (documents + head-copies at
    doc_id+1e9) as 4 id-ordered parquet files with ascending mtimes, so
    the file stream's arrival order is id order — the regime where the
    streamed spans must equal the batch keep-first relation."""
    d = str(tmp_path_factory.mktemp("sub_docs"))
    rows = (
        _planted_substring_corpus(spark, SF)
        .orderBy("doc_id")
        .collect()
    )
    per = (len(rows) + 3) // 4
    for i in range(4):
        chunk = rows[i * per : (i + 1) * per]
        table = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in chunk], pa.int64()),
                "text": pa.array([r["text"] for r in chunk], pa.string()),
            }
        )
        path = os.path.join(d, f"part-{i}.parquet")
        pq.write_table(table, path)
        t = 1_700_000_000 + i * 100
        os.utime(path, (t, t))
    return d


def test_streamed_spans_equal_batch_keep_first(
    spark, ordered_docs_dir, tmp_path
):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")
    stream = read_documents_stream(
        spark, ordered_docs_dir, max_files_per_trigger=1
    )
    snaps = stream_substring_to_warehouse(
        stream, loader, "sub_params", "sub_fps", "sub_spans", ckpt
    )
    assert len(snaps.versions()) == 4  # one publish per micro-batch
    got = _span_set(
        read_spans(loader, "sub_spans", snaps, os.path.abspath(ckpt))
    )
    want = _span_set(
        substring_spans_keep_first(
            spark.read.parquet(ordered_docs_dir), window=8, min_tokens=16
        )
    )
    assert got == want
    # non-vacuous: nearly every planted copy (doc_id >= 1e9) reports
    # its span (a copy of a source shorter than min_tokens legitimately
    # doesn't clear the 16-token floor)
    copies_with_spans = {d for (d, *_rest) in got if d >= 1_000_000_000}
    assert len(copies_with_spans) >= 25


def _docs(spark, specs):
    """[(doc_id, text)] -> DataFrame."""
    return spark.createDataFrame(specs, "doc_id bigint, text string")


_PASSAGE = " ".join(f"p{i}" for i in range(20))


def test_replayed_batch_is_skipped_and_empty_leaves_watermark(
    spark, tmp_path
):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "prm")
    b0 = _docs(
        spark,
        [
            (1, _PASSAGE + " " + " ".join(f"a{i}" for i in range(8))),
            (2, " ".join(f"b{i}" for i in range(9)) + " " + _PASSAGE),
        ],
    )
    assert substring_batch(loader, snaps, "fps", "sp", b0, 0, "ck") is True
    once = _span_set(read_spans(loader, "sp", snaps, "ck"))
    # keep-first WITHIN the batch: doc 2 (later) reports, doc 1 doesn't
    assert {d for (d, *_r) in once} == {2}
    n_fps = read_fp_index(loader, "fps", snaps, "ck").count()
    assert n_fps > 0
    # replay: no-op; empty batch: watermark untouched
    assert substring_batch(loader, snaps, "fps", "sp", b0, 0, "ck") is False
    assert _span_set(read_spans(loader, "sp", snaps, "ck")) == once
    assert substring_batch(
        loader, snaps, "fps", "sp", b0.limit(0), 1, "ck"
    ) is False
    # parameter mismatch refuses loudly
    with pytest.raises(ValueError, match="parameter"):
        substring_batch(
            loader, snaps, "fps", "sp", b0, 2, "ck", window=4
        )


def test_out_of_order_arrival_keeps_early(spark, tmp_path):
    """A repeated passage arriving copy-first: the archived early copy
    is never retroactively marked; the late lower-id original reports
    the span (earlier arrival wins — matching the family's policy, and
    the decision a batch rerun would invert)."""
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "prm")
    filler = " ".join(f"x{i}" for i in range(9))
    b0 = _docs(spark, [(1000, filler + " " + _PASSAGE)])
    b1 = _docs(
        spark,
        [
            (5, _PASSAGE + " " + " ".join(f"y{i}" for i in range(8))),
            (6, " ".join(f"z{i}" for i in range(30))),
        ],
    )
    assert substring_batch(loader, snaps, "fps", "sp", b0, 0, "ck") is True
    assert substring_batch(loader, snaps, "fps", "sp", b1, 1, "ck") is True
    spans = _span_set(read_spans(loader, "sp", snaps, "ck"))
    by_doc = {d for (d, *_r) in spans}
    assert 1000 not in by_doc  # archived copy never re-decided
    assert 5 in by_doc  # late original marks against the archive
    assert 6 not in by_doc  # unique content reports nothing
    # the marked span covers exactly the 20-token passage (pos 1..20)
    s5 = [s for s in spans if s[0] == 5]
    assert s5 == [(5, 1, 20, 20)]


def test_fp_index_compaction_preserves_decisions(spark, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "prm")
    filler = " ".join(f"q{i}" for i in range(16))
    b0 = _docs(spark, [(1, _PASSAGE + " " + filler)])
    b1 = _docs(spark, [(2, " ".join(f"r{i}" for i in range(25)))])
    substring_batch(loader, snaps, "fps", "sp", b0, 0, "ck")
    substring_batch(loader, snaps, "fps", "sp", b1, 1, "ck")
    before = {
        r["fp"] for r in read_fp_index(loader, "fps", snaps, "ck").collect()
    }
    assert compact_fps(loader, "fps", snaps, "ck") == 2
    parts = [
        p
        for p in os.listdir(loader._path("fps"))
        if p.startswith("batch_id=")
    ]
    assert parts == ["batch_id=1"]
    after = {
        r["fp"] for r in read_fp_index(loader, "fps", snaps, "ck").collect()
    }
    assert after == before
    # a post-compaction batch still marks against the folded index
    b2 = _docs(spark, [(3, _PASSAGE + " tail0 tail1 tail2")])
    assert substring_batch(loader, snaps, "fps", "sp", b2, 2, "ck") is True
    spans = _span_set(read_spans(loader, "sp", snaps, "ck"))
    assert (3, 1, 20, 20) in spans
