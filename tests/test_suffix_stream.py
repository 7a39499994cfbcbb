"""Streaming suffix-index maintenance (streaming/suffix_stream.py):
all three suffix products published from the maintained document set
must equal their one-shot batch queries bit-for-bit under BOTH arrival
orders — suffix ranks are global (not mergeable), so the document SET
is the statistic and the publisher re-derives at read, the member-#21
discipline applied to the corpus."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import WarehouseLoader
from etl_pipeline_orchestration_spark.plans import registry
from etl_pipeline_orchestration_spark.streaming.suffix_stream import (
    docs_batch,
    published_suffix_products,
    read_documents_stream,
    stream_docs_to_warehouse,
)

registry.load_all()

SF = "/root/testdata/sf0.001"


def _chunked_docs_dir(tmp_path_factory, order) -> str:
    d = str(tmp_path_factory.mktemp(f"sfx_{''.join(map(str, order))}"))
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    idx = sorted(range(t.num_rows), key=lambda i: t["doc_id"][i].as_py())
    per = (len(idx) + 2) // 3
    chunks = [idx[i * per : (i + 1) * per] for i in range(3)]
    for arrival, ci in enumerate(order):
        path = os.path.join(d, f"part-{ci}.parquet")
        pq.write_table(t.take(pa.array(chunks[ci], pa.int64())), path)
        mt = 1_700_000_000 + arrival * 100
        os.utime(path, (mt, mt))
    return d


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("order", [(0, 1, 2), (2, 0, 1)])
def test_published_suffix_products_equal_batch(
    spark, tmp_path_factory, tmp_path, order
):
    docs_dir = _chunked_docs_dir(tmp_path_factory, order)
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_documents_stream(spark, docs_dir, max_files_per_trigger=1)
    snaps = stream_docs_to_warehouse(
        stream, loader, "suffix_docs", str(tmp_path / "ckpt")
    )
    got_ng, got_sp, got_mem = published_suffix_products(spark, snaps)
    assert _rows(got_ng) == _rows(
        registry.QUERIES["repeated_ngram_spans_report"](spark, SF)
    )
    assert _rows(got_sp) == _rows(
        registry.QUERIES["repeated_span_powers_report"](spark, SF)
    )
    want_mem = _rows(registry.QUERIES["doc_memorization_profile"](spark, SF))
    assert _rows(got_mem) == want_mem
    assert len(want_mem) > 100  # non-vacuous


def test_docs_batch_replay_skips(spark, tmp_path):
    """Checkpoint replay of an already-applied batch is a no-op (and
    the merge itself is idempotent regardless)."""
    from etl_pipeline_orchestration_spark.loader import SnapshotTable

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "suffix_docs_replay")
    batch = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, text string"
    )
    assert docs_batch(snaps, batch, 0, "app") is True
    v1 = snaps.current_version()
    assert docs_batch(snaps, batch, 0, "app") is False  # replay skip
    assert snaps.current_version() == v1
    # idempotence even as a NEW batch id: distinct-by-id union
    assert docs_batch(snaps, batch, 1, "app") is True
    assert _rows(snaps.read()) == [(1, "a b c"), (2, "d e f")]
