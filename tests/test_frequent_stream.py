"""Streaming heavy-hitters maintenance: the published exact top-k must
equal a from-scratch batch run over the same archive (floor-filter
convergence), the stored summary must honor the mergeable-summaries
guarantee across micro-batch boundaries, and the additive merge must
be replay-safe."""

from __future__ import annotations

from collections import Counter

import pytest

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.operators import frequent
from etl_pipeline_orchestration_spark.streaming.curation import (
    read_documents_stream,
)
from etl_pipeline_orchestration_spark.streaming.frequent_stream import (
    candidates_of,
    error_bound,
    merge_mg_batch,
    published_topk,
    stream_heavy_hitters_to_warehouse,
)
from tests.test_scale_primitives import _zipf_docs

CAPACITY = 48


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    docs, truth = _zipf_docs()
    d = str(tmp_path_factory.mktemp("hh_docs"))
    df = spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.repartition(4).write.mode("overwrite").parquet(d)
    return d, truth


def _drain(spark, corpus_dir, tmp_path, capacity=CAPACITY):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    stream = read_documents_stream(spark, corpus_dir, max_files_per_trigger=1)
    return stream_heavy_hitters_to_warehouse(
        stream, loader, "hh_summary", str(tmp_path / "ckpt"), capacity
    )


def test_published_topk_equals_batch_recompute(spark, corpus, tmp_path):
    corpus_dir, truth = corpus
    snaps = _drain(spark, corpus_dir, tmp_path)
    assert len(snaps.versions()) == 4  # one merge per input file
    archive = spark.read.parquet(corpus_dir)
    streamed = [
        (r["rank"], r["token"], r["cnt"])
        for r in published_topk(archive, snaps, CAPACITY, k=12).collect()
    ]
    batch = [
        (r["rank"], r["token"], r["cnt"])
        for r in frequent.exact_heavy_hitters(archive, CAPACITY, k=12).collect()
    ]
    assert streamed == batch
    # ...and both equal ground truth's provable prefix.
    n = sum(truth.values())
    want = [
        (i + 1, t, c)
        for i, (t, c) in enumerate(
            sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))
        )
        if c * (CAPACITY + 1) > n
    ]
    assert streamed == want[:12]


def test_stored_summary_guarantees_hold_across_batches(spark, corpus, tmp_path):
    corpus_dir, truth = corpus
    snaps = _drain(spark, corpus_dir, tmp_path)
    n = sum(truth.values())
    floor = n // (CAPACITY + 1)
    cands = {r["token"] for r in candidates_of(snaps).collect()}
    assert len(cands) <= CAPACITY
    assert len(cands) < len(truth), "pruning never happened — weak test"
    guaranteed = {t for t, c in truth.items() if c > floor}
    assert guaranteed <= cands
    # Stored counts only undercount, and by at most the error bound.
    bound = error_bound(snaps, CAPACITY)
    assert bound == floor
    stored = {
        r["token"]: r["cnt"]
        for r in snaps.read().filter("kind = 'tok'").collect()
    }
    for t, c in stored.items():
        assert c <= truth[t]
        assert c >= truth[t] - bound


def test_replayed_batch_id_is_skipped(spark, corpus, tmp_path):
    corpus_dir, _ = corpus
    loader = WarehouseLoader(spark, str(tmp_path / "wh2"))
    snaps = SnapshotTable(loader, "hh")
    docs = spark.read.parquet(corpus_dir).limit(10)
    assert merge_mg_batch(snaps, docs, 0, "ckptA", CAPACITY) is True
    once = sorted(
        (r["kind"], r["token"], r["cnt"]) for r in snaps.read().collect()
    )
    assert merge_mg_batch(snaps, docs, 0, "ckptA", CAPACITY) is False
    again = sorted(
        (r["kind"], r["token"], r["cnt"]) for r in snaps.read().collect()
    )
    assert once == again
    # A new batch id over the same docs doubles every counter and N —
    # additive merge, no prune at this size.
    assert merge_mg_batch(snaps, docs, 1, "ckptA", CAPACITY) is True
    doubled = {
        (r["kind"], r["token"]): r["cnt"] for r in snaps.read().collect()
    }
    for kind, token, cnt in once:
        assert doubled[(kind, token)] == 2 * cnt
