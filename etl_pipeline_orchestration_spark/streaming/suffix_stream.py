"""Streaming suffix-index maintenance — the twenty-third
streaming-maintenance member: the suffix-rank products (16-gram
boilerplate report, dedup-pressure span profile, per-document
memorization profile — plans/corpus_ops) kept current as document
files land.

The maintainable statistic is the DOCUMENT SET itself: suffix ranks
are global (one new document can perturb every rank — dense ranks
renumber), so like the forest (member #21) and the walks, the index is
NOT mergeable and the state one level down is the sufficient
statistic. Documents are immutable, so distinct-by-id union is exact,
commutative, and replay-idempotent; the publisher re-runs the
prefix-doubling loop over the merged set and derives ALL THREE
products from the captured levels of that ONE run — the same
one-state-many-products discipline as the basket statistic (forest,
single-linkage, spectral, walks) applied to the corpus statistic.

Cores are IMPORTED from plans/corpus_ops (ngram_report_from_levels,
span_powers_from_levels, memorization_from_levels — the ADVICE-r12
shared-surface rule), so the published streaming surface cannot drift
from the registered batch queries; the twin test pins equality under
two arrival orders.

Scale shape per micro-batch: one distinct-by-id merge (doc-count
grain). Per read: one doubling run (log-depth, position-sized state —
see suffix_array_ranks_docs) + three level-bounded aggregates. A
production deployment amortizes reads with publish_suffix_ranks (the
durable stacked-levels SnapshotTable) exactly as the batch side does
with the session memo.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from etl_pipeline_orchestration_spark.loader import (
    SnapshotTable,
    WarehouseLoader,
)
from etl_pipeline_orchestration_spark.plans.corpus_ops import (
    _SA_ROUNDS,
    memorization_from_levels,
    ngram_report_from_levels,
    span_powers_from_levels,
    suffix_rank_frame,
)
from etl_pipeline_orchestration_spark.streaming.substring_stream import (
    read_documents_stream,
)

__all__ = [
    "read_documents_stream",
    "merge_docs",
    "docs_batch",
    "stream_docs_to_warehouse",
    "published_suffix_products",
    "published_repeated_ngrams",
    "published_span_powers",
    "published_doc_memorization",
]


def merge_docs(a: DataFrame, b: DataFrame) -> DataFrame:
    """Distinct-by-id union — documents are immutable, so keeping any
    one copy per doc_id is exact, commutative, and idempotent."""
    return a.unionByName(b).dropDuplicates(["doc_id"])


def docs_batch(
    snaps: SnapshotTable, batch: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Fold one micro-batch's documents into the snapshot; False on
    checkpoint replay (idempotent anyway — the skip keeps replay cost
    zero, the retention_stream discipline)."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    part = batch.select("doc_id", "text").dropDuplicates(["doc_id"])
    cur = snaps.current_version()
    merged = part if cur is None else merge_docs(snaps.read(cur), part)
    snaps.write(merged.localCheckpoint(), marker=(app_id, batch_id))
    return True


def stream_docs_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the document stream's backlog through the set merge
    (availableNow)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_docs,
        lambda batch, bid: docs_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def _levels_of(snaps: SnapshotTable):
    docs = snaps.read().localCheckpoint()
    captured: dict = {}
    suffix_rank_frame(docs, _SA_ROUNDS, capture=captured)
    return docs, captured


def published_suffix_products(
    spark, snaps: SnapshotTable
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(ngram report, span-power profile, memorization profile) — all
    three re-derived from the maintained document set off ONE doubling
    run's captured levels, identical arithmetic to the batch queries."""
    docs, levels = _levels_of(snaps)
    return (
        ngram_report_from_levels(docs, levels),
        span_powers_from_levels(docs, levels),
        memorization_from_levels(docs, levels),
    )


def published_repeated_ngrams(spark, snaps: SnapshotTable) -> DataFrame:
    docs, levels = _levels_of(snaps)
    return ngram_report_from_levels(docs, levels)


def published_span_powers(spark, snaps: SnapshotTable) -> DataFrame:
    docs, levels = _levels_of(snaps)
    return span_powers_from_levels(docs, levels)


def published_doc_memorization(spark, snaps: SnapshotTable) -> DataFrame:
    docs, levels = _levels_of(snaps)
    return memorization_from_levels(docs, levels)
