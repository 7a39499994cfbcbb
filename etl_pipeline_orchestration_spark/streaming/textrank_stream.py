"""Streaming keyword-graph maintenance: TextRank ratings kept current
as document files land — the eleventh streaming-maintenance member.

The batch side (plans/llm_data.py:textrank_keywords) derives the
keyword table from one relation: the symmetric adjacent-token
co-occurrence counts ``(s, d, w)``. Documents are atomic rows, so the
pair counts are ADDITIVE across any chopping of the corpus into
micro-batches — maintenance merges per-batch edge partials by summing
``w`` per (s, d), and the publisher re-derives the vocabulary-sized
PageRank fit from the STORED aggregate with the batch query's own
``textrank_ratings`` code. Twin equality certifies the merge; the
batch oracle certifies the derivation (the drift_stream discipline,
third instance after the day aggregate and the order-grain duel
state).

Storage is a ``SnapshotTable`` at vocabulary² grain (bounded by the
token vocabulary, not the corpus): atomic pointer flip, replay skip
via the (checkpoint, batch_id) watermark.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.llm_data import (
    textrank_cooc_edges,
    textrank_ratings,
)
from etl_pipeline_orchestration_spark.streaming.curation import (
    read_documents_stream,
)

__all__ = [
    "read_documents_stream",
    "merge_cooc_batch",
    "stream_textrank_to_warehouse",
    "published_textrank",
]


def merge_cooc_batch(
    snaps: SnapshotTable, batch_docs: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Sum one micro-batch's co-occurrence partials into the stored
    edge relation; returns False on checkpoint replay."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    partial = textrank_cooc_edges(batch_docs)
    if snaps.current_version() is not None:
        partial = snaps.read().unionByName(partial)
    merged = partial.groupBy("s", "d").agg(
        F.sum("w").cast("bigint").alias("w")
    )
    snaps.write(merged, marker=(app_id, batch_id))
    return True


def stream_textrank_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the document stream's backlog, folding each micro-batch
    into the stored co-occurrence relation (availableNow)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_docs,
        lambda batch, bid: merge_cooc_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def published_textrank(spark, snaps: SnapshotTable) -> DataFrame:
    """TextRank keyword table from the maintained co-occurrence
    relation — identical derivation to the batch query's."""
    return textrank_ratings(spark, snaps.read())
