"""Streaming PCA maintenance: the dominant principal direction kept
current as embedding files land — the fourteenth streaming-maintenance
member.

The batch side (plans/llm_data.py:embedding_pca_power_exact) derives
everything from one relation: the exact integer Gram matrix plus the
vector count (``pca_gram_state`` — the count rides as the reserved
(0, 0, n) row). Both are ADDITIVE across micro-batches (X^T X of a
union is the sum of the parts' X^T X; counts sum), so maintenance
merges 4097-row partials by summing ``g`` per (i, j), and the
publisher re-derives the quantized power iteration from the STORED
aggregate with the batch query's own ``pca_ratings`` code. Twin
equality certifies the merge; the batch oracle certifies the
derivation (the textrank_stream discipline on a model-sized matrix
statistic — the smallest state of any maintenance member: always
exactly 4097 rows regardless of corpus size).

Storage is a ``SnapshotTable``: atomic pointer flip, replay skip via
the (checkpoint, batch_id) watermark (an additive merge is not
replay-idempotent)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.llm_data import (
    pca_gram_state,
    pca_ratings,
)
from etl_pipeline_orchestration_spark.streaming.ann_stream import (
    read_embeddings_stream,
)

__all__ = [
    "read_embeddings_stream",
    "merge_gram_batch",
    "stream_pca_to_warehouse",
    "published_pca",
]


def merge_gram_batch(
    snaps: SnapshotTable, batch_vecs: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Sum one micro-batch's Gram/count partials into the stored
    state; returns False on checkpoint replay."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    partial = pca_gram_state(batch_vecs)
    if snaps.current_version() is not None:
        partial = snaps.read().unionByName(partial)
    merged = partial.groupBy("i", "j").agg(
        F.sum("g").cast("decimal(38,0)").alias("g")
    )
    snaps.write(merged, marker=(app_id, batch_id))
    return True


def stream_pca_to_warehouse(
    stream_vecs: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the embedding stream's backlog, folding each micro-batch
    into the stored Gram state (availableNow)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_vecs,
        lambda batch, bid: merge_gram_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def published_pca(spark, snaps: SnapshotTable) -> DataFrame:
    """Dominant-direction table from the maintained Gram state —
    identical derivation to the batch query's."""
    return pca_ratings(spark, snaps.read())
