"""Streaming quality-classifier maintenance — the twenty-second
streaming-maintenance member: the trained document-quality classifier
(operators/classifier.py) kept current as document files land, without
ever re-scanning the corpus.

The trainable state is the (y, f1..f5) feature-PROFILE histogram
(``classifier_cells``): the logistic score z = Σ beta_j f_j depends on
a row only through its integer feature vector, so the micro-grid
sigmoid, the residual, and therefore every per-iteration gradient term
are CONSTANT within a profile cell — Σ_rows f_j·resid equals
Σ_cells n·f_j·resid exactly (int64 sums, associative). The histogram
is thus a lossless additive sufficient statistic for the WHOLE
6-iteration trajectory, the same claim gbt_stream makes with its
(count, target-sum) cells: maintenance is exact and
arrival-order-free — streamed cells == batch cells bit-for-bit, and
the confusion published from them equals a from-scratch
``train_logistic_int`` + ``confusion_summary`` run on the drained
history (twin-tested both arrival orders in
tests/test_classifier_stream.py).

State is bounded by DISTINCT feature profiles, not rows: profiles are
coarse integer ratios (percent grids, capped length buckets), so
growth saturates as the corpus covers the profile space — compressive
in the same way dtree_stream's contingency table is, though bounded by
occupancy rather than a closed-form domain product.

Cell-wise sum is NOT replay-idempotent, so the (checkpoint, batch_id)
applied-upto watermark is load-bearing: a replayed micro-batch must be
skipped or counts double. The twin test replays a batch id and pins
the state unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.operators.classifier import (
    FEATURE_COLS,
    TRAIN_ITERS,
    _p_micro,
    _trunc_div,
    _z_expr,
    classifier_features,
)
from etl_pipeline_orchestration_spark.streaming.curation import (
    read_documents_stream,
)

__all__ = [
    "read_documents_stream",
    "classifier_cells",
    "merge_classifier_cells",
    "classifier_cells_batch",
    "stream_classifier_cells_to_warehouse",
    "train_from_cells",
    "published_classifier_confusion",
]

# f0 is the constant bias (always 1) — it stays out of the cell key and
# is re-attached as a literal at derive time.
_KEY = ("y", "f1", "f2", "f3", "f4", "f5")


def classifier_cells(docs: DataFrame) -> DataFrame:
    """[y, f1..f5, n] — the feature-profile histogram of a document
    relation, via the SAME feature extraction the batch trainer uses."""
    return (
        classifier_features(docs)
        .groupBy(*_KEY)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def merge_classifier_cells(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise sum of n — exact, commutative, associative."""
    return (
        a.unionByName(b)
        .groupBy(*_KEY)
        .agg(F.sum("n").cast("bigint").alias("n"))
    )


def classifier_cells_batch(
    snaps: SnapshotTable, batch_docs: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Fold one micro-batch's cells into the snapshot. Returns False on
    checkpoint replay — sum-merge is not idempotent, so the skip is
    correctness, not an optimization."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    part = classifier_cells(batch_docs)
    cur = snaps.current_version()
    merged = (
        part if cur is None else merge_classifier_cells(snaps.read(cur), part)
    )
    snaps.write(merged.localCheckpoint(), marker=(app_id, batch_id))
    return True


def stream_classifier_cells_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the document stream's backlog through the cell merge
    (availableNow); the (checkpoint, cells) pair is the exactly-once
    unit."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_docs,
        lambda batch, bid: classifier_cells_batch(snaps, batch, bid, app_id),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def _with_bias(cells: DataFrame) -> DataFrame:
    return cells.withColumn("f0", F.lit(1).cast("bigint"))


def train_from_cells(
    cells: DataFrame, iters: int = TRAIN_ITERS
) -> tuple[list[int], list[int]]:
    """Re-derive (betas, M2) from the maintained histogram with the
    batch trainer's exact integer arithmetic, every aggregate weighted
    by the cell count: M2_j = Σ n·f_j², g_j = Σ n·f_j·resid. Runs at
    cell cardinality — iterations never touch the corpus."""
    cdf = _with_bias(cells).localCheckpoint()
    m2_row = cdf.agg(
        *[
            F.greatest(
                F.sum(F.col("n") * F.col(c) * F.col(c)), F.lit(1)
            ).alias(c)
            for c in FEATURE_COLS
        ]
    ).collect()[0]
    m2 = [int(m2_row[c]) for c in FEATURE_COLS]
    betas = [0] * len(FEATURE_COLS)
    for _ in range(iters):
        p = _p_micro(_z_expr(betas))
        resid = F.col("y").cast("bigint") * F.lit(1_000_000) - p
        g_row = cdf.agg(
            *[
                F.sum(F.col("n") * F.col(c) * resid).alias(c)
                for c in FEATURE_COLS
            ]
        ).collect()[0]
        betas = [
            b + _trunc_div(int(g_row[c]), m)
            for b, m, c in zip(betas, m2, FEATURE_COLS)
        ]
    return betas, m2


def published_classifier_confusion(spark, snaps: SnapshotTable) -> DataFrame:
    """The confusion matrix of the model trained from the maintained
    cells — z is cell-constant, so the per-(y, pred) counts and exact
    int64 score sums aggregate from (n, n·z) and equal the batch
    ``confusion_summary`` bit-for-bit."""
    cells = _with_bias(snaps.read())
    betas, _ = train_from_cells(snaps.read())
    z = _z_expr(betas)
    return (
        cells.select("y", F.col("n"), z.alias("z"))
        .groupBy("y", (F.col("z") >= 0).cast("int").alias("pred"))
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.sum(F.col("n") * F.col("z")).cast("bigint").alias(
                "sum_score_micro"
            ),
        )
    )
