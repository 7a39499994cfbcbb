"""Streaming substring-dedup maintenance over a landing document stream.

Fifth member of the streaming-maintenance family (corpus stats, LSH
dedup, ANN, SemDeDup, now substring dedup): as document batches land,
each new document gets its repeated-passage SPANS decided against the
corpus accumulated so far, without ever re-deciding or rewriting the
archive.

Semantics are KEEP-FIRST (plans/corpus_ops.substring_spans_keep_first):
a position marks when its shingle fingerprint was already seen — in
the ARCHIVED fingerprint index, or at a lower doc_id within the same
batch. Archived documents are never retroactively marked when a later
document repeats their content (earlier arrival wins — the same
keep-early-evidence trade-off every stream in this family documents),
which is exactly the curation policy: cut the LATER copies, keep one.
Whenever arrival order is id order, the streamed span relation equals
the batch keep-first relation pair-for-pair (the twin test pins it).

Storage discipline (dedup-stream pattern):

* ``fps/batch_id=N`` — the batch's DISTINCT shingle fingerprints, the
  incremental index. One row per distinct fingerprint: inherently
  corpus-token-scaled, as ANY substring-level method's state must be;
  ``compact_fps`` folds published partitions, and at 100 TB this store
  is a transactional table partitioned by fingerprint.
* ``spans/batch_id=N`` — the batch's span decisions (output log, never
  rewritten).
* a parameter SnapshotTable (window/min_tokens as DATA — versioned
  like any model) republished per batch carries the checkpoint-scoped
  watermark; the ordered spans→fps→snapshot publish makes replay
  idempotent: a crash before the flip replays bit-identically into the
  same partitions, a crash after skips the batch.

Scale shape per micro-batch: one narrow fingerprint pass over the
batch, one fp-keyed join of batch positions against the published
index (batch-side is the small side; at scale the index join is a
shuffled hash join on uniformly-hashed 62-bit keys, with partition
pruning on batch_id), one per-doc window for island grouping, two
O(batch) partition writes, one parameter-sized snapshot republish.
The archive is never rescanned for re-decisions; daily cost ∝ batch
tokens + one index probe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.corpus_ops import (
    position_fingerprints_of,
    spans_from_marked,
)

DOCS_SCHEMA = "doc_id bigint, text string"
FP_SCHEMA = "fp bigint"
SPAN_SCHEMA = "doc_id bigint, span_start bigint, span_end bigint, n_tokens bigint"


def read_documents_stream(
    spark, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source document stream (schema declared — streaming reads
    must not infer)."""
    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def params_to_df(spark, window: int, min_tokens: int) -> DataFrame:
    """The stream's detection parameters as snapshot DATA — versioning
    them like a model means a parameter change is an auditable publish,
    and the snapshot doubles as the watermark carrier."""
    return spark.createDataFrame(
        [(int(window), int(min_tokens))], "window int, min_tokens int"
    )


def _read_partitions(
    loader: WarehouseLoader, table: str, schema: str, upto: int
) -> DataFrame:
    from etl_pipeline_orchestration_spark.streaming.compaction import (
        read_published_partitions,
    )

    return read_published_partitions(
        loader.spark, loader._path(table), schema, upto
    )


def read_fp_index(
    loader: WarehouseLoader,
    fps_table: str,
    param_snaps: SnapshotTable,
    app_id: str,
) -> DataFrame:
    """Every published fingerprint (the incremental index)."""
    return _read_partitions(
        loader, fps_table, FP_SCHEMA, param_snaps.applied_upto(app_id)
    )


def read_spans(
    loader: WarehouseLoader,
    spans_table: str,
    param_snaps: SnapshotTable,
    app_id: str,
) -> DataFrame:
    """Every published span decision (exactly once across replays)."""
    return _read_partitions(
        loader, spans_table, SPAN_SCHEMA, param_snaps.applied_upto(app_id)
    )


def substring_batch(
    loader: WarehouseLoader,
    param_snaps: SnapshotTable,
    fps_table: str,
    spans_table: str,
    batch_docs: DataFrame,
    batch_id: int,
    app_id: str,
    window: int = 8,
    min_tokens: int = 16,
) -> bool:
    """Process one micro-batch: span decisions for its documents
    against the published fingerprint index (plus lower-id batch
    mates), then grow the index by the batch's distinct fingerprints.
    Returns False on checkpoint replay or an empty batch."""
    if batch_id <= param_snaps.applied_upto(app_id):
        return False
    if batch_docs.isEmpty():
        return False
    spark = batch_docs.sparkSession

    if param_snaps.current_version() is not None:
        p = param_snaps.read().first()
        if (p["window"], p["min_tokens"]) != (window, min_tokens):
            raise ValueError(
                "substring_stream: detection parameters "
                f"({window}, {min_tokens}) differ from the published "
                f"({p['window']}, {p['min_tokens']}) — a parameter "
                "change requires a new store (spans decided under "
                "different shingle windows cannot be unioned)"
            )

    # Checkpointed: three consumers (within-batch first-seen aggregate,
    # the two mark probes) would otherwise each recompute the per-char
    # fingerprint fold.
    pos_fp = position_fingerprints_of(
        batch_docs.select("doc_id", "text"), window
    ).localCheckpoint()
    index = read_fp_index(loader, fps_table, param_snaps, app_id)
    # Mark rule (keep-first): fp already archived, OR a lower doc_id in
    # THIS batch carries it. Union-distinct of the two probes — a
    # position can satisfy both.
    seen_archive = pos_fp.join(index, "fp", "leftsemi").select("doc_id", "pos")
    first_in_batch = pos_fp.groupBy("fp").agg(F.min("doc_id").alias("mn"))
    seen_batch = (
        pos_fp.join(first_in_batch, "fp")
        .filter(F.col("doc_id") > F.col("mn"))
        .select("doc_id", "pos")
    )
    marked = seen_archive.union(seen_batch).distinct()
    spans = spans_from_marked(marked, window, min_tokens)

    span_dir = os.path.join(loader._path(spans_table), f"batch_id={batch_id}")
    spans.write.mode("overwrite").parquet(span_dir)
    fp_dir = os.path.join(loader._path(fps_table), f"batch_id={batch_id}")
    pos_fp.select("fp").distinct().write.mode("overwrite").parquet(fp_dir)
    param_snaps.write(
        params_to_df(spark, window, min_tokens), marker=(app_id, batch_id)
    )
    return True


def compact_fps(
    loader: WarehouseLoader,
    fps_table: str,
    param_snaps: SnapshotTable,
    app_id: str,
    target_files: int = 1,
) -> int:
    """Fold all PUBLISHED fingerprint partitions into one consolidated
    ``batch_id=watermark`` partition — bounds the file count of a
    long-running stream (single-writer, call between micro-batches)."""
    from etl_pipeline_orchestration_spark.streaming.compaction import (
        compact_batch_partitions,
    )

    return compact_batch_partitions(
        loader.spark,
        loader._path(fps_table),
        param_snaps.applied_upto(app_id),
        FP_SCHEMA,
        target_files=target_files,
    )


def stream_substring_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    params_table: str,
    fps_table: str,
    spans_table: str,
    checkpoint_dir: str,
    window: int = 8,
    min_tokens: int = 16,
) -> SnapshotTable:
    """Drain the document stream's backlog through the incremental
    substring dedup (availableNow: finite, then stop). Returns the
    parameter snapshot table; spans live under
    ``spans_table/batch_id=*``."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, params_table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_docs,
        lambda batch, bid: substring_batch(
            loader,
            snaps,
            fps_table,
            spans_table,
            batch,
            bid,
            app_id,
            window=window,
            min_tokens=min_tokens,
        ),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps
