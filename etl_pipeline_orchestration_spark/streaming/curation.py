"""Streaming corpus curation: the quality-gate funnel over a document
stream.

A crawl lands continuously; the curation team wants the funnel report
(plans/corpus_ops.py:quality_gate_funnel) to update as files arrive
rather than waiting for a nightly batch. The rule flags and counter
reduction are THE SAME code as the batch query — this module only
binds them to a file-source stream and a complete-mode sink, so the
two runtimes cannot drift (pinned by the stream==batch twin test).

Scale shape: the streaming aggregate keeps 5 counters of state total
(not per-key), so state store size is constant regardless of corpus
rate; each micro-batch does one scan of its new files plus a 1-row
state merge. The funnel unpivot is a projection on the 1-row aggregate
and adds nothing per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_pipeline_orchestration_spark.plans.corpus_ops import (
    funnel_counters,
    funnel_report,
    gate_flags,
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source document stream (schema declared — streaming reads
    must not infer). ``maxFilesPerTrigger`` bounds per-batch work; in
    production it's the knob that keeps micro-batches inside the
    trigger interval when the crawler bursts."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def streaming_quality_funnel(stream: DataFrame) -> DataFrame:
    """The funnel over a stream: same flags, same counters, complete
    output mode (the aggregate is global, so every trigger emits the
    full refreshed 4-row report)."""
    return funnel_report(funnel_counters(gate_flags(stream)))


def run_funnel_to_memory(funnel: DataFrame, table: str) -> None:
    """Drain all available input into an in-memory sink (test/dev
    helper; production would use a real sink with the same
    complete-mode writer)."""
    q = (
        funnel.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
