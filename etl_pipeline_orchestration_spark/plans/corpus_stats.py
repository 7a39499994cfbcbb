"""Shared corpus-statistics layer: ONE token-level pass serves every
token/bigram metric.

Round-3 review flagged that zipf_slope_by_lang, conditional_entropy_by_
lang, pmi_collocations, bpe_pair_frequencies, vocab_coverage_curve,
split_unigram_kl, and source_lang_skew each re-tokenized ``documents``
from parquet — ~7 full-corpus scans where 1 suffices. This module
defines the single materialization they all derive from:

``corpus_gram_stats``: the corpus reduced to a histogram keyed by
``(lang, source, split, w1, w2)`` where position i of each document
emits (w1=token_i, w2=token_{i+1} or NULL at the end). One corpus scan,
one map-side-combined shuffle; output is bounded by bigram-type count x
metadata cardinality (vocab²-ish), never by corpus size. Every derived
relation is a further aggregation in histogram space:

* unigram histogram (any key subset) — each token appears exactly once
  as ``w1``, so summing ``c`` over ``w2`` recovers exact word counts;
* bigram histogram — rows with ``w2 IS NOT NULL``;
* document counts — each document contributes exactly one ``pos == 1``
  row (``split`` on any string yields >= 1 element), accumulated in
  ``n_first``.

At 100 TB the win is structural: the curation *report* that previously
cost ~7 corpus scans costs ONE — ``corpus_report`` persists the
first-level aggregate and every metric derives from the cache
(byte-level scan accounting verified in tests/test_plan_shapes.py).
The explicit persist is load-bearing: ReusedExchange does NOT fire
here, because Catalyst specializes each consumer's subplan below the
exchange (per-branch filter pushdown and column pruning breaks
canonical plan equality) — measured, not assumed. Standalone
per-metric queries keep their original single-scan cost; their DuckDB
oracles are untouched because only the derivation moved, not the
answer.

Tokenizer contract: ``split(trim(text), '\\s+')`` — the exact
tokenization the seven metric oracles use. Queries with a different
tokenizer (boilerplate_bigram_flags' single-space split, the
fingerprint family's per-token char folds) intentionally do NOT derive
from this layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.operators.sampling import with_split
from etl_pipeline_orchestration_spark.sources.tables import load_table


def corpus_gram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single-grain token statistics relation:

    ``(lang, source, split, w1, w2, c, n_first)``

    where ``c`` counts occurrences of the (w1, w2) adjacency under that
    metadata key (``w2`` NULL marks a document-final token, so unigram
    counts are exact) and ``n_first`` counts documents (rows whose token
    was at position 1). ``split`` is the deterministic Knuth-bucket
    train/val/test assignment (operators/sampling.with_split), included
    so split-conditioned metrics derive from the same pass."""
    return gram_stats_of(with_split(load_table(spark, sf_dir, "documents")))


def gram_stats_of(docs: DataFrame) -> DataFrame:
    """The histogram pass over an arbitrary documents relation (must
    carry ``lang``, ``source``, ``split``, ``text``) — factored out so
    incremental maintenance can run the SAME pass over a delta
    partition and merge (the aggregate is a sum, hence mergeable:
    f(A ⊎ B) == merge(f(A), f(B)), cross-engine-verified by
    corpus_stats_incremental_merge)."""
    ws = F.split(F.trim(F.col("text")), r"\s+")
    base = docs.select("lang", "source", "split", ws.alias("ws"))
    # size(ws) >= 1 for ANY string (split of "" is [""]), so the
    # sequence bounds are always legal — no short-doc guard needed here.
    # The document-final w2 MUST be guarded though: bare ws[i] at
    # i == size(ws) yields NULL only under ANSI-off — the driver's
    # vanilla ANSI session throws INVALID_ARRAY_INDEX (caught by the
    # round-4 vanilla-session probe before it reached the driver).
    pairs = F.expr(
        "transform(sequence(1, size(ws)),"
        " i -> struct(i AS pos, ws[i - 1] AS w1,"
        " if(i < size(ws), ws[i], cast(null as string)) AS w2))"
    )
    return (
        base.select("lang", "source", "split", F.explode(pairs).alias("p"))
        .select("lang", "source", "split", "p.pos", "p.w1", "p.w2")
        .groupBy("lang", "source", "split", "w1", "w2")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.when(F.col("pos") == 1, 1).otherwise(0)).alias("n_first"),
        )
    )


def materialize_gram_stats(
    spark: SparkSession, sf_dir: str, loader, table: str = "gram_stats"
):
    """Publish the corpus-statistics layer as a snapshot table — the
    production deployment of this module: the nightly pipeline runs the
    one corpus scan, publishes the vocab²-bounded histogram as a new
    version (atomic pointer flip; long readers isolated), and every
    per-metric query then passes ``from_stats=snaps.read()`` instead of
    re-scanning documents. Returns the SnapshotTable."""
    from etl_pipeline_orchestration_spark.loader import SnapshotTable

    snaps = SnapshotTable(loader, table)
    snaps.write(corpus_gram_stats(spark, sf_dir))
    return snaps


def unigram_hist(gram_stats: DataFrame, *keys: str) -> DataFrame:
    """Exact word counts ``(*keys, word, c)`` for any subset of
    ``(lang, source, split)`` — sum over the dimensions not kept."""
    return (
        gram_stats.groupBy(*keys, F.col("w1").alias("word"))
        .agg(F.sum("c").alias("c"))
    )


def bigram_hist(gram_stats: DataFrame, *keys: str) -> DataFrame:
    """Exact adjacent-pair counts ``(*keys, w1, w2, c)``."""
    return (
        gram_stats.filter(F.col("w2").isNotNull())
        .groupBy(*keys, "w1", "w2")
        .agg(F.sum("c").alias("c"))
    )


def doc_counts(gram_stats: DataFrame, *keys: str) -> DataFrame:
    """Exact document counts ``(*keys, n_docs)`` — every document has a
    position-1 token, counted once in ``n_first``."""
    return gram_stats.groupBy(*keys).agg(F.sum("n_first").alias("n_docs"))
