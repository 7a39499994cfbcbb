"""Bounded-memory frequent-items (heavy hitters) [EXT].

Two-phase EXACT top-k over a token stream whose distinct-key count is
unbounded (web-scale vocabulary: typos, URLs, numbers — billions of
distinct tokens at 100 TB):

* Phase 1 — candidate generation: a per-partition **Misra–Gries**
  summary with capacity ``m``, maintained inside one Arrow-batched
  ``mapInPandas`` pass over the document text (documents stream through
  Arrow as whole strings; tokenization and counting happen in pandas/
  Counter space, so the token stream itself never becomes a shuffled
  relation). Misra–Gries merge (Agarwal et al., "Mergeable Summaries",
  PODS'12): add counters, then subtract the (m+1)-th largest count and
  drop non-positives. Guarantee: any token with true partition count
  > N_p/(m+1) survives its partition summary; by the averaging
  argument, any token with GLOBAL count > N/(m+1) exceeds that bound
  in at least one partition, so the union of per-partition summaries
  is a provable superset of every global heavy hitter. Output is at
  most P·m candidate rows regardless of vocabulary size.

* Phase 2 — exact verify: broadcast-semi-join the token stream against
  the candidate set and count exactly. Map-side partial aggregation
  bounds the shuffle at P·|candidates| rows. Candidates at or below
  the N/(m+1) floor are discarded (a non-candidate could tie them), so
  every emitted (token, count) is provably the true global top-k
  prefix: all candidates are counted exactly, and every non-candidate
  has true count ≤ N/(m+1) < every emitted count.

Contrast with the naive ``groupBy(token).count().orderBy(...)``: that
plan shuffles one partial row per (partition, distinct token) — at
web-scale vocabulary the shuffle is proportional to the vocabulary,
not to P·m, and the executor hash tables grow with per-partition
distinct counts instead of staying at the fixed capacity m.

Reference scope: the reference pipeline (etl_pipeline.py:176-318) has
no frequency analysis; this extends the engine for LLM-data corpus
work per the build brief.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_merge(counters: Counter, capacity: int) -> Counter:
    """Misra–Gries prune: keep at most ``capacity`` counters by
    subtracting the (capacity+1)-th largest count from every counter
    and dropping non-positives. Exact no-op while the summary fits."""
    if len(counters) <= capacity:
        return counters
    vals = sorted(counters.values(), reverse=True)
    dec = vals[capacity]  # (capacity+1)-th largest
    return Counter({t: c - dec for t, c in counters.items() if c > dec})


def misra_gries_summary(
    docs: DataFrame, capacity: int, text_col: str = "text"
) -> DataFrame:
    """Per-partition Misra–Gries summaries over whitespace tokens,
    returned as (token, cnt) rows — ≤ capacity rows PER PARTITION, so
    ≤ P·capacity total. The summary state lives across Arrow batches
    inside the partition iterator, so memory is O(capacity) per task
    no matter how many tokens stream through. Counts are MG
    lower-bound estimates (undercount ≤ N_p/(capacity+1)); they merge
    additively (Counter addition + mg_merge prune) with any other MG
    summary — the mergeable-summaries property the streaming
    maintenance layer relies on."""

    def _mg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: Counter = Counter()
        for pdf in batches:
            for s in pdf[text_col]:
                if s is None:
                    continue
                counters.update(s.split(" "))
                if len(counters) > 4 * capacity:
                    counters = mg_merge(counters, capacity)
        counters = mg_merge(counters, capacity)
        yield pd.DataFrame(
            {
                "token": list(counters.keys()),
                "cnt": [int(c) for c in counters.values()],
            }
        )

    return docs.select(text_col).mapInPandas(_mg, schema="token string, cnt long")


def misra_gries_candidates(
    docs: DataFrame, capacity: int, text_col: str = "text"
) -> DataFrame:
    """DISTINCT candidate tokens from the per-partition MG summaries
    (≤ P·capacity rows)."""
    return (
        misra_gries_summary(docs, capacity, text_col=text_col)
        .select("token")
        .distinct()
    )


def verify_topk(
    docs: DataFrame,
    candidates: DataFrame,
    capacity: int,
    k: int,
    text_col: str = "text",
) -> DataFrame:
    """Phase 2: exact broadcast-semi-join counts of ``candidates`` over
    the corpus, floor-filtered at N/(capacity+1) so the emitted prefix
    is provably the true global top-k (see module docstring). Output
    is IDENTICAL for any candidate relation that (a) is a superset of
    every token above the floor and (b) contains only real tokens —
    sub-floor candidates are filtered out, so differently-pruned MG
    runs (batch vs streamed merge order) converge to the same rows."""
    from pyspark.sql import Window

    tok = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    # Total token count: one narrow agg (no explode — size(split) folds
    # per document), scalar to the driver.
    n_total = docs.select(
        F.sum(F.size(F.split(F.col(text_col), " "))).alias("n")
    ).first()[0]
    exact = (
        tok.join(F.broadcast(candidates.select("token")), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # Integer-exact guarantee floor: cnt*(m+1) > N  <=>  cnt > N/(m+1).
    floor_ok = exact.filter(
        F.col("cnt") * F.lit(capacity + 1) > F.lit(int(n_total))
    )
    # ≤ capacity rows can exceed the floor, so this single-partition
    # window is size-bounded by construction.
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return (
        floor_ok.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", "token", "cnt")
    )


def exact_heavy_hitters(
    docs: DataFrame,
    capacity: int,
    k: int,
    text_col: str = "text",
) -> DataFrame:
    """Provably-exact global top-k tokens under O(capacity) task
    memory: Misra–Gries candidates, exact broadcast-semi-join counts,
    then the N/(capacity+1) floor filter that makes the prefix exact.
    Ties break on token ascending (deterministic on both engines)."""
    cands = misra_gries_candidates(docs, capacity, text_col=text_col)
    return verify_topk(docs, cands, capacity, k, text_col=text_col)
