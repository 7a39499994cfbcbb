"""Iterative byte-pair-encoding trainer — histogram-space merges.

``plans/corpus_ops.bpe_pair_frequencies`` is BPE merge-iteration 0 (the
first pair count). This module runs the full training loop (Sennrich et
al. 2016, public method): N rounds of count-adjacent-pairs → pick the
most frequent pair → merge it everywhere, over the WORD HISTOGRAM, not
the corpus — the standard trick that makes BPE training corpus-size-
independent: the corpus is scanned exactly once to build (word, count),
and every merge round is an explode+aggregate over vocabulary-bounded
rows (~10M types at 100 TB — executor-memory-sized), plus a 1-row
argmax collect. No round rescans documents.

Symbol-state representation: each word's current symbol sequence is a
single STRING with every symbol wrapped in double separators
(``␟␟sym1␟␟sym2␟␟`` with ␟ = U+001F, a char that cannot appear in
whitespace-split tokens of real text and is asserted absent). Applying
merge (A, B) is then exactly

    replace(state, '␟A␟␟B␟', '␟AB␟')

because string replace scans left-to-right replacing non-overlapping
occurrences — precisely BPE's greedy within-word merge order (the
double boundary leaves one separator on each side after a match, so
back-to-back occurrences ␟␟A␟␟B␟␟A␟␟B␟␟ both merge, while overlapping
ones ␟␟A␟␟A␟␟A␟␟ for pair (A,A) merge greedily left-to-right: [AA, A]).
Spark's ``replace`` and DuckDB's ``replace`` share these semantics, so
the whole training loop is replayable in the SQL oracle as N chained
CTEs — the merge SEQUENCE itself is hash-checked cross-engine, and an
independent pytest compares against a plain-Python reference trainer.

Determinism: the argmax is totally ordered by (freq DESC, left ASC,
right ASC) — the tie-break every reproducible tokenizer build needs.

Scale shape per round: one explode of the histogram's symbol strings
(vocab-bounded rows × symbols-per-word), one map-side-combined pair
aggregate (bounded by symbol-pair types), a 1-row TakeOrdered collect,
one narrow ``replace`` projection re-materialized with an eager
localCheckpoint (keeps the per-round plan flat; blocks are freed by the
ContextCleaner when training ends). The ``snaps`` hook versions the
symbol state after every merge as a SnapshotTable — vocab-as-of-merge-k
time travel for debugging a tokenizer regression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"
S2 = SEP * 2


def word_histogram(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, c): whitespace tokenization, empty tokens dropped — the
    single corpus-scale pass of BPE training.

    U+001F is the symbol-state separator, and it is NOT regex ``\\s``
    whitespace, so a token containing it would silently corrupt the
    symbol encoding (splitting one token into bogus symbols) — and the
    DuckDB oracle shares the representation, so the cross-engine hash
    could not catch it. The guard below fails the job loudly instead:
    ``assert_true`` returns NULL (kept by ``isNull``) for clean tokens
    and raises mid-scan on the first separator-bearing one. It lives in
    the filter condition, not a projected column, so Catalyst cannot
    prune it away."""
    w = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    return (
        docs.select(w)
        .filter(F.col("word") != "")
        .filter(
            F.assert_true(
                ~F.col("word").contains(SEP),
                F.lit("BPE word_histogram: token contains the U+001F "
                      "symbol-state separator"),
            ).isNull()
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def _sym_state(word_col: str = "word") -> F.Column:
    """Initial symbol state: characters double-separator-wrapped."""
    chars = F.filter(F.split(F.col(word_col), ""), lambda ch: ch != F.lit(""))
    return F.concat(F.lit(S2), F.array_join(chars, S2), F.lit(S2))


def _pair_counts(state: DataFrame) -> DataFrame:
    """(l, r, f): adjacent-symbol pair frequencies over the histogram,
    weighted by word count."""
    syms = F.filter(F.split(F.col("s"), SEP), lambda x: x != F.lit(""))
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.expr("array()").cast("array<struct<l:string,r:string>>"))
    return (
        state.select(F.explode(pairs).alias("p"), "c")
        .groupBy("p.l", "p.r")
        .agg(F.sum("c").cast("bigint").alias("f"))
    )


def bpe_train(
    hist: DataFrame,
    n_merges: int = 8,
    snaps=None,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Run ``n_merges`` BPE rounds over a (word, c) histogram. Returns
    (merge sequence [(left, right, freq), ...], final symbol state).
    Stops early when no pair remains. ``snaps`` (a loader.SnapshotTable)
    gets one version per merge — the symbol state AFTER that merge."""
    state = hist.select(
        _sym_state().alias("s"), F.col("c").cast("bigint").alias("c")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(state)
            .orderBy(F.desc("f"), "l", "r")
            .limit(1)
            .head()
        )
        if top is None:
            break
        left, right, freq = top["l"], top["r"], int(top["f"])
        merges.append((left, right, freq))
        state = state.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(f"{SEP}{left}{S2}{right}{SEP}"),
                F.lit(f"{SEP}{left}{right}{SEP}"),
            ),
        ).localCheckpoint(eager=True)
        if snaps is not None:
            snaps.write(state)
    return merges, state


def bpe_encode(text: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Driver-side reference encoder: apply the learned merge sequence,
    in order, to one whitespace-split text — used by the encode-parity
    test and for spot-checking a trained tokenizer. Mirrors the greedy
    left-to-right replace semantics of the distributed trainer."""
    out: list[str] = []
    for word in text.strip().split():
        if not word:
            continue
        s = S2 + S2.join(word) + S2
        for left, right, _ in merges:
            s = s.replace(f"{SEP}{left}{S2}{right}{SEP}", f"{SEP}{left}{right}{SEP}")
        out.extend(x for x in s.split(SEP) if x)
    return out


def _symbol_counts(state: DataFrame) -> DataFrame:
    """(sym, sf): current-state symbol frequencies weighted by word
    count — the unigram denominators of the WordPiece merge score."""
    syms = F.filter(F.split(F.col("s"), SEP), lambda x: x != F.lit(""))
    return (
        state.select(F.explode(syms).alias("sym"), "c")
        .groupBy("sym")
        .agg(F.sum("c").cast("bigint").alias("sf"))
    )


_WP_S = 1_000_000_000_000  # 1e12 score quantization


def wordpiece_train(
    hist: DataFrame,
    n_merges: int = 8,
) -> tuple[list[tuple[str, str, int, int]], DataFrame]:
    """WordPiece trainer (Schuster & Nakajima 2012; the BERT tokenizer
    — public method): identical greedy merge loop to ``bpe_train``, but
    the round argmax maximizes the LIKELIHOOD score
    f(ab) / (f(a)·f(b)) instead of the raw pair count — preferring
    pairs whose parts rarely occur apart. The score is frozen by exact
    integer division at 1e12 (quantized-ratio rule); the denominator
    product rides DECIMAL(38,0) (symbol frequencies can reach corpus
    token count ~1e13 at 100 TB, whose square overflows int64). Ties
    break by (score desc, pair freq desc, l, r) — a total order shared
    with the DuckDB replay.

    Returns (merges [(left, right, freq, score_q)], final state). Per
    round: TWO histogram-space aggregates (pair counts + symbol
    counts), two vocab-sized joins, a 1-row argmax collect, and one
    string-replace projection — corpus touched only by the initial
    word histogram."""
    state = hist.select(
        _sym_state().alias("s"), F.col("c").cast("bigint").alias("c")
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int, int]] = []
    for _ in range(n_merges):
        pc = _pair_counts(state)
        sc = _symbol_counts(state)
        top = (
            pc.join(sc.selectExpr("sym AS l", "sf AS lf"), "l")
            .join(sc.selectExpr("sym AS r", "sf AS rf"), "r")
            .select(
                "l",
                "r",
                "f",
                F.expr(
                    f"cast(({_WP_S} * cast(f as decimal(38,0)))"
                    f" div (cast(lf as decimal(38,0)) * rf) as bigint)"
                ).alias("score_q"),
            )
            .orderBy(F.desc("score_q"), F.desc("f"), "l", "r")
            .limit(1)
            .head()
        )
        if top is None:
            break
        left, right = top["l"], top["r"]
        merges.append((left, right, int(top["f"]), int(top["score_q"])))
        state = state.withColumn(
            "s",
            F.replace(
                F.col("s"),
                F.lit(f"{SEP}{left}{S2}{right}{SEP}"),
                F.lit(f"{SEP}{left}{right}{SEP}"),
            ),
        ).localCheckpoint(eager=True)
    return merges, state
