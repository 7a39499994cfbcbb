"""Unigram-LM tokenizer (SentencePiece-style) — deterministic hard-EM.

The second production tokenizer family next to BPE (operators/bpe.py):
where BPE BUILDS pieces bottom-up by merging, the unigram LM (Kudo
2018, public method) SELECTS pieces top-down — score every candidate
piece, then segment each word with the maximum-likelihood (Viterbi)
decomposition under the piece scores. This module implements the
deterministic hard-EM variant: seed scores from substring frequencies,
then alternate Viterbi segmentation (E-step, distributed) with
count-and-rescore (M-step, model-sized) — no sampling, no float
accumulation across workers (all distributed reductions are integer
counts; logs are taken once, driver-side, on the model-sized vocab).

Scale shape (the BPE discipline): the corpus is scanned EXACTLY ONCE
into the word histogram (word, count); every training stage after that
is histogram-space — candidate generation explodes substrings of
DISTINCT words (vocab-bounded rows), piece selection is a distributed
top-k (TakeOrdered, never a full collect), and each EM round segments
distinct words (Arrow-batched over coarse hash buckets — the
applyInPandas tiny-group rule) and aggregates integer piece usage
(vocab-bounded). Encoding a corpus is a broadcast of the model-sized
vocab + the same per-distinct-word Viterbi joined back to documents.

Determinism: piece selection is ordered (freq DESC, piece ASC); the
Viterbi tie-break maximizes (score, -n_tokens, last-piece-length) so
equal-score decompositions resolve identically everywhere; M-step
counts are exact integers and every log is computed once on the
driver. Single-character pieces are never pruned (coverage guarantee:
any word over the training alphabet segments; unseen characters at
encode time take UNK_LOGP as single-char pieces instead of failing).
"""

from __future__ import annotations

import math
from typing import Dict, Iterable, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.operators.bpe import word_histogram

UNK_LOGP = -1e9
_SEG_BUCKETS = 32


def piece_candidates(hist: DataFrame, max_len: int = 4) -> DataFrame:
    """(piece, freq): every substring of length 1..max_len of every
    distinct word, weighted by the word's corpus count — the unigram
    seed statistic. Histogram-space: rows explode from DISTINCT words
    only; the aggregate is map-side combined and bounded by the number
    of distinct substrings, never the corpus."""
    word = F.col("word")
    n = F.length(word)
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_len), n - i + 1)),
                lambda L: F.substr(word, i, L),
            ),
        )
    )
    return (
        hist.select(F.explode(subs).alias("piece"), "c")
        .groupBy("piece")
        .agg(F.sum("c").cast("bigint").alias("freq"))
    )


def select_seed_vocab(
    cands: DataFrame, vocab_size: int
) -> Dict[str, int]:
    """{piece: freq} — ALL single characters (coverage) plus the top
    (vocab_size - alphabet) multi-character pieces by (freq DESC,
    piece ASC). Both driver transfers are model-sized: the alphabet
    collect is character-cardinality, the multi-piece top-k is a
    distributed TakeOrdered limit."""
    singles = {
        r["piece"]: r["freq"]
        for r in cands.filter(F.length("piece") == 1).collect()
    }
    k = max(vocab_size - len(singles), 0)
    multi = (
        cands.filter(F.length("piece") >= 2)
        .orderBy(F.desc("freq"), F.asc("piece"))
        .limit(k)
        .collect()
    )
    vocab = dict(singles)
    for r in multi:
        vocab[r["piece"]] = r["freq"]
    return vocab


def score_vocab(freqs: Dict[str, int]) -> Dict[str, float]:
    """{piece: logp} from integer counts — the only place logs are
    taken, once, driver-side, over the model-sized vocab."""
    total = sum(freqs.values())
    return {p: math.log(f / total) for p, f in freqs.items() if f > 0}


def viterbi_segment(
    word: str, scores: Dict[str, float], max_len: int
) -> List[str]:
    """Maximum-likelihood segmentation of one word. DP over character
    positions; tie-break maximizes (score, -n_tokens, last-piece-len),
    so equal-likelihood splits resolve deterministically. Characters
    absent from the vocab segment as single-char UNK pieces."""
    n = len(word)
    NEG = float("-inf")
    # state: (score, -ntokens, last_len, back_pos)
    best: List[Tuple[float, int, int, int]] = [(NEG, 0, 0, -1)] * (n + 1)
    best[0] = (0.0, 0, 0, -1)
    for j in range(1, n + 1):
        cur = (NEG, 0, 0, -1)
        for L in range(1, min(max_len, j) + 1):
            prev = best[j - L]
            if prev[0] == NEG:
                continue
            piece = word[j - L : j]
            lp = scores.get(piece)
            if lp is None:
                if L > 1:
                    continue
                lp = UNK_LOGP
            cand = (prev[0] + lp, prev[1] - 1, L, j - L)
            if cand[:3] > cur[:3]:
                cur = cand
        best[j] = cur
    pieces: List[str] = []
    j = n
    while j > 0:
        _, _, L, back = best[j]
        pieces.append(word[back:j])
        j = back
    pieces.reverse()
    return pieces


def segment_histogram(
    hist: DataFrame, scores: Dict[str, float], max_len: int
) -> DataFrame:
    """(word, c, pieces array<string>) — Viterbi over DISTINCT words,
    Arrow-batched through coarse hash buckets (millions of one-row
    groups would pay per-group overhead; ~32 buckets keep each pandas
    call thousands of words wide). The scores dict is model-sized and
    ships in the UDF closure (a broadcast at real scale)."""
    import pandas as pd  # noqa: F401 — module-level per the UDF rule

    def seg(pdf):
        pdf = pdf.copy()
        pdf["pieces"] = [
            viterbi_segment(w, scores, max_len) for w in pdf["word"]
        ]
        return pdf[["word", "c", "pieces"]]

    return (
        hist.withColumn(
            "bkt", F.pmod(F.xxhash64("word"), F.lit(_SEG_BUCKETS))
        )
        .groupBy("bkt")
        .applyInPandas(seg, "word string, c bigint, pieces array<string>")
    )


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 48,
    max_piece_len: int = 4,
    em_rounds: int = 2,
    text_col: str = "text",
) -> Tuple[Dict[str, float], DataFrame]:
    """Returns ({piece: logp}, word histogram) after hard-EM rounds:
    E-step = distributed Viterbi segmentation of the histogram under
    the current scores; M-step = integer usage counts (vocab-bounded
    aggregate + collect) re-scored driver-side, pruning multi-char
    pieces the segmentation stopped using (the unigram prune step) and
    keeping every single character (coverage floor count 1)."""
    hist = word_histogram(docs, text_col).localCheckpoint(eager=True)
    freqs = select_seed_vocab(
        piece_candidates(hist, max_piece_len), vocab_size
    )
    scores = score_vocab(freqs)
    alphabet = {p for p in freqs if len(p) == 1}
    for _ in range(em_rounds):
        seg = segment_histogram(hist, scores, max_piece_len)
        usage_rows = (
            seg.select(F.explode("pieces").alias("piece"), "c")
            .groupBy("piece")
            .agg(F.sum("c").cast("bigint").alias("u"))
            .collect()
        )
        usage = {r["piece"]: r["u"] for r in usage_rows}
        freqs = {p: u for p, u in usage.items() if len(p) >= 2 and u > 0}
        for ch in alphabet:
            freqs[ch] = max(usage.get(ch, 0), 1)  # coverage floor
        scores = score_vocab(freqs)
    return scores, hist


def encode_tokens_per_word(
    hist: DataFrame, scores: Dict[str, float], max_len: int
) -> DataFrame:
    """(word, c, n_tokens, token_chars) — the encode-side statistic:
    tokens per distinct word under the trained model, plus the exact
    reconstruction check (token_chars must equal length(word); the
    Viterbi backtrack partitions the word, so inequality means a DP
    bug, asserted in tests)."""
    seg = segment_histogram(hist, scores, max_len)
    return seg.select(
        "word",
        "c",
        F.size("pieces").cast("bigint").alias("n_tokens"),
        F.aggregate(
            F.transform("pieces", F.length),
            F.lit(0),
            lambda a, x: a + x,
        )
        .cast("bigint")
        .alias("token_chars"),
    )
