"""Unigram-LM tokenizer tests: a full pure-Python third-engine replay
of the hard-EM trainer (seed counts -> Viterbi -> usage -> rescore) at
sf0.001, a planted corpus whose optimal segmentation is known, the
reconstruction identity, and determinism across runs."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.operators import unigram

SF = "/root/testdata/sf0.001"


# --------------------------------------------------------------- reference


def _ref_train(word_counts, vocab_size, max_len, rounds):
    """Pure-python replica of train_unigram over a {word: count} dict."""
    cand = Counter()
    for w, c in word_counts.items():
        n = len(w)
        for i in range(n):
            for L in range(1, min(max_len, n - i) + 1):
                cand[w[i : i + L]] += c
    singles = {p: f for p, f in cand.items() if len(p) == 1}
    k = max(vocab_size - len(singles), 0)
    multi = sorted(
        ((p, f) for p, f in cand.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:k]
    freqs = dict(singles)
    freqs.update(dict(multi))

    def score(fr):
        tot = sum(fr.values())
        return {p: math.log(f / tot) for p, f in fr.items() if f > 0}

    scores = score(freqs)
    alphabet = set(singles)
    for _ in range(rounds):
        usage = Counter()
        for w, c in word_counts.items():
            for p in unigram.viterbi_segment(w, scores, max_len):
                usage[p] += c
        freqs = {p: u for p, u in usage.items() if len(p) >= 2 and u > 0}
        for ch in alphabet:
            freqs[ch] = max(usage.get(ch, 0), 1)
        scores = score(freqs)
    return scores


def test_trainer_matches_pure_python_reference(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    wc = {
        r.word: r.c
        for r in docs.select(
            F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    want = _ref_train(wc, vocab_size=48, max_len=4, rounds=2)
    got, _ = unigram.train_unigram(
        docs, vocab_size=48, max_piece_len=4, em_rounds=2
    )
    assert set(got) == set(want)
    for p in got:
        assert abs(got[p] - want[p]) < 1e-12, p
    # non-vacuous: EM kept multi-char pieces and they carry most mass
    assert sum(len(p) >= 2 for p in got) > 10


def test_planted_pieces_win(spark):
    """Corpus of words built from {ab, cd}: the trained model must
    segment them into multi-char pieces (whole words fit max_len=4),
    never into characters."""
    rows = [("abab " * 20 + "cdcd " * 10 + "abcd " * 5,)] * 4
    docs = spark.createDataFrame(rows, "text string")
    scores, hist = unigram.train_unigram(
        docs, vocab_size=12, max_piece_len=4, em_rounds=2
    )
    assert "abab" in scores and "cdcd" in scores
    for w in ("abab", "cdcd"):
        seg = unigram.viterbi_segment(w, scores, 4)
        assert seg == [w], (w, seg)
    # the rare "abcd" decomposes into its frequent halves — the
    # likelihood-over-length trade that DEFINES the unigram model
    # (greedy-longest would say ["abcd"]; ML says p(ab)p(cd) wins)
    assert unigram.viterbi_segment("abcd", scores, 4) == ["ab", "cd"]
    # a word never seen still segments via pieces, not UNK chars
    seg = unigram.viterbi_segment("ababcdcd", scores, 4)
    assert seg == ["abab", "cdcd"]


def test_reconstruction_identity_and_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    scores, hist = unigram.train_unigram(
        docs, vocab_size=48, max_piece_len=4, em_rounds=2
    )
    enc = unigram.encode_tokens_per_word(hist, scores, 4).collect()
    assert len(enc) > 0
    for r in enc:
        assert r.token_chars == len(r.word), r.word  # exact partition
        assert 1 <= r.n_tokens <= len(r.word)
    scores2, _ = unigram.train_unigram(
        docs, vocab_size=48, max_piece_len=4, em_rounds=2
    )
    assert scores == scores2


def test_unseen_character_falls_back_to_unk():
    seg = unigram.viterbi_segment("a#b", {"a": -1.0, "b": -1.0, "ab": -1.5}, 4)
    assert seg == ["a", "#", "b"]
