"""Iterative BPE trainer: distributed loop vs an INDEPENDENT pure-
Python reference (symbol lists + explicit greedy scan — no string
replace), snapshot versioning, and the overlap edge cases that break
naive merge implementations."""

from __future__ import annotations

import collections

from etl_pipeline_orchestration_spark.operators.bpe import (
    SEP,
    bpe_encode,
    bpe_train,
    word_histogram,
)


def _ref_train(hist: dict[str, int], n_merges: int):
    """Reference BPE: symbol lists, explicit pair count, (f desc, l, r)
    tie-break, explicit greedy left-to-right merge scan."""
    state = {tuple(w): c for w, c in hist.items()}
    merges = []
    for _ in range(n_merges):
        counts = collections.Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += c
        if not counts:
            break
        (l, r), f = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((l, r, f))
        new_state = collections.Counter()
        for syms, c in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[tuple(out)] += c
        state = dict(new_state)
    return merges, state


def _ref_encode(word: str, merges) -> list[str]:
    syms = list(word)
    for l, r, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


CORPUS = [
    "the cat sat on the mat",
    "the hat of the cat",
    "aaaa aaa banana bandana",
    "low lower lowest newest widest",
    "the the the band ban banana",
]


def test_trainer_matches_reference_on_crafted_corpus(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    hist = {}
    for t in CORPUS:
        for w in t.split():
            hist[w] = hist.get(w, 0) + 1
    want, _ = _ref_train(hist, 12)
    got, _ = bpe_train(word_histogram(docs), n_merges=12)
    assert got == want and len(got) == 12


def test_overlap_greedy_semantics(spark):
    """aaaa under merge (a,a) must become [aa, aa]; aaa must become
    [aa, a] — the left-to-right non-overlapping scan. A replace-based
    implementation with single separators gets these wrong."""
    docs = spark.createDataFrame([("aaaa aaa",)], ["text"])
    merges, _ = bpe_train(word_histogram(docs), n_merges=2)
    assert merges[0][:2] == ("a", "a")
    assert bpe_encode("aaaa", merges[:1]) == ["aa", "aa"]
    assert bpe_encode("aaa", merges[:1]) == ["aa", "a"]
    # round 2 on [aa,aa],[aa,a]: pair (aa,aa) f=1, (aa,a) f=1 → tie →
    # lexicographic: ("aa","a") < ("aa","aa")
    assert merges[1][:2] == ("aa", "a")


def test_encode_parity_with_reference(spark):
    docs = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    merges, _ = bpe_train(word_histogram(docs), n_merges=10)
    for t in CORPUS:
        want = [s for w in t.split() for s in _ref_encode(w, merges)]
        assert bpe_encode(t, merges) == want


def test_vocab_snapshots_one_version_per_merge(spark, tmp_path):
    """The snaps hook versions the symbol state per merge: v=k is the
    vocabulary as of merge k (time travel for tokenizer debugging)."""
    from etl_pipeline_orchestration_spark.loader import (
        SnapshotTable,
        WarehouseLoader,
    )

    docs = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "bpe_vocab")
    merges, final = bpe_train(word_histogram(docs), n_merges=5, snaps=snaps)
    assert len(snaps.versions()) == 5

    def vocab(df):
        return {
            s
            for r in df.collect()
            for s in r["s"].split(SEP)
            if s
        }

    # each successive version's vocabulary contains the new merged
    # symbol; the final snapshot equals the returned state
    for k, (l, r, _) in enumerate(merges):
        assert l + r in vocab(snaps.read(version=snaps.versions()[k]))
    assert vocab(snaps.read()) == vocab(final)


def test_early_stop_when_no_pairs_remain(spark):
    docs = spark.createDataFrame([("x y z",)], ["text"])
    merges, _ = bpe_train(word_histogram(docs), n_merges=4)
    assert merges == []  # all words are single symbols — nothing to merge


def test_separator_bearing_token_fails_loudly(spark):
    """ADVICE r5: U+001F is not regex whitespace, so a token containing
    it would silently corrupt the symbol-state encoding — and the
    DuckDB oracle shares the representation, so the cross-engine hash
    could not catch it. word_histogram must raise, not proceed."""
    import pytest

    dirty = spark.createDataFrame([(f"ok bad{SEP}token",)], ["text"])
    with pytest.raises(Exception, match="U\\+001F|ASSERT|assert"):
        word_histogram(dirty).collect()
    # clean corpus unaffected by the guard
    clean = spark.createDataFrame([("ok token",)], ["text"])
    assert word_histogram(clean).count() == 2


# ---------------------------------------------------------------------------
# WordPiece trainer
# ---------------------------------------------------------------------------


def _ref_wordpiece(hist: dict[str, int], n_merges: int, scale: int):
    """Reference WordPiece: same symbol-list state machine as
    _ref_train, argmax on trunc(scale*f(ab) / (f(a)*f(b))) with
    (score desc, f desc, l, r) tie order."""
    state = {tuple(w): c for w, c in hist.items()}
    merges = []
    for _ in range(n_merges):
        pc = collections.Counter()
        sc = collections.Counter()
        for syms, c in state.items():
            for s in syms:
                sc[s] += c
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        scored = {
            (l, r): (scale * f) // (sc[l] * sc[r]) for (l, r), f in pc.items()
        }
        (l, r) = min(
            scored,
            key=lambda k: (-scored[k], -pc[k], k[0], k[1]),
        )
        merges.append((l, r, pc[(l, r)], scored[(l, r)]))
        new_state = collections.Counter()
        for syms, c in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[tuple(out)] += c
        state = dict(new_state)
    return merges


def test_wordpiece_matches_reference_and_diverges_from_bpe(spark):
    """The distributed WordPiece loop must equal an independent pure-
    Python replay, and on this corpus its merge sequence must DIFFER
    from BPE's — 'zq' appears only 3 times but z and q occur nowhere
    else (likelihood 1), while 'th' is frequent but t/h are spread
    across many words; BPE grabs the frequent pair, WordPiece the
    exclusive one."""
    from etl_pipeline_orchestration_spark.operators.bpe import (
        _WP_S,
        wordpiece_train,
    )

    corpus = CORPUS + ["zq zq zq"]
    docs = spark.createDataFrame([(t,) for t in corpus], ["text"])
    hist = collections.Counter(
        w for t in corpus for w in t.split() if w
    )
    want = _ref_wordpiece(dict(hist), 6, _WP_S)
    got, _ = wordpiece_train(word_histogram(docs), n_merges=6)
    assert got == want
    assert got[0][:2] == ("z", "q")  # exclusive pair wins round 1

    bpe, _ = bpe_train(word_histogram(docs), n_merges=6)
    assert [(l, r) for l, r, _ in bpe] != [(l, r) for l, r, _, _ in got]
    assert bpe[0][:2] != ("z", "q")  # BPE prefers the frequent pair
