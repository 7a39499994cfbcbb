"""Distributed quality-classifier training (operators/classifier.py).

The oracle sweep already certifies cross-engine weight parity (the
DuckDB oracle replays all six iterations); these tests pin the LEARNING
itself: accuracy against the planted labels must improve over
iterations and beat the majority class, the update must use truncated
(DuckDB-``//``) division, and the driver must only ever see k scalars.
"""

from __future__ import annotations

import pytest

from etl_pipeline_orchestration_spark.operators import classifier
from etl_pipeline_orchestration_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_trunc_div_matches_duckdb_semantics():
    assert classifier._trunc_div(7, 2) == 3
    assert classifier._trunc_div(-7, 2) == -3  # Python -7 // 2 == -4
    assert classifier._trunc_div(-6, 2) == -3
    assert classifier._trunc_div(0, 5) == 0


@pytest.fixture(scope="module")
def feats(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return classifier.classifier_features(docs).localCheckpoint()


def _accuracy(feats_df, betas) -> float:
    cm = classifier.confusion_summary(feats_df, betas).collect()
    n = sum(r.n_docs for r in cm)
    good = sum(r.n_docs for r in cm if r.y == r.pred)
    return good / n


def test_labels_are_two_balanced_classes(feats):
    counts = {r.y: r.n for r in feats.groupBy("y").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {0, 1}
    n = sum(counts.values())
    assert 0.3 < counts[1] / n < 0.7, counts


def test_training_learns_the_planted_separator(feats):
    """Accuracy rises from the zero model toward the generating
    separator and ends far above majority class."""
    accs = []
    for iters in (1, 3, classifier.TRAIN_ITERS):
        betas, _ = classifier.train_logistic_int(feats, iters=iters)
        accs.append(_accuracy(feats, betas))
    assert accs[0] < accs[1] < accs[2] + 1e-9, accs
    assert accs[-1] >= 0.80, accs
    counts = {r.y: r.n for r in feats.groupBy("y").count().withColumnRenamed("count", "n").collect()}
    majority = max(counts.values()) / sum(counts.values())
    assert accs[-1] > majority + 0.2, (accs, majority)


def test_m2_guard_handles_degenerate_feature(feats):
    """The punctuation feature is identically zero on the synthetic
    corpus; its M2 floors at 1 and its weight stays exactly 0 instead
    of dividing by zero."""
    betas, m2 = classifier.train_logistic_int(feats)
    j = classifier.FEATURE_COLS.index("f2")
    assert m2[j] == 1
    assert betas[j] == 0


def test_weights_are_deterministic(feats):
    b1, _ = classifier.train_logistic_int(feats)
    b2, _ = classifier.train_logistic_int(feats)
    assert b1 == b2
    assert all(isinstance(b, int) for b in b1)


def test_holdout_generalizes(spark):
    """Training on the 80% split generalizes to the unseen 20%: holdout
    accuracy beats majority class by a wide margin and tracks train
    accuracy (the planted separator is linear, so no memorization gap)."""
    from etl_pipeline_orchestration_spark.plans.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["quality_classifier_holdout"](spark, SF_DIR).collect()
    by_split = {}
    for r in rows:
        n, good = by_split.get(r.split, (0, 0))
        by_split[r.split] = (n + r.n_docs, good + (r.n_docs if r.y == r.pred else 0))
    acc = {s: g / n for s, (n, g) in by_split.items()}
    assert set(acc) == {"train", "holdout"}
    assert acc["holdout"] >= 0.75, acc
    assert abs(acc["train"] - acc["holdout"]) < 0.12, acc

def _q(name):
    from etl_pipeline_orchestration_spark.plans.registry import QUERIES, load_all

    load_all()
    return QUERIES[name]


def test_auc_matches_brute_force_pair_count(spark):
    """The midrank-histogram AUC equals the definitional pairwise
    P(score_pos > score_neg) + 0.5*P(tie), brute-forced per split."""
    rows = _q("quality_classifier_auc")(spark, SF_DIR).collect()
    from etl_pipeline_orchestration_spark.plans.llm_data import (
        _clf_split_scored,
    )

    scored = _clf_split_scored(spark, SF_DIR).collect()
    got = {r.split: r for r in rows}
    assert set(got) == {"train", "holdout"}
    for split in ("train", "holdout"):
        pos = sorted(r.z for r in scored if r.split == split and r.y == 1)
        neg = sorted(r.z for r in scored if r.split == split and r.y == 0)
        import bisect

        wins = sum(bisect.bisect_left(neg, z) for z in pos)
        ties = sum(
            bisect.bisect_right(neg, z) - bisect.bisect_left(neg, z)
            for z in pos
        )
        auc = (wins + 0.5 * ties) / (len(pos) * len(neg))
        r = got[split]
        assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
        assert r.auc == pytest.approx(auc, rel=1e-12)
        # the planted separator is learnable: ranking is far from random
        assert r.auc > 0.85, (split, r.auc)


def test_calibration_bins_partition_the_corpus(spark):
    rows = _q("quality_classifier_calibration")(spark, SF_DIR).collect()
    from etl_pipeline_orchestration_spark.plans.llm_data import (
        _clf_split_scored,
    )

    totals = {
        r.split: r.n
        for r in _clf_split_scored(spark, SF_DIR)
        .groupBy("split")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for split in ("train", "holdout"):
        bins = [r for r in rows if r.split == split]
        assert sum(r.n_docs for r in bins) == totals[split]
        for r in bins:
            assert 0 <= r.bin <= 9
            assert 0.0 <= r.acc <= 1.0
            assert 0.0 <= r.conf <= 1.0 + 1e-9
            assert r.gap == pytest.approx(abs(r.acc - r.conf), abs=1e-15)
            # confidence must sit inside its decile (micro-grid exact)
            assert r.bin * 100000 <= r.sum_p_micro / r.n_docs


def test_isotonic_matches_reference_pava_and_is_monotone(spark):
    """The minimax fitted values equal classic stack-based PAVA, are
    monotone non-decreasing, and preserve the weighted total (PAVA is
    an L2 projection, so pooled blocks keep their mass)."""
    rows = sorted(
        _q("quality_classifier_isotonic")(spark, SF_DIR).collect(),
        key=lambda r: r.bin,
    )
    n = [r.n_docs for r in rows]
    pos = [r.n_pos for r in rows]
    # reference PAVA: pool adjacent violators on (sum, weight) blocks
    blocks = []  # [sum_pos, sum_n]
    for p, w in zip(pos, n):
        blocks.append([p, w])
        while (
            len(blocks) > 1
            and blocks[-2][0] * blocks[-1][1] >= blocks[-1][0] * blocks[-2][1]
        ):
            b = blocks.pop()
            blocks[-1][0] += b[0]
            blocks[-1][1] += b[1]
    # expand blocks back to per-bin fitted values
    fitted = []
    for p, w in blocks:
        rate = p / w
        remaining = w
        while remaining > 0:
            take = n[len(fitted)]
            fitted.append(rate)
            remaining -= take
    got = [r.iso_rate for r in rows]
    assert got == pytest.approx(fitted, rel=1e-12)
    for a, b in zip(got, got[1:]):
        assert a <= b + 1e-15
    assert sum(g * w for g, w in zip(got, n)) == pytest.approx(
        sum(pos), rel=1e-12
    )


def test_kfold_batched_training_equals_separate_trainings(feats):
    """The one-scan-per-iteration k-fold trainer must produce betas
    bit-identical to five independent trainings on the same splits."""
    from pyspark.sql import functions as F

    batched = classifier.train_logistic_int_folds(feats, k=5)
    for f in range(5):
        separate, _ = classifier.train_logistic_int(
            feats.filter((F.col("doc_id") % 5) != f)
        )
        assert batched[f] == separate, f


def test_cv_folds_partition_and_generalize(spark):
    rows = _q("quality_classifier_cv")(spark, SF_DIR).collect()
    import duckdb

    n_docs = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs  # folds partition exactly
    acc = {}
    for f in range(5):
        fold = [r for r in rows if r.fold == f]
        n = sum(r.n_docs for r in fold)
        good = sum(r.n_docs for r in fold if r.y == r.pred)
        acc[f] = good / n
    # every held-out fold generalizes, and fold variance is small
    assert all(a >= 0.72 for a in acc.values()), acc
    assert max(acc.values()) - min(acc.values()) < 0.15, acc
