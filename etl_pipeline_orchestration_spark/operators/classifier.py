"""Distributed quality-classifier TRAINING (DCLM/FineWeb-style): fit a
logistic-regression document classifier with a driver-coordinated
iterative aggregate, then score the corpus with the learned weights as
plan literals.

The reference scores documents with a FIXED linear model
(operators/text.py quality_linear_logit, the fasttext-classifier
analog); real curation pipelines also have to TRAIN that model on
labeled documents (DCLM trains fastText on target-vs-raw, FineWeb-Edu
distills an LLM judge into a linear head). This module is that
training step, done the 100 TB way:

* Each iteration is ONE whole-table aggregate (map-side combined sums
  of ``f_j * residual``) — the only thing the driver ever sees is the
  k-vector gradient (k = 6 here), never rows. Training cost is
  iterations x one scan of a narrow integer feature relation that is
  localCheckpoint'ed once.
* The update is diagonal-Newton-ish: ``beta_j += trunc(g_j / M2_j)``
  where ``M2_j = sum(f_j^2)`` (a one-time aggregate). At p=0.5 the true
  Hessian diagonal is ``0.25 * M2``, so this is a conservative 1/4
  Newton step — self-normalizing across feature scales, no
  per-feature learning-rate tuning.
* Bit-reproducibility discipline (the DSIR recipe,
  plans/corpus_ops.py): features are INTEGERS (ratio features are
  ``(100*a) div b`` truncated divisions of counts), probabilities are
  frozen to the integer micro grid ``floor(1e6 * sigmoid(z/1e6) +
  0.5)``, gradients are exact int64 sums (immune to float summation
  order), and the update uses TRUNCATED division (matching DuckDB's
  ``//``; Python negatives are sign-adjusted). Every beta is therefore
  an exact integer an independent engine can replay — the DuckDB
  oracle unrolls the same six iterations as chained CTEs and must
  reproduce identical weights, scores, and confusion counts. The only
  float op is ``exp`` on identical doubles (last-ulp divergence would
  need sigmoid(z) to sit within one ulp of a half-integer boundary in
  micro units — ~1e-10 per row, same accepted exposure as DSIR's
  ``log``).

Labels here are planted ground truth: ``y = (generating quality logit
> 1.4)`` — the known linear separator the trainer must recover, which
makes convergence testable (accuracy vs the generating labels rises
monotonically toward ~0.9; majority class is ~0.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.operators.text import (
    QUALITY_MODEL_BIAS,
    QUALITY_MODEL_WEIGHTS,
    STOPWORDS,
    tokens,
)

#: Logit threshold that splits the synthetic corpus ~50/50 (the planted
#: label the trainer recovers).
LABEL_LOGIT_THRESHOLD = 1.4

#: Fixed iteration count: unrolled identically in the DuckDB oracle.
TRAIN_ITERS = 6

FEATURE_COLS = ("f0", "f1", "f2", "f3", "f4", "f5")


def _trunc_div(a: int, b: int) -> int:
    """Truncated integer division (toward zero) — DuckDB ``//``
    semantics; Python ``//`` floors, so negatives are sign-adjusted."""
    return -((-a) // b) if a < 0 else a // b


def classifier_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Integer feature relation [doc_id, y, f0..f5].

    f0 = 1 (bias); f1 = stopword ratio x100; f2 = punctuation ratio
    x100; f3 = chars/10 capped 400 (length signal, integer stand-in for
    the generating model's log_len); f4 = mean token length x10 capped
    200; f5 = distinct-token ratio x100. All ``(100*a) div b`` with
    positive operands, where truncated == floored division on both
    engines. The label replays the generating double logit chain
    (identical literals and association as quality_linear_logit)
    thresholded at LABEL_LOGIT_THRESHOLD.
    """
    t = F.col(text_col)
    w = tokens(text_col)
    nc = F.length(t)
    np_ = nc - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    nd = nc - F.length(F.regexp_replace(t, r"[0-9]", ""))
    nt = F.size(w)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    nstop = F.size(F.filter(w, lambda x: F.array_contains(stop_arr, F.lower(x))))
    ndist = F.size(F.array_distinct(w))
    raw = docs.select(
        "doc_id",
        nc.cast("bigint").alias("nc"),
        np_.cast("bigint").alias("np"),
        nd.cast("bigint").alias("nd"),
        nt.cast("bigint").alias("nt"),
        nstop.cast("bigint").alias("nstop"),
        ndist.cast("bigint").alias("ndist"),
    )
    # The planted label: the generating model's logit, verbatim
    # (same op order/literals as quality_linear_logit), > threshold.
    nt_safe = F.when(F.col("nt") == 0, F.lit(None)).otherwise(F.col("nt"))
    nc_safe = F.when(F.col("nc") == 0, F.lit(None)).otherwise(F.col("nc"))
    feats = {
        "log_len": F.log(F.lit(1.0) + F.col("nc").cast("double")),
        "stopword_ratio": F.col("nstop") / nt_safe,
        "punct_ratio": F.col("np") / nc_safe,
        "mean_token_len": (F.col("nc") - (F.col("nt") - 1)) / nt_safe,
        "digit_ratio": F.col("nd") / nc_safe,
        "distinct_ratio": F.col("ndist") / nt_safe,
    }
    logit = F.lit(QUALITY_MODEL_BIAS)
    for name, wgt in QUALITY_MODEL_WEIGHTS:
        logit = logit + F.lit(wgt) * feats[name]
    y = F.coalesce(logit > F.lit(LABEL_LOGIT_THRESHOLD), F.lit(False))
    return raw.select(
        "doc_id",
        y.cast("int").alias("y"),
        F.lit(1).cast("bigint").alias("f0"),
        F.expr("(100 * nstop) div nt").alias("f1"),
        F.expr("(100 * np) div greatest(nc, 1L)").alias("f2"),
        F.expr("least(nc div 10, 400L)").alias("f3"),
        F.expr("least((10 * (nc - (nt - 1))) div nt, 200L)").alias("f4"),
        F.expr("(100 * ndist) div nt").alias("f5"),
    )


def _z_expr(betas: list[int]) -> F.Column:
    z = F.lit(0).cast("bigint")
    for b, c in zip(betas, FEATURE_COLS):
        z = z + F.lit(int(b)).cast("bigint") * F.col(c)
    return z


def train_logistic_int(
    feats: DataFrame, iters: int = TRAIN_ITERS
) -> tuple[list[int], list[int]]:
    """Fit integer logistic weights; returns (betas, M2).

    ``feats`` must carry FEATURE_COLS + ``y``. One localCheckpoint
    materializes the narrow integer relation (n_docs x 8 int64 — ~64 B
    a row, executor storage, never the driver); each iteration then
    aggregates the k-vector gradient from it. Driver traffic is
    ``iters + 1`` rows of k scalars.
    """
    fdf = feats.localCheckpoint()
    m2_row = fdf.agg(
        *[
            F.greatest(F.sum(F.col(c) * F.col(c)), F.lit(1)).alias(c)
            for c in FEATURE_COLS
        ]
    ).collect()[0]
    m2 = [int(m2_row[c]) for c in FEATURE_COLS]
    betas = [0] * len(FEATURE_COLS)
    for _ in range(iters):
        p = _p_micro(_z_expr(betas))
        resid = F.col("y").cast("bigint") * F.lit(1_000_000) - p
        g_row = fdf.agg(
            *[F.sum(F.col(c) * resid).alias(c) for c in FEATURE_COLS]
        ).collect()[0]
        betas = [
            b + _trunc_div(int(g_row[c]), m)
            for b, m, c in zip(betas, m2, FEATURE_COLS)
        ]
    return betas, m2


def _p_micro(z: F.Column) -> F.Column:
    """sigmoid(z micro-nats) frozen to the integer micro grid."""
    return F.floor(
        F.lit(1e6) / (F.lit(1.0) + F.exp(-(z.cast("double") * F.lit(1e-6))))
        + F.lit(0.5)
    ).cast("bigint")


def confusion_summary(feats: DataFrame, betas: list[int]) -> DataFrame:
    """Score with the learned weights (z >= 0 <=> p >= 0.5; no exp at
    scoring time) and reduce to the confusion matrix with exact int64
    score sums — the hash-comparable training outcome."""
    z = _z_expr(betas)
    return (
        feats.select("y", z.alias("z"))
        .groupBy("y", (F.col("z") >= 0).cast("int").alias("pred"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("z").cast("bigint").alias("sum_score_micro"),
        )
    )


def confusion_by_split(
    feats: DataFrame, betas: list[int], split: F.Column
) -> DataFrame:
    """Confusion matrix per data split (train/holdout) — the
    generalization report for a model trained on one split only."""
    z = _z_expr(betas)
    return (
        feats.select(split.alias("split"), "y", z.alias("z"))
        .groupBy("split", "y", (F.col("z") >= 0).cast("int").alias("pred"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("z").cast("bigint").alias("sum_score_micro"),
        )
    )


def train_logistic_int_folds(
    feats: DataFrame, k: int = 5, iters: int = TRAIN_ITERS
) -> dict[int, list[int]]:
    """K-fold variant of ``train_logistic_int`` with ONE scan per
    iteration for ALL folds: each aggregate computes the k x |features|
    masked gradient sums (fold f sums rows with doc_id % k != f) as
    parallel conditional-sum expressions, so cross-validation costs
    iters + 1 scans instead of k * (iters + 1). The arithmetic per
    fold is bit-identical to k separate trainings — same integer
    features, same micro-grid sigmoid, same truncated-division
    updates — only the job count changes."""
    fdf = feats
    fold = F.col("doc_id") % k

    def masked(f: int, col: F.Column) -> F.Column:
        return F.sum(
            F.when(fold != f, col).otherwise(F.lit(0).cast("bigint"))
        )

    m2_row = fdf.agg(
        *[
            F.greatest(
                masked(f, F.col(c).cast("bigint") * F.col(c)), F.lit(1)
            ).alias(f"m_{f}_{c}")
            for f in range(k)
            for c in FEATURE_COLS
        ]
    ).collect()[0]
    m2 = {
        f: [int(m2_row[f"m_{f}_{c}"]) for c in FEATURE_COLS] for f in range(k)
    }
    betas = {f: [0] * len(FEATURE_COLS) for f in range(k)}
    for _ in range(iters):
        exprs = []
        for f in range(k):
            p = _p_micro(_z_expr(betas[f]))
            resid = F.col("y").cast("bigint") * F.lit(1_000_000) - p
            exprs.extend(
                masked(f, F.col(c) * resid).alias(f"g_{f}_{c}")
                for c in FEATURE_COLS
            )
        g_row = fdf.agg(*exprs).collect()[0]
        for f in range(k):
            betas[f] = [
                b + _trunc_div(int(g_row[f"g_{f}_{c}"]), m)
                for b, m, c in zip(betas[f], m2[f], FEATURE_COLS)
            ]
    return betas
