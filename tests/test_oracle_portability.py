"""Oracle SQL must be DuckDB-version-portable.

The round-10 driver ran a DuckDB whose UNPIVOT clause disagrees with
the local 1.0.0 (the only two window oracles using UNPIVOT were the
only two hash-fail rows), and integer ``//`` has historically flipped
between floor and truncate across DuckDB releases while Spark's ``div``
always truncates. Two rules, enforced over EVERY registered oracle:

1. No ``UNPIVOT`` — use ``registry.unpivot_sql`` (an explicit
   UNION ALL stack, the form every green oracle already used).
2. No bare ``//`` whose numerator can be negative — use
   ``registry.tdiv_sql`` (floor/trunc-invariant truncation) or
   ``registry.cdiv_sql`` (ceiling, non-negative operands). A bare
   ``//`` is allowed only when the query is allowlisted below with a
   written non-negativity argument (floor == truncate on non-negative
   numerators with positive denominators, so any engine agrees).

The helpers emit ``/*tdiv*/`` / ``/*cdiv*/`` markers; a guard
contributes exactly 2 (tdiv) or 1 (cdiv) ``//`` occurrences, so
``bare = count('//') - 2*tdiv - cdiv`` counts the unguarded sites.
"""

from __future__ import annotations

import pytest

from etl_pipeline_orchestration_spark.plans import registry as R

# query name -> why every bare // numerator is provably >= 0 (with a
# positive denominator). Adding a new oracle with bare // requires an
# entry here — write the argument, or use tdiv_sql/cdiv_sql.
NONNEG_DIV_OK: dict[str, str] = {
    # --- scaled ratios of counts/sums of non-negative quantities ---
    "ab_experiment_report": "sx = sum of revenue cents >= 0; variance "
    "numerator n*sxx - sx^2 >= 0 (Cauchy-Schwarz)",
    "ab_cuped_adjusted": "covariance sites guarded by tdiv; remaining "
    "are means/variances of non-negative revenue",
    "ab_diff_in_differences": "signed mean-difference site guarded by "
    "tdiv; remaining are means/variances of non-negative revenue",
    "ab_guardrails_srm_conversion": "conversion counts and totals",
    "ab_ipw_stratified_ate": "signed effect site guarded by tdiv; "
    "remaining are counts and sums of non-negative cents",
    "ab_msprt_always_valid": "x = order cents >= 0; variance numerator "
    ">= 0",
    "ab_power_mde": "means/variances of non-negative cents; "
    "delta_milli floored at 1",
    "abc_classification_parts": "revenue-share ratios of non-negative "
    "cumulative sums",
    "attribution_heuristics_events": "1000000 // n_channels, n >= 1",
    "blocklist_filter_report": "substring hit counts scaled by "
    "positive pattern lengths",
    "bloom_join_prune_audit": "bit positions and word indexes (hash "
    "values reduced mod m >= 0)",
    "bradley_terry_brand_prefs": "documented all-positive operands "
    "(win counts, strength masses floored at 1)",
    "classifier_lift_deciles": "decile ranks, cumulative positives, "
    "gain ratios — all counts",
    "cohort_ltv_per_member": "cumulative cents over cohort size",
    "corpus_mixture_allocation": "largest-remainder quotas over "
    "non-negative row counts",
    "curriculum_stage_assignment": "quartile rank indexes (n-1)*k//4",
    "cusum_changepoints_daily": "mean of non-negative daily order "
    "counts (rounding form 2a+n // 2n)",
    "decision_tree_histogram_splits": "Gini gain numerators are "
    "squares times counts",
    "decision_tree_leaf_stats": "same histogram algebra — squares "
    "and counts",
    "dedup_keep_fullest_by_lead": "prefix length * 3 // 5",
    "doc_chunks_fixed_tokens": "token index // chunk size",
    "embedding_near_dup_pairs_crossengine": "plane index // band size",
    "embedding_pca_power_exact": "iterate rescale guarded by tdiv; "
    "Rayleigh numerator v.Gv >= 0 (G is PSD)",
    "embedding_topk_ivfpq_exact": "dimension index // subspace width",
    "gbt_conformal_intervals": "round CTEs guarded by tdiv; remaining "
    "are y >= 0 means, squared-gain numerators, quantile ranks, "
    "coverage counts",
    "gbt_stump_boosting": "residual-mean and leaf-value sites guarded "
    "by tdiv; remaining gain numerators are squares times counts",
    "gbt_training_curve": "sum of squared residuals // n",
    "gsp_frequent_sequences": "support threshold (count+3)//4",
    "hard_negative_mining_batch": "count(*) // 50",
    "harmonic_centrality_ksource": "1000000 // hop distance, hops >= 1",
    "hits_supplier_part": "hub/authority masses non-negative, "
    "rescaled by positive max",
    "itemitem_cf_topk": "squared cosine numerator over count product",
    "jl_projection_distortion": "squared-norm ratio",
    "l_diversity_risk_report": "segment counts",
    "line_level_dedup_report": "shingle index arithmetic",
    "logrank_reorder_gaps_ab": "expected-count/variance chain divides "
    "1e6*d*n1-style products of counts (non-negative) by risk-set "
    "sizes; the signed O-E difference happens in the final float z "
    "expression, not in integer division",
    "rdd_balance_cutoff_revenue": "signed covariance/x-mean/intercept "
    "divisions are tdiv-guarded; the bare sites are the y-mean "
    "(1000*sy)//nn on non-negative revenue sums",
    "markov_attribution_events": "absorption masses non-negative, "
    "denominators are positive normalizers",
    "multimodal_dhash_neardup": "group index doc_id//4, seed digit "
    "extraction, pixel->cell indexes y//2 x//2, and bit-position // 16 "
    "— all on non-negative integers",
    "multimodal_png_decode": "pixel coordinate checksum algebra on "
    "non-negative indexes",
    "multimodal_png_resize": "same pixel-index algebra",
    "multimodal_vad_segments": "sample index // frame size",
    "multimodal_video_frames": "triangular-number pixel sums",
    "multimodal_wav_features": "n_samples * 1000 // sample_rate",
    "nelson_aalen_reorder_gaps": "hazard increment (1e6*d)//n_risk on "
    "non-negative event counts and positive risk sets",
    "offpolicy_ips_replay": "rewards are non-negative revenue cents; "
    "counts and Laplace-smoothed propensities",
    "optimal_segmentation_weekly_revenue": "segment SSE division "
    "S^2 // len on non-negative squares; cq >= 0 by Cauchy-Schwarz "
    "for the // 1e6 output scaling",
    "pack_sequences_greedy": "prefix sum excluding current row >= 0",
    "pii_column_scan": "match counts over row counts",
    "quality_classifier_auc": "gradient update guarded by tdiv; "
    "remaining are rank sums and counts",
    "quality_classifier_calibration": "gradient guarded; bin counts",
    "quality_classifier_conformal": "gradient guarded; quantile ranks",
    "quality_classifier_conformal_mondrian": "gradient guarded; "
    "per-group quantile ranks",
    "quality_classifier_cv": "gradient guarded; fold counts",
    "quality_classifier_holdout": "gradient guarded; split counts",
    "quality_classifier_isotonic": "gradient guarded; PAV pool sums "
    "of 0/1 labels",
    "quality_classifier_train": "gradient update guarded by tdiv; "
    "f1..f5 are 100*count // count features",
    "repeated_ngram_spans_report": "gid unpacking min_gid // stride on "
    "non-negative packed position ids",
    "repeated_ngram_spans_sharded": "shard counts ceil((len-ov)/body) "
    "and gid/shard/position unpacking — all non-negative packed ids",
    "retention_cohort_matrix": "active counts over cohort size",
    "revenue_changepoints_binseg": "SSE-gain numerators are squares",
    "semdedup_prune": "k = count(*) // 256",
    "shapley_attribution_events": "marginals of a monotone coalition "
    "value (conversion mass) — non-negative by construction",
    "sql_udf_pricing_summary": "cents * discount-percent // 100",
    "stratified_sample_exact_n": "largest-remainder quota of counts",
    "stump_forest_oob": "Gini gains (squares) and fold counts",
    "t_closeness_risk_report": "EMD terms are sums of abs() cross-"
    "multiplications; denominators are positive count products",
    "target_encode_oof": "cs - s >= 0 (category total minus in-fold "
    "part of a sum of non-negative prices); fold hash // 200",
    "theil_sen_daily_revenue": "median rank (n+1)//2",
    "training_prep_chunked_pipeline": "token index and prefix-sum "
    "chunk arithmetic",
    "weekly_cohort_retention": "event week >= cohort week, so the "
    "day-diff // 7 is non-negative",
    "wordpiece_merge_sequence": "pair/word counts",
    "zorder_pruning_audit": "key * files // (max+1) on non-negative "
    "keys; scan-ratio counts",
}


def _scrub(sql: str) -> str:
    """Remove string literals so ``https://`` inside quoted URLs does
    not count as division."""
    out, i, n = [], 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n:
                if sql[i] == "'" and i + 1 < n and sql[i + 1] == "'":
                    i += 2  # escaped quote
                elif sql[i] == "'":
                    i += 1
                    break
                else:
                    i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def bare_div_count(sql: str) -> int:
    s = _scrub(sql)
    return s.count("//") - 2 * s.count("/*tdiv*/") - s.count("/*cdiv*/")


def violations(name: str, sql: str) -> list[str]:
    out = []
    if "UNPIVOT" in sql.upper():
        out.append(f"{name}: UNPIVOT is version-sensitive; use "
                   "registry.unpivot_sql")
    bare = bare_div_count(sql)
    if bare < 0:
        out.append(f"{name}: tdiv/cdiv marker without matching // "
                   "(marker count inconsistent)")
    if bare > 0 and name not in NONNEG_DIV_OK:
        out.append(
            f"{name}: {bare} bare '//' division(s) without a "
            "NONNEG_DIV_OK justification — use tdiv_sql/cdiv_sql or "
            "add the non-negativity argument"
        )
    return out


@pytest.fixture(scope="module", autouse=True)
def _load():
    R.load_all()


def test_no_unpivot_and_divisions_justified():
    bad: list[str] = []
    for name, sql in R.ORACLES.items():
        bad.extend(violations(name, sql))
    assert not bad, "\n".join(bad)


def test_allowlist_entries_still_registered_and_still_needed():
    stale = [n for n in NONNEG_DIV_OK if n not in R.ORACLES]
    assert not stale, f"allowlist names not registered: {stale}"
    unneeded = [
        n for n in NONNEG_DIV_OK if bare_div_count(R.ORACLES[n]) == 0
    ]
    assert not unneeded, (
        f"allowlist entries with no bare // left (remove them): "
        f"{unneeded}"
    )


def test_lint_catches_seeded_violations():
    assert violations("x", "SELECT v FROM t UNPIVOT (v FOR f IN (a))")
    assert violations("x", "SELECT a // b FROM t")
    # guarded forms pass without an allowlist entry
    assert not violations("x", "SELECT " + R.tdiv_sql("a", "b"))
    assert not violations("x", "SELECT " + R.cdiv_sql("a", "b"))
    # string literals don't count as division
    assert not violations("x", "SELECT 'https://e.com' FROM t")


def test_helpers_emit_expected_shapes():
    t = R.tdiv_sql("a", "b")
    assert t.count("//") == 2 and "/*tdiv*/" in t
    c = R.cdiv_sql("a", "b")
    assert c.count("//") == 1 and "/*cdiv*/" in c
    u = R.unpivot_sql("t", "k", ("x", "y"))
    assert "UNPIVOT" not in u.upper().replace("UNION ALL", "")
    assert u.count("UNION ALL") == 1 and "'x' AS f" in u
