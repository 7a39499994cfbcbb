"""Headline benchmark: wall-clock per query at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line on stdout:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {<name>: <sec>, ...}, "sf": <sf>, ...}
Per-query seconds are INLINE in "queries" (r13 VERDICT item 2: the
driver's round-over-round and 8-vs-32-core comparators read this field;
the earlier {"detail": ...} indirection left PERF per_query empty).
The full map incl. calibration ratios is ALSO written to
BENCH_DETAIL.json next to this script (committed per-round so every
query's cost stays auditable). Methodology unchanged: noop sink,
min-of-reps, additions only.

Each query is forced to full execution with the noop data-source write
(runs the complete physical plan, materializes nothing on the driver),
so timings measure scan + shuffle + compute, not collect serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Representative of every operator family: reference pipeline chain,
# TPC-H-style agg, star join, window, as-of join, sessionization,
# event-time windows, exact + LSH dedup, text analysis, similarity.
HEADLINE = [
    "sales_pipeline_monthly",
    "pipeline_sales",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q6_forecast_revenue",
    "join_revenue_by_region",
    "left_outer_join_customer_order_stats",
    "salted_agg_order_revenue",
    "window_top3_orders_per_customer",
    "window_running_revenue",
    "asof_join_events_orders",
    "sessionize_events",
    "tumbling_window_events",
    "dedup_exact_hash",
    "dedup_minhash_verified",
    "dedup_minhash_crossengine",
    "dedup_simhash_crossengine",
    "dedup_simhash_pairs",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_crossengine",
    "token_stats",
    "text_quality_scores",
    "pandas_udf_normalize_text",
    "apply_in_pandas_order_zscore",
    "embedding_topk_bruteforce",
    "embedding_topk_ivf",
    "multimodal_decoded_items",
    "tpch_q5_local_supplier_volume",
    "order_count_distribution",
    "training_prep_pipeline",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customers",
    "cdc_merge_orders",
    "doc_repetition_scores",
    "decontaminate_ngram_overlap",
    "dedup_clusters_connected_components",
    "dedup_clusters_cc_distributed",
    "multimodal_png_decode",
    "tpch_q7_nation_volume_shipping",
    "tpch_q19_bracket_discounted_revenue",
    "pivot_revenue_by_priority",
    "stats_moments_quantity",
    "daily_revenue_gapfill",
    "rolling_7day_revenue",
    "unigram_logprob_scores",
    "salted_join_event_segment_value",
    "tpch_q8_market_share",
    "data_quality_report",
    "training_prep_chunked_pipeline",
    "tfidf_top_terms",
    "dedup_jaccard_exact_pairs",
    "entity_resolution_parts",
    "winsorized_price_stats",
    "interval_overlap_join",
    "event_transition_matrix",
    "null_safe_join_cohorts",
    "market_basket_part_pairs",
    "association_rules_parts",
    "grouped_exact_percentiles",
    "rfm_customer_segments",
    "bm25_ranked_retrieval",
    "hybrid_retrieval_rrf",
    "semantic_decontamination_pairs",
    "triangle_count_copurchase",
    "doc_quality_linear",
    "bigram_logprob_scores",
    "curriculum_stage_assignment",
    "embedding_pq_topk",
    "boilerplate_bigram_flags",
    "lang_quantile_drift",
    "mixture_temperature_weights",
    "training_shards",
    "epoch_shuffle_plan",
    "token_budget_selection",
    "quality_gate_funnel",
    "embedding_topk_ivfpq",
    "embedding_topk_ivfpq_exact",
    "bpe_pair_frequencies",
    "vocab_encode_checksums",
    "split_leakage_report",
    "doc_fingerprints_winnow",
    "feature_hash_topk",
    "curation_end_to_end",
    "multimodal_wav_features",
    "multimodal_video_frames",
    "char_entropy_scores",
    "shingle_novelty_scores",
    "padding_efficiency_report",
    "source_cap_sample",
    "split_unigram_kl",
    "pmi_collocations",
    "zipf_slope_by_lang",
    "dedup_keep_fullest_by_lead",
    "conditional_entropy_by_lang",
    "lsh_recall_curve",
    "vocab_coverage_curve",
    "source_lang_skew",
    "graph_pagerank_part_supplier",
    "graph_ppr_part_neighborhood",
    "corpus_mixture_allocation",
    "stratified_sample_exact_n",
    "window_analytics_extended",
    "hard_negative_mining_batch",
    "retention_cohort_matrix",
    "kneser_ney_bigram_scores",
    "ab_experiment_report",
    "ab_cuped_adjusted",
    "readability_scores",
    "bradley_terry_brand_prefs",
    "ab_power_mde",
    "revenue_changepoints_binseg",
    "holt_winters_weekly_forecast",
    "ab_quantile_treatment_effects",
    "textrank_keywords",
    "sssp_weighted_copurchase",
    "ab_msprt_always_valid",
    "l_diversity_risk_report",
    "kcenter_coreset_embeddings",
    "ab_guardrails_srm_conversion",
    "corpus_report",
    "window_ntile_percent_rank",
    "embedding_kmeans_exact",
    "corpus_stats_incremental_merge",
    "snapshot_timetravel_diff",
    "dedup_substring_spans",
    "dedup_substring_removal_report",
    "bpe_merge_sequence",
    "bpe_encode_tokens",
    "upsert_timetravel_diff",
    "multimodal_jpeg_decode",
    "multimodal_jpeg_color",
    "dsir_importance_resample",
    "semdedup_prune",
    "pii_redaction_report",
    "url_canonical_dedup",
    "semi_anti_join_combo",
    "windows_combo",
    "set_ops_full_combo",
    "relational_functions_combo",
    "grouping_outer_combo",
    "avro_roundtrip_doc_stats",
    "quality_classifier_train",
    "cdc_envelope_apply",
    "heavy_hitters_topk",
    "global_contiguous_ids_docs",
    "hard_negative_mining",
    "referential_integrity_audit",
    "grouped_ols_discount_elasticity",
    "ewma_daily_revenue",
    "cusum_changepoints_daily",
    "naive_bayes_lang_confusion",
    "mmr_diverse_rerank",
    "label_propagation_communities",
    "chi_square_lang_source",
    "welch_ttest_event_value",
    "mann_whitney_u_event_value",
    "ks_test_event_value",
    "poisson_bootstrap_revenue_ci",
    "quality_classifier_auc",
    "quality_classifier_calibration",
    "quality_classifier_isotonic",
    "kaplan_meier_reorder_gaps",
    "blocklist_filter_report",
    "acf_daily_revenue",
    "link_prediction_jaccard",
    "rank_correlation_discount_quantity",
    "join_key_discovery",
    "sql_udf_pricing_summary",
    "sql_aggregate_surface_combo",
    "multimodal_dhash_neardup",
    "multimodal_audio_spectral",
    "kmv_distinct_by_source",
    "corpus_overlap_kmv",
    "seasonal_decompose_weekly",
    "quantile_normalize_doclen",
    "line_level_dedup_report",
    "bloom_join_prune_audit",
    "pareto_skyline_parts",
    "count_min_heavy_audit",
    "tpch_q13_customer_distribution",
    "xml_roundtrip_doc_stats",
    "bfs_hop_distance_copurchase",
    "double_exp_smoothing_forecast",
    "theil_sen_daily_revenue",
    "kcore_parts_copurchase",
    "unigram_tokenize_stats",
    "markov_attribution_events",
    "multimodal_vad_segments",
    "multimodal_scene_cuts",
    "gsp_frequent_sequences",
    "sequence_regex_funnel",
    "quality_classifier_conformal",
    "pii_column_scan",
    "embedding_outlier_iforest",
    "jl_projection_distortion",
    # round 9 landings
    "attribution_heuristics_events",
    "shapley_attribution_events",
    "embedding_pca_power_exact",
    "ab_diff_in_differences",
    "hits_supplier_part",
    "classifier_lift_deciles",
    "embedding_topk_lsh_exact",
    "abc_classification_parts",
    "cohort_ltv_per_member",
    "zorder_pruning_audit",
    # round 10 landings
    "map_json_topk_combo",
    "decision_tree_histogram_splits",
    "decision_tree_leaf_stats",
    "gbt_stump_boosting",
    "gbt_training_curve",
    "ab_ipw_stratified_ate",
    "itemitem_cf_topk",
    "wordpiece_merge_sequence",
    "target_encode_oof",
    "harmonic_centrality_ksource",
    "offpolicy_ips_replay",
    "stump_forest_oob",
    "gbt_conformal_intervals",
    "feature_mi_ranking",
    "dp_noisy_counts",
    "kneser_ney_trigram_scores",
    "embedding_dbscan_clusters",
    "t_closeness_risk_report",
    "mst_copurchase_parts",
    "single_linkage_clusters_parts",
    "optimal_segmentation_weekly_revenue",
    "logrank_reorder_gaps_ab",
    "rdd_balance_cutoff_revenue",
    "nelson_aalen_reorder_gaps",
    # round 12
    "spectral_bipartition_parts",
    "deepwalk_skipgram_pairs",
    "suffix_array_ranks_docs",
    "repeated_ngram_spans_report",
    "repeated_span_powers_report",
    "repeated_ngram_spans_sharded",
    "contamination_suffix_spans",
    "doc_memorization_profile",
]


def _calibration(spark) -> None:
    """Fixed synthetic workload (no table inputs): a codegen'd
    range->hash-agg of 30M rows through the noop sink. Its wall-clock
    tracks the machine's momentary capability — the box swings 2-4×
    between sessions under co-tenant load — so per-query RATIOS to this
    number are comparable across rounds while raw seconds are not."""
    (
        spark.range(30_000_000)
        .selectExpr("id % 997 AS k", "id AS v")
        .groupBy("k")
        .agg({"v": "sum", "*": "count"})
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"))
    except ValueError:
        sf = None

    from etl_pipeline_orchestration_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("bench")
    qs = entrymod.queries()

    # Warm the JVM/session so query 1 doesn't pay startup cost: one
    # codegen'd agg plus one parquet scan + noop write (initializes the
    # datasource and write paths the timed queries use).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    # Machine-speed calibration (min-of-reps, same protocol as queries).
    calib = None
    for _ in range(reps):
        t0 = time.perf_counter()
        _calibration(spark)
        dt = time.perf_counter() - t0
        calib = dt if calib is None else min(calib, dt)
    calib = round(calib, 3)

    timings: dict[str, float | None] = {}
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            timings[name] = None
            continue
        try:
            # Wall-clock on a shared box swings 3-4× between identical
            # runs (co-tenant load); min-of-reps reports the machine's
            # actual capability, not the neighbors' interference.
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
        except Exception as e:
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            timings[name] = None

    ok = {k: v for k, v in timings.items() if v is not None}
    n_failed = len(timings) - len(ok)
    total = round(sum(ok.values()), 3)

    # Full per-query map goes to a file (stdout tail capture is short).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_wallclock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "calibration_sec": calib,
                # ratio-to-calibration: the cross-round comparable number
                "ratios": {
                    k: round(v / calib, 3) if v is not None and calib else None
                    for k, v in timings.items()
                },
                "sf": sf,
                "reps": reps,
                "n_queries": len(timings),
                "n_failed": n_failed,
            },
            f,
            indent=1,
            sort_keys=True,
        )
        f.write("\n")

    # ONE line as the last stdout output, per-query seconds inline
    # (compact separators keep 237 entries under ~8 KB).
    out = {
        "metric": "headline_queries_wallclock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "calibration_sec": calib,
        "sf": sf,
        "n_queries": len(timings),
        "n_failed": n_failed,
    }
    print(json.dumps(out, separators=(",", ":")))
    return 0 if not n_failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
