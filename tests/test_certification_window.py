"""The driver samples the FIRST 50 registry entries for CORRECTNESS.

These tests freeze the curated certification window: it must stay
exactly 50 entries, cover every driver-certifiable SURVEY.md §2 row and
every round-3-5 flagship, lead the ``__spark_entry__.queries()`` order,
and keep SQL oracles for everything that is deterministically
SQL-expressible.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from etl_pipeline_orchestration_spark.plans import registry

# §2 row → certifying window query. Rows absent here are not
# driver-certifiable (sink/JDBC/streaming-runtime rows: K1/K3/K4 S3-jdbc
# T2 U-variants) and are covered by dedicated pytest modules instead.
SECTION2_CERTIFIERS = {
    "S1": "pipeline_sales",
    "S2": "pipeline_customers",
    "S3": "pipeline_finance",
    "S4": "pipeline_inventory",
    "S5": "pipeline_hr",
    "S6": "pipeline_weblogs",
    "K2": "pipeline_health_summary",
    "P1/P5/P6/P13": "sales_pipeline_monthly",
    "P2/P3": "safe_divide_revenue_per_unit",
    "P7/P8": "customer_churn_labels",
    "P10/P11": "finance_net_flow",
    "C1/C2/C3": "clean_dedup_nulldrop",
    "A1": "tpch_q1_pricing_summary",
    "A2": "distinct_part_supp_counts",
    "A3": "grouping_outer_combo",          # rollup + cube + grouping sets
    "J1/J3": "join_revenue_by_region",
    "J2": "full_outer_join_monthly_activity",
    "J2-left/right": "grouping_outer_combo",
    "J4/J5": "semi_anti_join_combo",
    "J6": "range_join_value_tiers",
    "J7": "asof_join_events_orders",
    "W1/W2/W3": "windows_combo",
    "O1": "map_json_topk_combo",          # round-10 fold (F5+F6+O1)
    "O2/O3": "set_ops_full_combo",
    "F1/F2/F3": "relational_functions_combo",
    "F4": "token_stats",
    "F5": "map_json_topk_combo",
    "F6": "map_json_topk_combo",
    # session facet rotated out round 10 — stays full-sweep oracled
    "T1": "tumbling_window_events",
    "U1": "pandas_udf_normalize_text",
    "U2": "apply_in_pandas_order_zscore",
    "U3-mapInPandas": "multimodal_jpeg_decode",
    "L-exact-dedup": "dedup_exact_hash",
    "L-minhash-lsh": "dedup_minhash_crossengine",
    "L-simhash": "dedup_simhash_crossengine",
    "L-jaccard-join": "dedup_jaccard_exact_pairs",
    "L-dup-clusters": "dedup_clusters_cc_distributed",
    "L-substring-dedup": "dedup_substring_spans",
    "L-ann-brute": "embedding_topk_bruteforce",
    "L-ann-ivfpq": "embedding_topk_ivfpq_exact",
    "L-near-dup-emb": "embedding_near_dup_pairs_crossengine",
    "L-lang-dist": "lang_distribution",
    "L-quality": "text_quality_scores",
    "L-lang-id": "lang_id_confusion",
    "L-fingerprints": "doc_fingerprints_winnow",
    "L-multimodal": "multimodal_jpeg_decode",
    # bpe / upsert / corpus_report / snapshot_timetravel_diff rotated
    # out round 10 (all stay full-sweep oracled; snapshots and corpus
    # stats keep dedicated pytest modules — test_snapshots.py,
    # test_streaming_upsert.py, test_corpus_stats_stream.py) to make
    # room for the round-8/9/10 flagships below: the driver certifies
    # the newest work.
    # r8/r9 flagships (hits, shapley, markov, pca-power, classifier
    # lift) rotated out round 11 after their driver-green r10 rows;
    # r10/r11 flagships (pagerank, gbt-curve, kneser-ney, wordpiece,
    # harmonic, itemitem-cf) rotated out round 12 after their
    # driver-green r11 rows — all stay full-sweep oracled with
    # dedicated pytest coverage. The two tree-model slots stay until
    # driver-green (oracle fetch-path defects fixed r11/r12).
    "flagship-dtree": "decision_tree_histogram_splits",
    "flagship-gbt": "gbt_stump_boosting",
    # r11 flagships (dbscan, mst, kmeans, dhash, optseg, t-closeness)
    # rotated out round 13 after their driver-green r12 rows — all stay
    # full-sweep oracled with dedicated pytest coverage. The r12
    # flagships below hold the slots for their driver certificate.
    "flagship-suffix-array": "suffix_array_ranks_docs",
    "flagship-ngram-spans": "repeated_ngram_spans_report",
    "flagship-span-powers": "repeated_span_powers_report",
    "flagship-spectral-cut": "spectral_bipartition_parts",
    "flagship-deepwalk": "deepwalk_skipgram_pairs",
    "flagship-audio-spectral": "multimodal_audio_spectral",
}

# Round 8 closed the last two rows-only window slots with integer-exact
# cross-engine twins (embedding_topk_ivfpq_exact,
# embedding_near_dup_pairs_crossengine) — every window entry now carries
# a SQL oracle. The float ANN siblings remain registered after the
# window, rows-checked + planted-truth-tested.
ALLOWED_ROWS_ONLY: set[str] = set()


def test_window_is_exactly_50():
    assert len(registry.CERTIFICATION_WINDOW) == 50
    assert len(set(registry.CERTIFICATION_WINDOW)) == 50


def test_window_leads_query_order():
    names = list(entrymod.queries())
    assert tuple(names[:50]) == registry.CERTIFICATION_WINDOW
    # and nothing is lost: the tail is the rest of the registry
    assert set(names) == set(registry.QUERIES)
    assert len(names) == len(registry.QUERIES)


def test_window_covers_every_section2_row():
    window = set(registry.CERTIFICATION_WINDOW)
    missing = {
        row: q for row, q in SECTION2_CERTIFIERS.items() if q not in window
    }
    assert not missing, f"§2 rows without a window certifier: {missing}"


def test_window_oracles_maximal():
    no_oracle = [
        n for n in registry.CERTIFICATION_WINDOW if n not in registry.ORACLES
    ]
    assert set(no_oracle) <= ALLOWED_ROWS_ONLY, (
        "window entries unexpectedly lack a SQL oracle: "
        f"{sorted(set(no_oracle) - ALLOWED_ROWS_ONLY)}"
    )


def test_oracle_order_matches_query_order():
    qnames = [n for n in entrymod.queries() if n in registry.ORACLES]
    assert list(entrymod.oracle_sql()) == qnames


def test_readme_registry_count_is_fresh():
    """The README's '(N named queries…)' figure must track the registry
    (advisor r9: it had drifted 315 vs 319). Update README.md's plans/
    line whenever a query is added."""
    import re
    from pathlib import Path

    text = Path(__file__).resolve().parent.parent.joinpath("README.md").read_text()
    m = re.search(r"\((\d+) named queries", text)
    assert m, "README.md lost its '(N named queries' marker"
    assert int(m.group(1)) == len(registry.QUERIES), (
        f"README says {m.group(1)} named queries; registry has "
        f"{len(registry.QUERIES)} — update README.md"
    )
