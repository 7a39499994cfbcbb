"""Every rows-only registry entry must carry a standing justification:
either a hash-certified integer-exact sibling in the registry, or a
planted-truth / property pytest that pins its semantics. This pins the
CURRENT mapping so (a) a new rows-only query cannot land without
adding its justification here, and (b) a renamed/removed sibling
breaks loudly instead of silently orphaning the weak check.

(The count ceiling lives in test_full_oracle_sweep.py; this is the
per-entry semantic version of that gate.)"""

from __future__ import annotations

# rows-only query -> (kind, anchor). kind "sibling" anchors must be
# registered oracled queries; kind "test" anchors are pytest files
# whose planted/property tests pin the operator's semantics.
JUSTIFICATIONS: dict[str, tuple[str, str]] = {
    "approx_distinct_sketch": ("test", "tests/test_sketches.py"),
    "approx_quantile_sketch": ("test", "tests/test_sketches.py"),
    "dedup_minhash_lsh_candidates": ("sibling", "dedup_minhash_crossengine"),
    "dedup_minhash_verified": ("sibling", "dedup_minhash_crossengine"),
    "dedup_simhash_pairs": ("sibling", "dedup_simhash_crossengine"),
    "embedding_topk_lsh": ("sibling", "embedding_topk_lsh_exact"),
    # embedding_topk_ivf hash-certified r13 (integer-exact IVF: the
    # ivfpq_exact machinery minus PQ; float ivf_topk operator keeps
    # its recall tests)
    "embedding_near_dup_pairs": (
        "sibling",
        "embedding_near_dup_pairs_crossengine",
    ),
    "embedding_pq_topk": ("sibling", "embedding_topk_ivfpq_exact"),
    "embedding_topk_ivfpq": ("sibling", "embedding_topk_ivfpq_exact"),
    "multimodal_embed_topk": ("sibling", "embedding_topk_bruteforce"),
    # embedding_kmeans_clusters hash-certified r11 (quantized Lloyd +
    # unrolled oracle); multimodal_dhash_neardup hash-certified r11
    # (generator-vs-decoder integer differential)
    # multimodal_audio_spectral hash-certified r12 (bin-aligned tones
    # make dom/centroid/rolloff closed-form; generator-vs-decoder)
    "dedup_incremental_candidates": ("test", "tests/test_dedup_similarity.py"),
    "embedding_outlier_iforest": ("test", "tests/test_iforest.py"),
    "unigram_vocab_pieces": ("test", "tests/test_unigram.py"),
    "unigram_tokenize_stats": ("test", "tests/test_unigram.py"),
}


def test_rows_only_set_matches_justifications():
    from etl_pipeline_orchestration_spark.plans import registry

    registry.load_all()
    rows_only = {n for n in registry.QUERIES if n not in registry.ORACLES}
    assert rows_only == set(JUSTIFICATIONS), (
        f"unjustified rows-only: {sorted(rows_only - set(JUSTIFICATIONS))};"
        f" stale entries: {sorted(set(JUSTIFICATIONS) - rows_only)}"
    )


def test_justification_anchors_exist():
    import os

    from etl_pipeline_orchestration_spark.plans import registry

    registry.load_all()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name, (kind, anchor) in JUSTIFICATIONS.items():
        if kind == "sibling":
            assert anchor in registry.ORACLES, (
                f"{name}: certified sibling {anchor} is not an oracled query"
            )
        else:
            assert os.path.exists(os.path.join(repo, anchor)), (
                f"{name}: justifying test file {anchor} missing"
            )
