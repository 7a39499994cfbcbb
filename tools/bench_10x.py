"""10× scale lane: per-family wall-clock at sf0.1 vs a 10×-sf0.1
synthetic corpus, with the fitted scaling exponent.

The per-round bench (bench.py) runs everything at sf0.1; a family whose
cost grows super-linearly (a lost map-side combine, an accidental
all-pairs join, a driver-side collect that grows with the corpus) can
look fine there and explode at 100 TB. This lane generates the same
partition-parallel 10× corpus as tests/test_scale_smoke.py (planted
near-dup families, hash-stream embeddings — pure Spark expressions, no
driver rows) and times the heavy document/embedding families at both
scales. Committed as BENCH_10X.json so a blowup is caught by DIFF at
review time, not anecdote:

  exponent = log(t_10x / t_1x) / log(10)

≈1 is linear, <1 is overhead-dominated (normal at these sizes), and
anything drifting toward 2 is a scaling regression. Wall-clock on this
box swings with co-tenant load (see bench.py); the calibration workload
is timed at both ends and its ratio recorded so a "regression" that is
really a slow machine is visible in the same file.

Run: python tools/bench_10x.py  (~4-6 min; writes BENCH_10X.json)
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = 50_000
N_VECS = 20_000
N_ORDERS = 1_500_000  # 10x the sf0.1 orders row count
N_LINEITEM = 6_000_000  # 10x sf0.1 lineitem; same 4 lines/order shape
N_PARTS = 200_000
N_SUPPS = 10_000
N_EVENTS = 1_000_000  # 10x sf0.1 events; same 5-type domain
N_USERS = 15_000  # keeps ~67 events/user like the testdata
REPLICAS = 10

# Family representative -> registered query (documents/embeddings, plus
# a minimal synthetic orders table for the streaming-upsert family).
FAMILIES = {
    "dedup_lsh": "dedup_minhash_verified",
    "dedup_exact_simjoin": "dedup_jaccard_exact_pairs",
    "dedup_substring": "dedup_substring_spans",
    "dedup_clusters": "dedup_clusters_cc_distributed",
    "corpus_stats": "corpus_report",
    "fingerprints": "doc_fingerprints_winnow",
    "ann_ivf": "embedding_topk_ivf",
    "bpe_trainer": "bpe_merge_sequence",
    "bpe_encode": "bpe_encode_tokens",
    "substring_removal": "dedup_substring_removal_report",
    "streaming_upsert": "upsert_timetravel_diff",
    "multimodal_jpeg": "multimodal_jpeg_decode",
    # k scales with the corpus (_semdedup_k): 8 clusters at sf0.1,
    # 78 at 10x — the exponent measures the constant-occupancy
    # discipline, not a fixed-k quadratic.
    "semdedup": "semdedup_prune",
    "pii_scrub": "pii_redaction_report",
    # graph family (VERDICT r6 item 5): pagerank was the #3 bench query
    # with no measured exponent; both run on the synthetic 10x lineitem
    # (same 4-lines/order, uniform part/supplier keys as the testdata,
    # so edge density per order matches and the pair-generation +
    # per-iteration shuffles dominate, exactly as at sf0.1).
    "graph_pagerank": "graph_pagerank_part_supplier",
    # personalized pagerank: same per-iteration shape as pagerank with
    # a sparse-support inner join — certifies the frontier-bounded
    # early iterations don't degrade into dense passes at 10x.
    "graph_ppr": "graph_ppr_part_neighborhood",
    "graph_triangles": "triangle_count_copurchase",
    # exact-N mixture: certifies selection stays histogram-thresholded
    # (stratum-bounded sort), never a full per-language sort, as the
    # corpus grows.
    "stratified_exact_n": "stratified_sample_exact_n",
    # batch hard-negative mining: one int64 matmul per Arrow batch
    # against a closure anchor matrix — certifies anchor fan-out cost
    # stays row-linear (anchors scale with the corpus sample rule).
    "hard_negatives_batch": "hard_negative_mining_batch",
    # classifier training: fixed 6 iterations x one scan of the integer
    # feature relation — the exponent certifies iteration cost is
    # corpus-linear and driver traffic stays at 6 scalars.
    "classifier_train": "quality_classifier_train",
    # heavy hitters: the exponent certifies phase 1 stays one narrow
    # Arrow pass (O(capacity) memory) and phase 2's shuffle stays at
    # candidate-set size, not vocabulary size.
    "heavy_hitters": "heavy_hitters_topk",
    # contiguous ids: certifies the distributed row_number never
    # degrades into a global single-partition sort as rows grow.
    "contiguous_ids": "global_contiguous_ids_docs",
    # hard negatives: brute-force probe fan-out — linear in corpus,
    # constant in probes.
    "hard_negatives": "hard_negative_mining",
    # Naive Bayes: one token-fold scan + a 640-row broadcast model —
    # the exponent certifies the model join lands on the (doc, bucket)
    # combine, never on raw tokens.
    "naive_bayes": "naive_bayes_lang_confusion",
    # label propagation: 4 rounds x one node-keyed shuffle over the
    # co-purchase neighbor-label histogram — certifies round cost is
    # edge-linear on the 10x lineitem graph.
    "lpa_communities": "label_propagation_communities",
    # MMR rerank: certifies the candidate-pool cut keeps pairwise work
    # C^2-bounded while the rels fan-out scales linearly in vectors.
    "mmr_rerank": "mmr_diverse_rerank",
    # KMV sketch: certifies the bottom-k window input is the per-source
    # DISTINCT hash set (combiner-shrunk) and the word-fold keeps char
    # work token-linear.
    "kmv_sketch": "kmv_distinct_by_source",
    # link prediction: certifies the top-degree hub cut keeps the
    # common-neighbor join bounded by sum_x cnt_hub(x)^2 while the edge
    # relation grows linearly with orders.
    "link_prediction": "link_prediction_jaccard",
    # perceptual hash: decode+dHash is one Arrow map (linear); the
    # banded self-join must stay at bucket-collision size, never
    # all-pairs, as the image corpus grows.
    "dhash_neardup": "multimodal_dhash_neardup",
    # count-min: certifies the sketch build stays at one map-side
    # combined token shuffle + a vocab-sized hash fold, with the cell
    # grid fixed at d*w regardless of corpus size.
    "count_min": "count_min_heavy_audit",
    # Bloom join pruning: certifies the bitset build is dim-linear and
    # the fact-side probe is a pure narrow map — the whole point is
    # that the pre-shuffle filter must NOT itself scale super-linearly.
    "bloom_prune": "bloom_join_prune_audit",
    # Pareto skyline: certifies the band-parallel local-skyline pass
    # keeps the exact dominance join candidate-bounded as parts grow.
    "pareto_skyline": "pareto_skyline_parts",
    # BFS: certifies per-level frontier joins stay edge-linear across
    # the whole traversal (each vertex settled once).
    "bfs_hops": "bfs_hop_distance_copurchase",
    # unigram tokenizer: certifies training stays histogram-space (the
    # corpus scanned once into (word, c)) and encode is a broadcast
    # join, with the Viterbi cost bounded by DISTINCT words. The model
    # memo-cache is cleared before every timed rep (PRE_HOOKS) so the
    # measurement includes training, not a cache hit.
    "unigram_tokenizer": "unigram_tokenize_stats",
    # Bradley-Terry: certifies the duel pipeline stays order-local (the
    # per-order brand self-join is bounded by brands-per-order) and the
    # model-sized collect stays at the 300-row brand-pair matrix as the
    # corpus grows.
    "bradley_terry": "bradley_terry_brand_prefs",
    # Binary-segmentation changepoints: certifies the fact table
    # collapses to the day aggregate BEFORE any level pass (cost is the
    # one orders scan; the 3 window levels run at day cardinality).
    "changepoint_binseg": "revenue_changepoints_binseg",
    # Bounded Bellman-Ford: certifies the per-round frontier join stays
    # edge-linear and the min-merge node-bounded as the graph grows.
    "sssp_weighted": "sssp_weighted_copurchase",
    # k-center greedy coreset: O(N·dim) per round over the embeddings
    # corpus — certifies each round stays ONE narrow map against a
    # literal center + a top-1 aggregate (no vector shuffle) as the
    # corpus grows; the per-round collect is one row.
    "kcenter_coreset": "kcenter_coreset_embeddings",
    # TextRank: certifies the corpus-scale half (token scan + one
    # (a,b) co-occurrence aggregate) is corpus-linear while the driver
    # fit stays vocabulary-sized (and capped — see textrank_ratings).
    "textrank_cooc": "textrank_keywords",
    # HITS: certifies each of the 8 quantized rounds stays edge-linear
    # (two edge-keyed join+aggregates) with the normalizing max as a
    # broadcast, on the same 10x lineitem as the pagerank family.
    "graph_hits": "hits_supplier_part",
    # PCA power iteration: certifies the corpus-scale work is ONE
    # Arrow partial-Gram pass (4096-row shuffles) while the 64x64
    # iteration stays driver-side.
    "pca_power": "embedding_pca_power_exact",
    # Markov attribution: certifies journey assembly (one user-keyed
    # window) + transition counting stay corpus-linear while the
    # 48-step absorption iteration stays on the channel-domain model.
    "markov_attribution": "markov_attribution_events",
    # Shapley attribution: same journey window + a (u, j) bit_or
    # aggregate; everything after runs at 2^n_channels cardinality.
    "shapley_attribution": "shapley_attribution_events",
    # item-item CF: certifies candidate pairs stay Σ basket² (the
    # order-keyed self-join) while item-count joins and the per-item
    # top-3 window run at pair/item cardinality — never an item
    # cross-product — as orders grow 10x.
    "itemitem_cf": "itemitem_cf_topk",
    # gradient-boosted stumps: certifies each boosting round stays ONE
    # map-side-combined histogram aggregate over the fact join (the
    # model rides as driver literals), so cost is rounds x scan.
    "gbt_boosting": "gbt_stump_boosting",
    # WordPiece trainer: certifies rounds stay histogram-space like the
    # BPE family — the corpus is scanned once into (word, c); the
    # per-round pair + symbol-unigram aggregates and score joins are
    # vocabulary-bounded.
    "wordpiece_trainer": "wordpiece_merge_sequence",
    # k-source harmonic centrality: certifies the composite-frontier
    # BFS stays one edge-keyed shuffle per LEVEL with each (src, node)
    # settled once — O(k·E) total, on the same 10x lineitem graph as
    # bfs_hops.
    "graph_harmonic": "harmonic_centrality_ksource",
    # exact eps-join DBSCAN: sqrt(n) pivots balance the pivot pass
    # against within-cell matmuls at O(dim * n^1.5); the lane certifies
    # the halo actually prunes (eps << typical distances) instead of
    # degenerating to m x all-pairs
    "dbscan": "embedding_dbscan_clusters",
    # Boruvka forest on the 10x co-purchase graph: certifies the
    # edge-linear rounds + component-map joins (and the driver-gate
    # Kruskal finish) hold as pair counts grow
    "graph_mst": "mst_copurchase_parts",
    # prefix doubling: log(doc cap) rounds of shifted self-join +
    # bucketed dense rank — the exponent certifies the rounds stay
    # position-linear (the pair relation never exceeds positions).
    "suffix_array": "suffix_array_ranks_docs",
    # spectral power iteration / walks: per-round edge joins — the
    # pagerank lane shape on the same 10x co-purchase graph.
    "graph_spectral": "spectral_bipartition_parts",
    "deepwalk_pairs": "deepwalk_skipgram_pairs",
    # r13: the sharded doubling run (shard explode + the suffix_array
    # shape at 4 rounds) and the train/eval contamination spans (3
    # rounds + a group-bounded membership join + per-doc islands) —
    # both run their OWN doubling loops (no memo), so the exponents
    # measure the full operators.
    "suffix_sharded": "repeated_ngram_spans_sharded",
    "contamination_spans": "contamination_suffix_spans",
    # DELIBERATELY EXCLUDED (not a silent cap): entity_resolution_parts.
    # Its entity domain is the p_name VOCABULARY, which does not scale
    # with corpus size — a 10x part table would scale the name domain
    # itself, making every levenshtein block quadratically larger, which
    # measures a scenario the operator's scale model (blocking bounded
    # by vocabulary) explicitly excludes.
}


def gen_big(spark, d: str) -> None:
    from pyspark.sql import functions as F

    vocab = ", ".join(f"'w{j:02d}'" for j in range(80))
    fam_words = (
        f"transform(sequence(1, 40),"
        f" i -> elt(1 + pmod(xxhash64(id div {REPLICAS}, i), 80), {vocab}))"
    )
    base_text = F.expr(f"concat_ws(' ', {fam_words})")
    text = F.when(F.col("id") % REPLICAS == 0, base_text).otherwise(
        F.concat(base_text, F.lit(" rep"), (F.col("id") % REPLICAS).cast("string"))
    )
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        F.expr("elt(1 + id % 5, 'en', 'de', 'fr', 'es', 'it')").alias("lang"),
        F.expr("elt(1 + id % 4, 'web', 'books', 'wiki', 'code')").alias("source"),
    )
    docs = docs.withColumn("n_chars", F.length("text").cast("bigint"))
    docs.repartition(16).write.parquet(os.path.join(d, "documents.parquet"))
    emb = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), j ->"
            " cast(pmod(xxhash64(id, j), 1000) / 500.0 - 1.0 AS float))"
        ).alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label"),
    )
    emb.repartition(8).write.parquet(os.path.join(d, "embeddings.parquet"))
    # Minimal orders table (only the columns the streaming-upsert
    # family touches) at 10x the sf0.1 orders row count.
    orders = spark.range(N_ORDERS).select(
        F.col("id").alias("o_orderkey"),
        (
            F.pmod(F.xxhash64(F.col("id")), F.lit(100000)).cast("double")
            / 100.0
            + 1.0
        ).alias("o_totalprice"),
        # priority + date columns for the bloom-prune family: ~1/35 of
        # orders land in the ('1-URGENT', 1995) dim, like the testdata.
        F.expr(
            "elt(1 + pmod(xxhash64(id, 7), 5), '1-URGENT', '2-HIGH',"
            " '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')"
        ).alias("o_orderpriority"),
        F.expr(
            "cast(date_add(date'1992-01-01',"
            " cast(pmod(xxhash64(id, 8), 2557) as int)) as timestamp)"
        ).alias("o_orderdate"),
    )
    orders.repartition(8).write.parquet(os.path.join(d, "orders.parquet"))
    # Minimal part table (only the skyline columns) at 10x sf0.1 parts.
    part = spark.range(N_PARTS).select(
        F.col("id").alias("p_partkey"),
        (
            F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100000)).cast("double")
            / 100.0
            + 1.0
        ).alias("p_retailprice"),
        F.pmod(F.xxhash64("id", F.lit(4)), F.lit(50)).cast("int").alias("p_size"),
        # brand domain for the bradley_terry family (25 players, like
        # the testdata's p_brand)
        F.concat(
            F.lit("Brand#"),
            F.pmod(F.xxhash64("id", F.lit(6)), F.lit(25)).cast("string"),
        ).alias("p_brand"),
    )
    part.repartition(4).write.parquet(os.path.join(d, "part.parquet"))
    # Minimal lineitem (only the graph-family columns) at 10x the sf0.1
    # row count: 4 lines per order, part/supplier keys uniform like the
    # testdata (measured: sf0.1 co-purchase edge counts match the
    # uniform-collision expectation).
    lineitem = spark.range(N_LINEITEM).select(
        (F.col("id") / 4).cast("bigint").alias("l_orderkey"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(N_PARTS)).alias("l_partkey"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(N_SUPPS)).alias("l_suppkey"),
        # integer-valued quantity for the bradley_terry duel family
        (1 + F.pmod(F.xxhash64("id", F.lit(5)), F.lit(50)))
        .cast("double")
        .alias("l_quantity"),
    )
    lineitem.repartition(16).write.parquet(os.path.join(d, "lineitem.parquet"))
    # Events at 10x the sf0.1 row count (same 5-type domain, same
    # ~67 events/user density, one-month span) for the attribution
    # families — journey windows are user-keyed, so user count scales
    # with the corpus like the testdata's.
    events = spark.range(N_EVENTS).select(
        F.col("id").alias("event_id"),
        F.expr(
            "timestampadd(SECOND, cast(pmod(xxhash64(id, 11), 2592000)"
            " as int), timestamp'2024-01-01 00:00:00')"
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(12)), F.lit(N_USERS)).alias("user_id"),
        F.expr(
            "elt(1 + pmod(xxhash64(id, 13), 5), 'view', 'click',"
            " 'signup', 'error', 'purchase')"
        ).alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    events.repartition(8).write.parquet(os.path.join(d, "events.parquet"))


def _calib(spark) -> float:
    t0 = time.perf_counter()
    (
        spark.range(30_000_000)
        .selectExpr("id % 997 AS k", "id AS v")
        .groupBy("k")
        .agg({"v": "sum", "*": "count"})
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.perf_counter() - t0


def _clear_unigram_cache() -> None:
    from etl_pipeline_orchestration_spark.plans import corpus_ops

    corpus_ops._unigram_cache.clear()


def _clear_persistent_state(spark) -> None:
    """Unpersist every cached/localCheckpointed RDD left behind by the
    previous family. Dozens of families run in ONE session and many
    queries localCheckpoint node-sized state; without this the block
    manager accumulates the whole lane's checkpoints and later families
    (pagerank measured 0.52-0.61 in-lane vs 0.34 isolated, r9) pay the
    storage-memory pressure of their predecessors. Nothing is reused
    across families — each timed call rebuilds its own plan."""
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    for rdd in list(jsc.getPersistentRDDs().values()):
        rdd.unpersist()
    # Unpersisting a localCheckpointed frame deletes its blocks while
    # the session memos still hold references — a later family reading
    # a memo would hit dead checkpoints. Clear the dicts WITH the
    # blocks so memo readers recompute instead of crashing.
    from etl_pipeline_orchestration_spark.plans import corpus_ops

    corpus_ops._SPAN_MEMO.clear()
    corpus_ops._SUFFIX_MEMO.clear()


# Per-family pre-rep hooks: invalidate memo caches so min-of-reps times
# the full operator, never a cache hit.
PRE_HOOKS = {
    "unigram_tokenizer": _clear_unigram_cache,
}


def _warm_dir(spark, d: str) -> None:
    """One throwaway JVM-side scan of every parquet input in ``d`` so
    page cache + codegen are warm before any family is timed. Without
    this the FIRST family to touch the 10x corpus pays the cold-read
    tail and its exponent reads high (pagerank drifted 0.34->0.53
    across r9/r10 from exactly this; VERDICT r10 ask #4)."""
    for name in sorted(os.listdir(d)):
        if name.endswith(".parquet"):
            spark.read.parquet(os.path.join(d, name)).write.format(
                "noop"
            ).mode("overwrite").save()


def _time(spark, fn, sf_dir: str, reps: int, pre_hook=None) -> float:
    best = None
    for _ in range(reps):
        if pre_hook is not None:
            pre_hook()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> int:
    from etl_pipeline_orchestration_spark.session import get_spark
    from etl_pipeline_orchestration_spark.plans import registry

    registry.load_all()
    sf1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    spark = get_spark("bench10x")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    big = tempfile.mkdtemp(prefix="bench10x_")
    try:
        gen_big(spark, big)
        _warm_dir(spark, sf1)
        _warm_dir(spark, big)
        calib_start = round(_calib(spark), 3)
        out: dict = {}
        # De-bias the session tail (VERDICT r12 item 7): families late
        # in the lane read high from accumulated session state (the
        # graph cluster measured 0.51-0.58 in-lane vs 0.23-0.34
        # isolated), so the lane ORDER rotates deterministically per
        # round — the rotation offset defaults to the committed round
        # count (BENCH_r*.json files), overridable via
        # SPARK_GRAFT_10X_ROTATE. No RNG: reruns of the same round
        # reproduce the same order.
        fams = list(FAMILIES.items())
        rot = os.environ.get("SPARK_GRAFT_10X_ROTATE")
        if rot is None:
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            rot = len(
                [n for n in os.listdir(repo)
                 if n.startswith("BENCH_r") and n.endswith(".json")]
            )
        offset = (int(rot) * 7) % len(fams)  # coprime stride: tails move
        fams = fams[offset:] + fams[:offset]
        for fam, qname in fams:
            _clear_persistent_state(spark)
            fn = registry.QUERIES[qname]
            hook = PRE_HOOKS.get(fam)
            # SYMMETRIC protocol (r11 advice): identical rep count and a
            # just-before-timing re-warm on BOTH sides. The run-start
            # warm scan gets evicted by earlier families (measured:
            # pagerank's 10x wall swung 9.2/12.3/17.9 s across runs
            # with STABLE calibration until the re-warm landed); giving
            # only the 10x side the re-warm + an extra rep one-sidedly
            # biased t_10x down and flattened the reported exponent.
            _warm_dir(spark, sf1)
            t1 = _time(spark, fn, sf1, reps + 1, hook)
            _warm_dir(spark, big)
            t10 = _time(spark, fn, big, reps + 1, hook)
            out[fam] = {
                "query": qname,
                "t_1x_sec": round(t1, 3),
                "t_10x_sec": round(t10, 3),
                "exponent": round(math.log(t10 / t1) / math.log(10), 3),
            }
        calib_end = round(_calib(spark), 3)
        payload = {
            "metric": "scale_10x_families",
            "sf_1x": sf1,
            "n_docs_10x": N_DOCS,
            "n_vecs_10x": N_VECS,
            # reps_effective is what each timing block actually runs
            # (ADVICE r12: the symmetric protocol takes min over
            # reps + 1 executions per side; "reps" alone misled).
            "reps": reps,
            "reps_effective": reps + 1,
            "family_order_rotation": offset,
            "protocol": "symmetric: re-warm each corpus immediately "
            "before its timing block; min of reps+1 on both sides; "
            "family order rotated per round to de-bias the session "
            "tail",
            "calibration_sec_start": calib_start,
            "calibration_sec_end": calib_end,
            "families": out,
            "note": "exponent ~1 linear, <1 overhead-dominated, >>1 regression",
        }
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_10X.json",
        )
        with open(path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
            f.write("\n")
        print(json.dumps({k: v["exponent"] for k, v in out.items()}))
        return 0
    finally:
        shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
