"""Physical-plan regression tests: the properties that make these
queries scale are asserted, not assumed — predicate pushdown reaching
the parquet scan, column pruning, dims broadcasting, top-k planning as
TakeOrderedAndProject, map-side partial aggregation, and single-shuffle
window/sessionization plans. A future edit that silently introduces an
extra shuffle or a full-column scan fails here, not at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    qs = entrymod.queries()

    def plan(name: str, mode: str = "simple") -> str:
        df = qs[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode)
        return buf.getvalue()

    return plan


def _shuffles(plan_text: str) -> int:
    return sum(
        plan_text.count(f"Exchange {kind}")
        for kind in ("hashpartitioning", "rangepartitioning", "SinglePartition")
    )


def test_q1_pushdown_and_pruning(plans):
    p = plans("tpch_q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in p  # filter reached the scan
    assert "l_comment" not in p  # column pruning: unused wide column never read
    assert "partial_sum" in p  # map-side combine before the shuffle


def test_star_join_broadcasts_dims(plans):
    p = plans("join_revenue_by_region")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_topk_avoids_global_sort(plans):
    assert "TakeOrderedAndProject" in plans("topk_orders_by_price")


def test_brute_force_topk_avoids_global_sort(plans):
    assert "TakeOrderedAndProject" in plans("embedding_topk_bruteforce")


def test_sessionize_single_shuffle(plans):
    # boundary-mark window, numbering window, and final group-by all ride
    # ONE hash exchange on user_id
    assert _shuffles(plans("sessionize_events")) == 1


def test_ranking_window_single_shuffle(plans):
    assert _shuffles(plans("window_top3_orders_per_customer")) == 1


def test_asof_join_shuffle_budget(plans):
    # union-sort-window as-of join: no pairwise join explosion. Two
    # exchanges total — the deterministic-ties dedup aggregate on
    # (custkey, orderdate), then ONE exchange on the join key carrying
    # both sides through the carry-forward window.
    p = plans("asof_join_events_orders")
    assert _shuffles(p) == 2
    assert "Join" not in p  # no join operator at all — union + window


def test_tumbling_window_partial_agg(plans):
    p = plans("tumbling_window_events")
    assert "partial_count" in p or "partial_sum" in p
    assert _shuffles(p) == 1


def test_range_join_broadcasts_tiny_dim(plans):
    p = plans("range_join_value_tiers")
    assert "BroadcastNestedLoopJoin" in p  # 3-row dim: never shuffle the fact


def test_global_quantile_literal_threshold(plans):
    # exact mode resolves the threshold up front (distributed exact
    # quantile) and embeds it as a literal: the flag pass is a plain
    # scan + single group-by shuffle, no join of any kind
    p = plans("sales_pipeline_monthly")
    assert "Join" not in p
    assert _shuffles(p) == 1  # monthly group-by only


def test_q10_broadcasts_nation_and_takeordered(plans):
    p = plans("tpch_q10_returned_items")
    assert "TakeOrderedAndProject" in p  # top-20, no global sort
    assert "BroadcastHashJoin" in p  # 25-row nation broadcast
    # both selective filters reached their scans
    assert "EqualTo(l_returnflag,R)" in p
    assert "GreaterThanOrEqual(o_orderdate" in p


def test_q18_aggregates_before_join(plans):
    p = plans("tpch_q18_large_volume_customers")
    # the HAVING-filtered lineitem aggregate must run below the joins,
    # with map-side partial sums
    assert "partial_sum" in p
    assert "CartesianProduct" not in p


def test_q4_exists_compiles_to_semi_join(plans):
    p = plans("tpch_q4_order_priority_exists")
    assert "LeftSemi" in p
    # lineitem-side filter pushed to the scan, not evaluated post-join
    assert "GreaterThanOrEqual(l_discount,0.06)" in p


def test_cdc_merge_is_single_join(plans):
    p = plans("cdc_merge_orders")
    assert "FullOuter" in p
    assert "CartesianProduct" not in p


def test_decontamination_broadcasts_benchmark_side(plans):
    p = plans("decontaminate_ngram_overlap")
    assert "BroadcastHashJoin" in p  # corpus side never shuffles for the join


def test_unpivot_no_shuffle(plans):
    p = plans("unpivot_part_measures")
    assert "Exchange" not in p


def test_window_trio_single_shuffle(plans):
    p = plans("window_first_last_cume_dist")
    # same partitioning+ordering → one Window exchange only
    assert p.count("Exchange hashpartitioning") == 1


def test_join_strategy_hints_respected(spark):
    """The hint surface: MERGE forces sort-merge (Exchange+Sort), while
    the same join unhinted broadcasts at this size — users tuning a
    100 TB join rely on hints overriding the size heuristics."""
    from etl_pipeline_orchestration_spark.sources.tables import load_table
    import io, contextlib

    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("simple")
        return buf.getvalue()

    hinted = orders.join(cust.hint("merge"), orders.o_custkey == cust.c_custkey)
    assert "SortMergeJoin" in plan_of(hinted)
    plain = orders.join(cust, orders.o_custkey == cust.c_custkey)
    assert "BroadcastHashJoin" in plan_of(plain)


def test_pre_aggregated_window_queries_window_tiny_frame(plans):
    """rolling/growth/ratio windows must sit ABOVE the aggregate in the
    plan (window over day/month/nation cardinality), never over the
    raw fact — the difference between sorting KBs and sorting TBs."""
    for q in ("rolling_7day_revenue", "monthly_revenue_growth"):
        p = plans(q)
        # the Window's child chain must contain the HashAggregate
        w_pos = p.index("Window")
        agg_pos = p.index("HashAggregate")
        assert agg_pos > w_pos, q  # explain prints top-down: agg below window


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Spark's runtime row-level filter must inject a bloom filter on
    the FACT side of a shuffle join against a selectively-filtered
    build side: at 100 TB this is the difference between shuffling the
    whole fact table and shuffling only rows that can possibly match.
    The rule is on by default in Spark 4; local test data sits outside
    the default creation/application size thresholds, so the test pins
    the behavior with thresholds adjusted (CLUSTER_PROFILE widens the
    creation-side threshold for the real deployment instead).
    """
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        od = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_totalprice") > 99000
        )
        j = li.join(od, li.l_orderkey == od.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "no runtime bloom filter on fact side"
        assert "bloom_filter_agg" in plan, "no bloom filter built from dim side"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_splits_skewed_partition(spark):
    """AQE's skew-join handling (on in session.py get_spark and pinned
    here) must actually split a skewed partition at runtime: the final
    adaptive plan marks the join SortMergeJoin(skew=true) with a skewed
    AQEShuffleRead. This is the automatic complement of the explicit
    operators/skew.py salting — at 100 TB most skew is handled by this
    rule; salting covers what AQE can't see. Local data sits far below
    the default skew thresholds, so the test lowers them (same pattern
    as the runtime bloom-filter test); CLUSTER_PROFILE carries the
    real-deployment values."""
    import pyspark.sql.functions as F

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # 80% of rows share one key; incompressible pad so the hot
        # shuffle partition's byte size actually exceeds the threshold
        left = spark.range(200_000).select(
            F.when(F.col("id") % 5 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(2_000).select(F.col("id").alias("k"), F.lit("y").alias("v"))
        j = left.join(right, "k")
        assert len(j.collect()) == 160_400  # join result correct despite split
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
        assert "skewed" in plan  # AQEShuffleRead shows the skewed read
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_corpus_report_scans_documents_once(spark):
    """The corpus-statistics layer's reason to exist: the composed
    seven-metric report must cost ONE pass over documents, not seven.
    ReusedExchange cannot provide this (Catalyst specializes each
    consumer's subplan below the gram-stats exchange — measured), so
    corpus_report persists the histogram; assert the collapse from
    Spark's own SQL metrics: total 'number of output rows' across all
    parquet scan nodes of the execution equals the documents row count
    exactly once."""
    from etl_pipeline_orchestration_spark.plans import registry

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()

    df = registry.QUERIES["corpus_report"](spark, sf)
    assert df.count() > 0

    store = spark._jsparkSession.sharedState().statusStore()
    execs = store.executionsList()
    last = execs.apply(execs.size() - 1)
    metrics = store.executionMetrics(last.executionId())
    g = store.planGraph(last.executionId())
    nodes = g.allNodes()
    scanned = 0
    for i in range(nodes.size()):
        node = nodes.apply(i)
        if "Scan" in node.name() and "parquet" in node.name().lower():
            ms = node.metrics()
            for j in range(ms.size()):
                m = ms.apply(j)
                if m.name() == "number of output rows":
                    opt = metrics.get(m.accumulatorId())
                    if not opt.isEmpty():
                        scanned += int(str(opt.get()).replace(",", ""))
    # == n_docs on a cold cache; 0 when a prior test already populated
    # the gram-stats cache (plan-equal persist is shared session-wide).
    # Either way, a 7-pass regression (7 * n_docs) fails loudly.
    assert scanned <= n_docs, (
        f"corpus_report scanned {scanned} parquet rows; expected at most "
        f"one documents pass ({n_docs})"
    )
