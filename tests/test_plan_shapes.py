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
