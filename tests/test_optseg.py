"""Optimal k-segmentation (Bellman DP): the Spark result must equal an
independent python DP replay over the same integer-frozen objective,
and be provably optimal — no alternative boundary set may score a
lower total quantized cost."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.plans.registry import QUERIES, load_all
from etl_pipeline_orchestration_spark.plans.ml_analytics import (
    _OPTSEG_K,
    daily_orders_aggregate,
)
from etl_pipeline_orchestration_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def series(spark):
    daily = daily_orders_aggregate(load_table(spark, SF, "orders"))
    weekly = (
        daily.groupBy(F.date_trunc("week", "day").cast("date").alias("day"))
        .agg(F.sum("rev_cents").cast("bigint").alias("rev"))
        .orderBy("day")
        .collect()
    )
    days = [r["day"] for r in weekly]
    # dense weekly spine, zero-filled (matches the query's gapfill)
    out, vals = [], dict(zip(days, (r["rev"] for r in weekly)))
    d = days[0]
    import datetime

    while d <= days[-1]:
        out.append((d, int(vals.get(d, 0))))
        d = d + datetime.timedelta(days=7)
    return out


def _cost(pref_s, pref_ss, a, b):
    s = pref_s[b] - pref_s[a]
    ss = pref_ss[b] - pref_ss[a]
    return ss - (s * s) // (b - a)


def _dp_reference(vals, k):
    n = len(vals)
    ps = [0] * (n + 1)
    pss = [0] * (n + 1)
    for i, v in enumerate(vals, 1):
        ps[i] = ps[i - 1] + v
        pss[i] = pss[i - 1] + v * v
    INF = float("inf")
    dp = [[INF] * (n + 1) for _ in range(k + 1)]
    arg = [[None] * (n + 1) for _ in range(k + 1)]
    dp[0][0] = 0
    for m in range(1, k + 1):
        for i in range(m, n + 1):
            best = None
            for j in range(m - 1, i):
                if dp[m - 1][j] == INF:
                    continue
                t = dp[m - 1][j] + _cost(ps, pss, j, i)
                cand = (t, j)
                if best is None or cand < best:
                    best = cand
            if best is not None:
                dp[m][i], arg[m][i] = best
    bounds = [n]
    cur = n
    for m in range(k, 0, -1):
        cur = arg[m][cur]
        bounds.append(cur)
    bounds.reverse()
    return bounds, dp[k][n], ps, pss


def test_spark_dp_matches_python_replay(spark, series):
    load_all()
    vals = [v for _, v in series]
    days = [d for d, _ in series]
    bounds, best_total, ps, pss = _dp_reference(vals, _OPTSEG_K)
    rows = sorted(
        QUERIES["optimal_segmentation_weekly_revenue"](spark, SF).collect(),
        key=lambda r: r["seg"],
    )
    assert len(rows) == _OPTSEG_K
    got_total = 0
    for m, r in enumerate(rows, 1):
        lo, hi = bounds[m - 1], bounds[m]
        assert r["start_day"] == days[lo]
        assert r["end_day"] == days[hi - 1]
        assert int(r["n_days"]) == hi - lo
        assert int(r["sum_cents"]) == ps[hi] - ps[lo]
        got_total += _cost(ps, pss, lo, hi)
    assert got_total == best_total


def test_dp_reference_is_optimal_on_small_series():
    """Exhaustive check on a small series: the DP total equals the
    minimum over ALL boundary placements."""
    vals = [5, 5, 50, 50, 50, 7, 7, 100, 100, 3]
    k = 3
    bounds, best, ps, pss = _dp_reference(vals, k)
    n = len(vals)
    brute = min(
        sum(
            _cost(ps, pss, a, b)
            for a, b in zip((0,) + cut, cut + (n,))
        )
        for cut in combinations(range(1, n), k - 1)
    )
    assert best == brute
