"""Semantics tests for plans/ml_analytics.py — beyond the oracle-equality
sweep, these pin the MEANING of each operator: planted FK orphans are
counted, the closed-form CUSUM equals the textbook sequential recursion,
the unrolled EWMA equals a direct weighted replay, grouped OLS matches
numpy's least squares, and the Naive-Bayes classifier actually recovers
planted class vocabularies (the sf corpus has no real lang signal, so
oracle equality alone would never catch a broken argmax)."""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from etl_pipeline_orchestration_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def _q(name):
    return registry.QUERIES[name]


# ---------------------------------------------------------------------------
# referential integrity
# ---------------------------------------------------------------------------


def test_fk_audit_counts_planted_orphans(spark, tmp_path):
    import duckdb

    for t in ("lineitem", "orders", "part", "supplier", "customer", "nation", "region"):
        shutil.copy(f"{SF}/{t}.parquet", tmp_path / f"{t}.parquet")
    con = duckdb.connect()
    # 3 orphaned l_orderkey values + 2 NULLs, planted deterministically.
    con.execute(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN l_orderkey % 1000 = 7 AND l_linenumber = 1
                 THEN -999 ELSE l_orderkey END AS l_orderkey
          ) FROM read_parquet('{SF}/lineitem.parquet')
        ) TO '{tmp_path}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    planted = con.execute(
        f"""SELECT count(*) FROM read_parquet('{SF}/lineitem.parquet')
            WHERE l_orderkey % 1000 = 7 AND l_linenumber = 1"""
    ).fetchone()[0]
    assert planted > 0
    rows = {
        r.fk_name: r
        for r in _q("referential_integrity_audit")(spark, str(tmp_path)).collect()
    }
    li = rows["lineitem.l_orderkey->orders"]
    assert li.orphan_rows == planted
    assert li.null_keys == 0
    clean = rows["nation.n_regionkey->region"]
    assert clean.orphan_rows == 0 and clean.null_keys == 0


# ---------------------------------------------------------------------------
# CUSUM == textbook sequential recursion
# ---------------------------------------------------------------------------


def test_cusum_closed_form_equals_sequential_recursion(spark):
    rows = sorted(
        _q("cusum_changepoints_daily")(spark, SF).collect(), key=lambda r: r.day
    )
    k = rows[0].kref
    s_pos = s_neg = 0
    for r in rows:
        s_pos = max(0, s_pos + (r.n_orders - k))
        s_neg = max(0, s_neg - (r.n_orders - k))
        assert r.cusum_pos == s_pos, r.day
        assert r.cusum_neg == s_neg, r.day
        assert r.alarm == (s_pos > 5 * k or s_neg > 5 * k)
    # non-vacuous: volume drifts enough somewhere that one side moves
    assert any(r.cusum_pos > 0 for r in rows) or any(r.cusum_neg > 0 for r in rows)


# ---------------------------------------------------------------------------
# EWMA == direct weighted replay
# ---------------------------------------------------------------------------


def test_ewma_equals_direct_weighted_replay(spark):
    rows = sorted(_q("ewma_daily_revenue")(spark, SF).collect(), key=lambda r: r.day)
    revs = [r.rev_cents for r in rows]
    for t, r in enumerate(rows):
        num = sum(revs[t - i] * (2 ** (13 - i)) for i in range(14) if t - i >= 0)
        den = sum(2 ** (13 - i) for i in range(14) if t - i >= 0)
        assert r.ewma_cents == num / den, r.day
    # the calendar was gap-filled: spine is dense
    assert len(rows) == (rows[-1].day - rows[0].day).days + 1


# ---------------------------------------------------------------------------
# grouped OLS == numpy least squares
# ---------------------------------------------------------------------------


def test_grouped_ols_matches_numpy(spark):
    import duckdb

    got = {
        r.l_returnflag: r
        for r in _q("grouped_ols_discount_elasticity")(spark, SF).collect()
    }
    con = duckdb.connect()
    raw = con.execute(
        f"""SELECT l_returnflag,
                   CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT),
                   CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM read_parquet('{SF}/lineitem.parquet')"""
    ).fetchall()
    by_flag: dict[str, list[tuple[int, int]]] = {}
    for f, x, y in raw:
        by_flag.setdefault(f, []).append((x, y))
    assert set(by_flag) == set(got)
    for f, xy in by_flag.items():
        x = np.array([p[0] for p in xy], dtype=float)
        y = np.array([p[1] for p in xy], dtype=float)
        slope, intercept = np.polyfit(x, y, 1)
        assert got[f].n == len(xy)
        assert got[f].slope_cents_per_pct == pytest.approx(slope, rel=1e-9)
        assert got[f].intercept_cents == pytest.approx(intercept, rel=1e-9)
        r = np.corrcoef(x, y)[0, 1]
        assert got[f].r2 == pytest.approx(r * r, rel=1e-9)


# ---------------------------------------------------------------------------
# Naive Bayes recovers planted vocabularies
# ---------------------------------------------------------------------------


def test_naive_bayes_recovers_planted_vocab(spark, tmp_path):
    import duckdb

    vocab = {
        "aa": ["alpha", "anchor", "apple", "arrow"],
        "bb": ["bravo", "bridge", "basket", "button"],
        "cc": ["cargo", "candle", "copper", "circle"],
    }
    rows = []
    for li, (lang, words) in enumerate(sorted(vocab.items())):
        for j in range(40):
            doc_id = li * 40 + j
            text = " ".join(words[(j + k) % 4] for k in range(6))
            rows.append((doc_id, text, lang, "src0", len(text)))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", rows)
    con.execute(f"COPY d TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)")
    got = _q("naive_bayes_lang_confusion")(spark, str(tmp_path)).collect()
    by = {(r.lang_true, r.lang_pred): r.n_docs for r in got}
    # disjoint vocabularies -> perfect diagonal; 20% of 40 docs per class
    assert by == {("aa", "aa"): 8, ("bb", "bb"): 8, ("cc", "cc"): 8}


def test_naive_bayes_partitions_whole_test_split(spark):
    got = _q("naive_bayes_lang_confusion")(spark, SF).collect()
    import duckdb

    n_test = duckdb.connect().execute(
        f"""SELECT count(*) FROM read_parquet('{SF}/documents.parquet')
            WHERE doc_id % 10 >= 8"""
    ).fetchone()[0]
    assert sum(r.n_docs for r in got) == n_test
    langs = {"de", "en", "es", "fr", "zh"}
    assert {r.lang_true for r in got} <= langs
    assert {r.lang_pred for r in got} <= langs


# ---------------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------------


def test_label_propagation_separates_planted_cliques(spark):
    """Two 5-cliques joined by a single bridge edge: LPA must keep them
    as two communities labeled by each clique's min node — exactly the
    separation connected components CANNOT give (CC would merge them
    through the bridge)."""
    from etl_pipeline_orchestration_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    cliq_a = [(i, j) for i in range(5) for j in range(5) if i < j]
    cliq_b = [(i, j) for i in range(10, 15) for j in range(10, 15) if i < j]
    bridge = [(4, 10)]
    edges = spark.createDataFrame(cliq_a + cliq_b + bridge, "a long, b long")
    labels = {r.node: r.label for r in label_propagation(edges, rounds=4).collect()}
    assert {labels[i] for i in range(5)} == {0}
    assert {labels[i] for i in range(10, 15)} == {10}
    # the contrast that motivates LPA: CC merges everything via the bridge
    cc = connected_components(edges.selectExpr("a AS src", "b AS dst"))
    assert len({r["component"] for r in cc.collect()}) == 1


def test_label_propagation_is_deterministic(spark):
    from etl_pipeline_orchestration_spark.operators.graph import label_propagation

    # a tie-heavy graph: a 4-cycle (bipartite, classic LPA oscillator)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "a long, b long"
    )
    a = sorted((r.node, r.label) for r in label_propagation(edges, 4).collect())
    b = sorted((r.node, r.label) for r in label_propagation(edges, 4).collect())
    assert a == b


# ---------------------------------------------------------------------------
# chi-square / Welch vs scipy-free reference formulas
# ---------------------------------------------------------------------------


def test_chi_square_matches_direct_computation(spark):
    import duckdb

    rows = _q("chi_square_lang_source")(spark, SF).collect()
    obs = duckdb.connect().execute(
        f"""SELECT lang, source, count(*) FROM
            read_parquet('{SF}/documents.parquet') GROUP BY 1, 2"""
    ).fetchall()
    o = {(l, s): c for l, s, c in obs}
    langs = sorted({l for l, _, _ in obs})
    srcs = sorted({s for _, s, _ in obs})
    n = sum(o.values())
    rt = {l: sum(c for (ll, _), c in o.items() if ll == l) for l in langs}
    ct = {s: sum(c for (_, ss), c in o.items() if ss == s) for s in srcs}
    chi2 = 0.0
    for l in langs:
        for s in srcs:
            e = rt[l] * ct[s] / n
            chi2 += (o.get((l, s), 0) - e) ** 2 / e
    got = rows[0]
    assert got.dof == (len(langs) - 1) * (len(srcs) - 1)
    assert got.chi2_nano / 1e9 == pytest.approx(chi2, rel=1e-6)
    assert len(rows) == len(langs) * len(srcs)
    cell = {(r.lang, r.source): r for r in rows}
    for (l, s), r in cell.items():
        e = rt[l] * ct[s] / n
        assert r.expected == pytest.approx(e, rel=1e-12)
        assert r.std_residual == pytest.approx(
            (o.get((l, s), 0) - e) / e**0.5, rel=1e-12
        )


def test_welch_t_matches_direct_computation(spark):
    import duckdb

    got = _q("welch_ttest_event_value")(spark, SF).collect()[0]
    vals = duckdb.connect().execute(
        f"""SELECT event_type, CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                                    AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')
            WHERE event_type IN ('purchase', 'view')"""
    ).fetchall()
    p = [x for t, x in vals if t == "purchase"]
    v = [x for t, x in vals if t == "view"]

    def var(xs):
        n = len(xs)
        return (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))

    md = sum(p) / len(p) - sum(v) / len(v)
    t = md / (var(p) / len(p) + var(v) / len(v)) ** 0.5
    assert got.n_purchase == len(p) and got.n_view == len(v)
    assert got.mean_diff_micro == pytest.approx(md, rel=1e-9)
    assert got.t_stat == pytest.approx(t, rel=1e-9)


def test_mann_whitney_matches_direct_ranking(spark):
    import duckdb

    got = _q("mann_whitney_u_event_value")(spark, SF).collect()[0]
    vals = duckdb.connect().execute(
        f"""SELECT event_type, CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                                    AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')
            WHERE event_type IN ('purchase', 'view')"""
    ).fetchall()
    allv = sorted(x for _, x in vals)
    # direct midranks (1-based, ties averaged) — the textbook definition
    from collections import Counter

    cnt = Counter(allv)
    start = {}
    pos = 1
    for v in sorted(cnt):
        start[v] = pos
        pos += cnt[v]
    midrank = {v: start[v] + (cnt[v] - 1) / 2 for v in cnt}
    r1 = sum(midrank[x] for t, x in vals if t == "purchase")
    n1 = sum(1 for t, _ in vals if t == "purchase")
    n2 = sum(1 for t, _ in vals if t == "view")
    assert got.n1 == n1 and got.n2 == n2
    assert got.r1_x2 == int(2 * r1)
    assert got.u1 == pytest.approx(r1 - n1 * (n1 + 1) / 2, rel=1e-12)


def test_ks_matches_direct_ecdf_scan(spark):
    import duckdb

    got = _q("ks_test_event_value")(spark, SF).collect()[0]
    vals = duckdb.connect().execute(
        f"""SELECT event_type, CAST(CAST(value AS DECIMAL(18,6)) * 1000000
                                    AS BIGINT)
            FROM read_parquet('{SF}/events.parquet')
            WHERE event_type IN ('purchase', 'view')"""
    ).fetchall()
    p = sorted(x for t, x in vals if t == "purchase")
    v = sorted(x for t, x in vals if t == "view")
    import bisect

    best = (-1, None)
    for x in sorted(set(p) | set(v)):
        gap = abs(
            bisect.bisect_right(p, x) * len(v) - bisect.bisect_right(v, x) * len(p)
        )
        if gap > best[0]:
            best = (gap, x)
    assert got.d_at_value_micro == best[1]
    assert got.ks_d == pytest.approx(best[0] / (len(p) * len(v)), rel=1e-12)


def test_poisson_bootstrap_weights_and_ci_semantics(spark):
    rows = _q("poisson_bootstrap_revenue_ci")(spark, SF).collect()
    assert len(rows) == 32
    import duckdb

    n, true_mean = duckdb.connect().execute(
        f"""SELECT count(*), avg(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                      AS BIGINT))
            FROM read_parquet('{SF}/orders.parquet')"""
    ).fetchone()
    means = sorted(r.mean_cents for r in rows)
    # CI = [2nd, 31st] order statistics, identical on every row
    assert {(r.ci_lo, r.ci_hi) for r in rows} == {(means[1], means[-2])}
    assert means[1] < means[-2]
    # Poisson(1) resample sizes concentrate near n (sd ~ sqrt(n))
    for r in rows:
        assert abs(r.n_resampled - n) < 6 * n**0.5
    # the replica spread brackets the truth and scales like sqrt(n):
    # a broken hash (constant weights) would collapse the spread to 0
    assert means[0] < true_mean < means[-1]
    spread = means[-1] - means[0]
    assert spread > 0


def test_poisson_bootstrap_weight_distribution_matches_pmf(spark):
    """The hash-derived integer weights must reproduce the Poisson(1)
    pmf on the 1e-6 grid — chi-square-style bound on the 0/1/2 bins."""
    import math

    from etl_pipeline_orchestration_spark.plans.ml_analytics import _BOOT_CDF

    # direct replay of the weight derivation for one replica
    import duckdb

    ws = duckdb.connect().execute(
        f"""WITH d AS (SELECT o_orderkey FROM
              read_parquet('{SF}/orders.parquet')),
            u AS (SELECT ((o_orderkey % 2147483648) * 2654435761)
                         % 4294967296 % 1000000 AS u FROM d)
            SELECT (SELECT count(*) FROM unnest([{", ".join(map(str, _BOOT_CDF))}])
                    AS t(th) WHERE t.th <= u.u) AS w, count(*)
            FROM u GROUP BY 1"""
    ).fetchall()
    total = sum(c for _, c in ws)
    freq = {w: c / total for w, c in ws}
    for k in (0, 1, 2):
        expect = math.exp(-1) / math.factorial(k)
        assert abs(freq.get(k, 0.0) - expect) < 0.05


def test_kaplan_meier_structure_and_direct_replay(spark):
    """Structural KM invariants plus a direct-Python replay of the
    estimator from the raw durations."""
    import math

    rows = sorted(
        _q("kaplan_meier_reorder_gaps")(spark, SF).collect(),
        key=lambda r: r.gap_days,
    )
    import duckdb

    durs = duckdb.connect().execute(
        f"""WITH d AS (SELECT DISTINCT o_custkey, o_orderdate
                       FROM read_parquet('{SF}/orders.parquet')),
            mx AS (SELECT max(o_orderdate) AS m
                   FROM read_parquet('{SF}/orders.parquet')),
            seq AS (SELECT o_custkey, o_orderdate,
                           lead(o_orderdate) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate) AS nxt FROM d)
            SELECT date_diff('day', o_orderdate,
                             COALESCE(nxt, (SELECT m FROM mx))) AS t,
                   (nxt IS NOT NULL)::INT AS ev FROM seq"""
    ).fetchall()
    n_customers = duckdb.connect().execute(
        f"SELECT count(DISTINCT o_custkey) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()[0]
    # structural invariants
    assert rows[0].n_risk == len(durs)
    assert sum(r.d_events + r.c_censored for r in rows) == len(durs)
    assert sum(r.c_censored for r in rows) == n_customers
    for a, b in zip(rows, rows[1:]):
        assert a.n_risk > b.n_risk or (
            a.n_risk - (a.d_events + a.c_censored) == b.n_risk
        )
        assert a.log_surv_micro >= b.log_surv_micro  # survival non-increasing
    # direct replay: risk sets, events, survival
    from collections import Counter

    dcnt = Counter(t for t, ev in durs if ev == 1)
    ccnt = Counter(t for t, ev in durs if ev == 0)
    times = sorted(set(dcnt) | set(ccnt))
    assert [r.gap_days for r in rows] == times
    at_risk = len(durs)
    log_s = 0.0
    dead = False
    for r, t in zip(rows, times):
        assert r.d_events == dcnt.get(t, 0)
        assert r.c_censored == ccnt.get(t, 0)
        assert r.n_risk == at_risk
        if r.d_events and r.n_risk == r.d_events:
            dead = True  # risk set fully dies: S = 0, sentinel -1e12
        elif r.d_events:
            log_s += math.log((r.n_risk - r.d_events) / r.n_risk)
        if dead:
            assert r.log_surv_micro <= -1_000_000_000_000 + abs(log_s) * 1e6
        else:
            # frozen-micro cumulative sum tracks the float log-survival
            # to within half a micro-nat per event term
            assert abs(r.log_surv_micro / 1e6 - log_s) < 1e-6 * len(times)
        at_risk -= r.d_events + r.c_censored
    assert dead == (rows[-1].log_surv_micro <= -999_000_000_000)
    # the curve is a genuine survival function: S(0..) within (0, 1]
    assert all(r.log_surv_micro <= 0 for r in rows)
    assert math.exp(rows[-1].log_surv_micro / 1e6) < 0.5


def test_acf_matches_numpy_replay_and_bounds(spark):
    import numpy as np

    rows = {r.lag: r for r in _q("acf_daily_revenue")(spark, SF).collect()}
    assert set(rows) == set(range(1, 15))
    import duckdb

    series = duckdb.connect().execute(
        f"""WITH daily AS (
              SELECT o_orderdate AS d,
                     sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                              AS BIGINT)) AS r
              FROM read_parquet('{SF}/orders.parquet') GROUP BY 1),
            cal AS (SELECT unnest(generate_series((SELECT min(d) FROM daily),
                          (SELECT max(d) FROM daily), INTERVAL 1 DAY))::DATE AS d)
            SELECT COALESCE(daily.r, 0)
            FROM cal LEFT JOIN daily ON daily.d = cal.d ORDER BY cal.d"""
    ).fetchall()
    x = np.array([int(v[0]) for v in series], dtype=np.float64)
    c = x - x.mean()
    den = float((c * c).sum())
    for lag, r in rows.items():
        expect = float((c[:-lag] * c[lag:]).sum()) / den
        assert r.n_pairs == len(x) - lag
        assert r.acf == pytest.approx(expect, rel=1e-9, abs=1e-12)
        assert -1.0 <= r.acf <= 1.0


def test_recursive_cte_chain_covers_orders_exactly_once(spark):
    """Spark WITH RECURSIVE semantics: the chain walk visits every
    order exactly once, terminal positions equal per-customer order
    counts, and the final cumulative spend equals the customer total."""
    from etl_pipeline_orchestration_spark.plans.registry import QUERIES

    rows = QUERIES["recursive_cte_order_chain"](spark, SF).collect()
    import duckdb

    con = duckdb.connect()
    n_orders, = con.execute(
        f"SELECT count(*) FROM read_parquet('{SF}/orders.parquet')"
    ).fetchone()
    assert len(rows) == n_orders
    assert len({r.o_orderkey for r in rows}) == n_orders
    by_cust = {}
    for r in rows:
        cur = by_cust.get(r.o_custkey)
        if cur is None or r.pos > cur.pos:
            by_cust[r.o_custkey] = r
    totals = dict(
        con.execute(
            f"""SELECT o_custkey,
                       sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                                AS BIGINT))
                FROM read_parquet('{SF}/orders.parquet') GROUP BY 1"""
        ).fetchall()
    )
    counts = dict(
        con.execute(
            f"SELECT o_custkey, count(*) FROM read_parquet('{SF}/orders.parquet') GROUP BY 1"
        ).fetchall()
    )
    for ck, last in by_cust.items():
        assert last.pos == counts[ck]
        assert last.cum_cents == int(totals[ck])


def test_link_prediction_jaccard_planted_graph(spark, tmp_path):
    """Hand-built co-purchase graph with known neighbor sets: parts 1
    and 2 are never co-purchased directly but share both neighbors
    (the substitute-detection case direct co-occurrence misses)."""
    import duckdb

    # orders: {101: [1,3], 102: [1,4], 103: [2,3], 104: [2,4], 105: [3,4]}
    rows = [(101, 1), (101, 3), (102, 1), (102, 4), (103, 2), (103, 3),
            (104, 2), (104, 4), (105, 3), (105, 4)]
    con = duckdb.connect()
    con.execute("CREATE TABLE li (l_orderkey BIGINT, l_partkey BIGINT)")
    con.executemany("INSERT INTO li VALUES (?,?)", rows)
    con.execute(
        f"""COPY (SELECT l_orderkey, l_partkey, 1::BIGINT AS l_suppkey,
                         1::BIGINT AS l_linenumber, 1.0 AS l_quantity,
                         1.0 AS l_extendedprice, 0.0 AS l_discount,
                         0.0 AS l_tax, 'N' AS l_returnflag,
                         'O' AS l_linestatus, DATE '1996-01-01' AS l_shipdate
                  FROM li)
            TO '{tmp_path}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    got = {
        (r.pa, r.pb): r
        for r in _q("link_prediction_jaccard")(spark, str(tmp_path)).collect()
    }
    # neighbor sets: N(1)={3,4}, N(2)={3,4}, N(3)={1,2,4}, N(4)={1,2,3}
    expect = {
        (1, 2): (2, 2, 2, 1.0),          # identical neighborhoods
        (3, 4): (3, 3, 2, 0.5),          # {1,2,4} vs {1,2,3}
        (1, 3): (2, 3, 1, 0.25),         # {3,4} vs {1,2,4} -> {4}
        (1, 4): (2, 3, 1, 0.25),
        (2, 3): (2, 3, 1, 0.25),
        (2, 4): (2, 3, 1, 0.25),
    }
    assert set(got) == set(expect)
    for pair, (da, db, common, jac) in expect.items():
        r = got[pair]
        assert (r.deg_a, r.deg_b, r.common) == (da, db, common)
        assert r.jaccard == pytest.approx(jac, rel=1e-15)
    # ranking: (1,2) is rank 1, (3,4) rank 2, then the four 0.25 ties
    # ordered by (pa, pb)
    order = sorted(got.values(), key=lambda r: r.rk)
    assert [(r.pa, r.pb) for r in order] == [
        (1, 2), (3, 4), (1, 3), (1, 4), (2, 3), (2, 4)
    ]


def test_rank_correlation_matches_numpy_replay(spark):
    """Spearman via numpy midranks + Pearson; Kendall via a brute
    O(n^2) numpy pair count — both independent of the grid method."""
    import duckdb
    import numpy as np

    r = _q("rank_correlation_discount_quantity")(spark, SF).collect()[0]
    xy = duckdb.connect().execute(
        f"""SELECT CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT),
                   CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
            FROM read_parquet('{SF}/lineitem.parquet')"""
    ).fetchall()
    x = np.array([p[0] for p in xy], dtype=np.int64)
    y = np.array([p[1] for p in xy], dtype=np.int64)
    assert r.n == len(x)

    def midranks(v):
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), dtype=np.float64)
        sv = v[order]
        i = 0
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2.0
            i = j
        return ranks

    rx, ry = midranks(x), midranks(y)
    rho = np.corrcoef(rx, ry)[0, 1]
    assert r.spearman_rho == pytest.approx(float(rho), rel=1e-9)
    # Kendall tau-b, brute-forced in chunks
    conc = disc = 0
    tx = ty = 0
    n = len(x)
    for i in range(0, n, 500):
        xi = x[i : i + 500, None]
        yi = y[i : i + 500, None]
        dx = np.sign(xi - x[None, :])
        dy = np.sign(yi - y[None, :])
        s = dx * dy
        conc += int((s > 0).sum())
        disc += int((s < 0).sum())
        tx += int(((dx == 0) & (dy != 0)).sum())
        ty += int(((dy == 0) & (dx != 0)).sum())
    conc //= 2  # each unordered pair counted twice (self pairs give 0)
    disc //= 2
    assert r.cd_gap == pytest.approx(float(conc - disc), rel=1e-12)
    from math import sqrt

    vals_x, cnt_x = np.unique(x, return_counts=True)
    vals_y, cnt_y = np.unique(y, return_counts=True)
    n0 = n * (n - 1) / 2
    tiex = float((cnt_x * (cnt_x - 1) // 2).sum())
    tiey = float((cnt_y * (cnt_y - 1) // 2).sum())
    tau = (conc - disc) / (sqrt(n0 - tiex) * sqrt(n0 - tiey))
    assert r.kendall_tau_b == pytest.approx(tau, rel=1e-9)
    assert -1.0 <= r.kendall_tau_b <= 1.0 and -1.0 <= r.spearman_rho <= 1.0


def test_join_key_discovery_recovers_fk_graph(spark):
    """Containment must recover the known FK edges (child fully
    contained in parent) and reject a known non-edge."""
    rows = {
        (r.col_a, r.col_b): r
        for r in _q("join_key_discovery")(spark, SF).collect()
    }
    assert len(rows) == 13 * 12
    fk_edges = [
        ("orders.o_custkey", "customer.c_custkey"),
        ("lineitem.l_orderkey", "orders.o_orderkey"),
        ("lineitem.l_partkey", "part.p_partkey"),
        ("lineitem.l_suppkey", "supplier.s_suppkey"),
        ("customer.c_nationkey", "nation.n_nationkey"),
        ("supplier.s_nationkey", "nation.n_nationkey"),
        ("nation.n_regionkey", "region.r_regionkey"),
    ]
    for child, parent in fk_edges:
        r = rows[(child, parent)]
        assert r.is_subset and r.containment == 1.0, (child, parent)
    # non-edge: order keys are not part keys
    r = rows[("lineitem.l_orderkey", "part.p_partkey")]
    assert not r.is_subset
    # intersection is symmetric even though containment is directional
    for (ca, cb), r in rows.items():
        assert r.common == rows[(cb, ca)].common
    for r in rows.values():
        assert 0.0 <= r.containment <= 1.0
        assert r.common <= min(r.distinct_a, r.distinct_b)


def test_sql_udf_inlines_to_exact_integer_arithmetic(spark):
    """The SQL-UDF path equals an independent DataFrame-API replay of
    the same integer-cents arithmetic."""
    from pyspark.sql import functions as F
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    got = {
        (r.l_returnflag, r.l_linestatus): r
        for r in _q("sql_udf_pricing_summary")(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
        "bigint"
    )
    dpct = (F.col("l_discount").cast("decimal(18,2)") * 100).cast("bigint")
    ref = {
        (r.l_returnflag, r.l_linestatus): r
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents).alias("gross"),
            F.sum(cents - F.expr(
                "cast(cast(l_extendedprice as decimal(18,2)) * 100 as bigint)"
                " * cast(cast(l_discount as decimal(18,2)) * 100 as bigint)"
                " div 100"
            )).alias("net"),
        )
        .collect()
    }
    assert set(got) == set(ref)
    for k, r in got.items():
        assert r.gross_cents == ref[k].gross
        assert r.net_cents == ref[k].net
        assert r.net_cents <= r.gross_cents


def test_aggregate_combo_matches_python_reduce(spark):
    import duckdb
    from functools import reduce
    import statistics

    rows = {
        r.o_orderpriority: r
        for r in _q("sql_aggregate_surface_combo")(spark, SF).collect()
    }
    raw = duckdb.connect().execute(
        f"""SELECT o_orderpriority, o_custkey,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
                   o_orderstatus
            FROM read_parquet('{SF}/orders.parquet')"""
    ).fetchall()
    by: dict = {}
    for p, ck, cents, st in raw:
        by.setdefault(p, []).append((ck, cents, st))
    assert set(rows) == set(by)
    for p, items in by.items():
        r = rows[p]
        cks = [i[0] for i in items]
        cents = [i[1] for i in items]
        assert r.n == len(items)
        assert r.band == reduce(lambda a, b: a & b, cks)
        assert r.bor == reduce(lambda a, b: a | b, cks)
        assert r.bxor == reduce(lambda a, b: a ^ b, cks)
        assert r.all_above_1k == all(c > 100000 for c in cents)
        assert r.any_above_400k == any(c > 40000000 for c in cents)
        assert r.n_large == sum(1 for c in cents if c > 15000000)
        assert r.median_cents == pytest.approx(
            float(statistics.median(cents)), rel=1e-15
        )
        assert r.statuses == ",".join(sorted({i[2] for i in items}))


def test_seasonal_decomposition_identity_and_structure(spark):
    """Additive identity y = trend + seasonal + residual per day;
    trend equals the centered 7-day mean; the detrended day-of-week
    means match a direct replay."""
    rows = sorted(
        _q("seasonal_decompose_weekly")(spark, SF).collect(),
        key=lambda r: r.day,
    )
    assert len(rows) > 100
    # contiguous interior days (edges excluded)
    assert (rows[-1].day - rows[0].day).days == len(rows) - 1
    series = {r.day: r.rev_cents for r in rows}
    for r in rows:
        # additive identity (pure float identity of the emitted columns)
        assert r.rev_cents == pytest.approx(
            r.trend_x7 / 7 + r.seasonal_cents + r.residual_cents, abs=1e-6
        )
        assert 1 <= r.dow <= 7
    # direct replay of trend for interior days present in the output
    import datetime

    for r in rows[3:-3:97]:
        window = [
            series.get(r.day + datetime.timedelta(days=o))
            for o in range(-3, 4)
        ]
        if all(v is not None for v in window):
            assert r.trend_x7 == sum(window)
    # seasonal replay: per-dow mean of (7y - trend_x7)/7
    from collections import defaultdict

    acc = defaultdict(list)
    for r in rows:
        acc[r.dow].append(7 * r.rev_cents - r.trend_x7)
    for r in rows:
        vals = acc[r.dow]
        assert r.seasonal_cents == pytest.approx(
            sum(vals) / len(vals) / 7, rel=1e-12
        )


# ---------------------------------------------------------------------------
# Brown double exponential smoothing
# ---------------------------------------------------------------------------


def test_des_recovers_planted_linear_trend(spark, tmp_path):
    """Plant a perfectly linear daily revenue series (one order per
    day, price 100+7i dollars) and assert Brown's smoothing recovers
    level == y_t and trend ~= slope after ramp-up — the property that
    distinguishes trend-aware forecasting from the flat EWMA, which
    provably lags a ramp (its forecast error equals the trend-scaled
    lag the second pass measures)."""
    import datetime

    from pyspark.sql import functions as F
    from etl_pipeline_orchestration_spark.plans import ml_analytics as ml

    rows = [
        (
            i,
            i,
            "O",
            float(100 + 7 * i),
            datetime.datetime(1995, 1, 1) + datetime.timedelta(days=i),
            "1-URGENT",
        )
        for i in range(60)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    sf = str(tmp_path / "sf_lin")
    df.write.parquet(f"{sf}/orders.parquet")
    out = ml.double_exp_smoothing_forecast(spark, sf).orderBy("day").collect()
    assert len(out) == 60
    last = out[-1]
    y_last = (100 + 7 * 59) * 100  # cents
    slope = 700.0  # cents/day
    assert abs(last.level - y_last) < 0.01 * y_last
    assert abs(last.trend - slope) < 0.01 * slope
    assert abs(last.forecast_next - (y_last + slope)) < 0.01 * y_last
    # the flat EWMA lags the ramp by ~trend; level corrects that lag
    assert last.s1 < y_last - 0.5 * slope


# ---------------------------------------------------------------------------
# Theil–Sen robust slope
# ---------------------------------------------------------------------------


def test_theil_sen_robust_to_outlier_and_matches_numpy(spark, tmp_path):
    """Plant a clean linear daily series with ONE wildly corrupted day:
    Theil–Sen must recover the true slope (median of pairwise slopes
    shrugs off a single outlier), and on the clean series it must equal
    an independent numpy replay of the lower-median-of-pairs."""
    import datetime

    def mk(rows, name):
        df = spark.createDataFrame(
            rows,
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )
        sf = str(tmp_path / name)
        df.write.parquet(f"{sf}/orders.parquet")
        return sf

    base = datetime.datetime(1995, 1, 1)
    clean = [
        (i, i, "O", float(100 + 3 * i), base + datetime.timedelta(days=i), "1-URGENT")
        for i in range(41)
    ]
    r_clean = registry.QUERIES["theil_sen_daily_revenue"](
        spark, mk(clean, "sf_ts_clean")
    ).collect()[0]
    # numpy replay: lower median of all pairwise slopes, in cents
    ys = np.array([100 + 3 * i for i in range(41)]) * 100
    slopes = sorted(
        (ys[j] - ys[i]) / (j - i)
        for i in range(41)
        for j in range(i + 1, 41)
    )
    want = slopes[(len(slopes) + 1) // 2 - 1]
    assert r_clean.sen_slope_cents_per_day == want == 300.0

    dirty = [
        (k, c, s, (1e7 if k == 20 else p), d, pr)
        for k, c, s, p, d, pr in clean
    ]
    r_dirty = registry.QUERIES["theil_sen_daily_revenue"](
        spark, mk(dirty, "sf_ts_dirty")
    ).collect()[0]
    assert r_dirty.sen_slope_cents_per_day == 300.0  # outlier shrugged off


# ---------------------------------------------------------------------------
# Markov attribution
# ---------------------------------------------------------------------------


def test_markov_attribution_closed_form(spark, tmp_path):
    """Planted journeys with hand-computable removal effects:
    u1: view->CONV; u2: click->CONV; u3: click->NULL.
    START splits 1/3 view, 2/3 click; P(conv|view)=1, P(conv|click)=1/2;
    base = 1/3 + 2/3 * 1/2 = 2/3; removing EITHER channel drops it to
    1/3 -> equal effects (1/2 each), 50/50 shares. Also pins journey
    cutting: an event after a purchase starts a NEW journey."""
    import datetime

    from etl_pipeline_orchestration_spark.operators import attribution

    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, u, typ, s):
        return (eid, t0 + datetime.timedelta(seconds=s), u, typ, 0.0, "{}")

    rows = [
        ev(1, 1, "view", 0), ev(2, 1, "purchase", 1),
        ev(3, 2, "click", 0), ev(4, 2, "purchase", 1),
        ev(5, 3, "click", 0),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    counts = [
        (r.src, r.dst, r.n)
        for r in attribution.journey_transitions(events).collect()
    ]
    base = attribution.absorption_probability(counts)
    assert abs(base - 2 / 3) < 1e-12
    eff = {c: (e, s) for c, e, s in attribution.removal_effects(counts)}
    assert abs(eff["view"][0] - 0.5) < 1e-12
    assert abs(eff["click"][0] - 0.5) < 1e-12
    assert abs(eff["view"][1] - 0.5) < 1e-12

    # journey cutting: u1 converts twice via view; the post-purchase
    # event starts a new journey (START->view again), so START->view
    # has count 2 and view->CONV count 2
    rows2 = [
        ev(1, 1, "view", 0), ev(2, 1, "purchase", 1),
        ev(3, 1, "view", 2), ev(4, 1, "purchase", 3),
    ]
    ev2 = spark.createDataFrame(
        rows2,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    c2 = {
        (r.src, r.dst): r.n
        for r in attribution.journey_transitions(ev2).collect()
    }
    from etl_pipeline_orchestration_spark.operators.attribution import (
        CONV,
        START,
    )

    assert c2 == {(START, "view"): 2, ("view", CONV): 2}
    assert abs(attribution.absorption_probability(
        [(s, d, n) for (s, d), n in c2.items()]
    ) - 1.0) < 1e-12


def test_markov_attribution_registry_sane(spark):
    out = {
        r.channel: r
        for r in registry.QUERIES["markov_attribution_events"](
            spark, SF
        ).collect()
    }
    # purchase is the absorbing state, never a credited channel
    assert "purchase" not in out
    assert set(out) == {"click", "error", "signup", "view"}
    shares = sum(r.share_micro for r in out.values())
    # truncating integer shares: sum <= 1e6, within one quantum each
    assert 1_000_000 - 4 <= shares <= 1_000_000
    assert all(r.base_q > 0 for r in out.values())


def test_markov_quantized_iteration_matches_solve(spark):
    """The certification form (48-step quantized power iteration) must
    agree with the closed-form absorption solve — both the base
    conversion rate and every removal effect — to well under the
    quantization the docstring claims (~1e-5)."""
    from etl_pipeline_orchestration_spark.operators import attribution
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    events = load_table(spark, SF, "events")
    counts = [
        (r.src, r.dst, r.n)
        for r in attribution.journey_transitions(events).collect()
    ]
    base = attribution.absorption_probability(counts)
    exact = {c: e * base for c, e, _ in attribution.removal_effects(counts)}
    quant = attribution.removal_effects_quantized(counts)
    assert quant, "no channels attributed"
    for c, removal_q, _, base_q in quant:
        assert abs(base_q / 1e12 - base) < 1e-4
        assert abs(removal_q / 1e12 - exact[c]) < 1e-4


# ---------------------------------------------------------------------------
# conformal prediction
# ---------------------------------------------------------------------------


def test_conformal_coverage_guarantee(spark):
    """Split-conformal marginal coverage: the fraction of test docs
    whose true class lands in the prediction set must sit at/above
    1 - alpha = 0.9 (up to finite-sample noise — the guarantee is
    >= 1-alpha in expectation; 0.84 is ~3 sigma below at n=100).
    Also pins the partition law (set types tile the test split) and
    that prediction sets are not vacuous (some singleton sets)."""
    rows = registry.QUERIES["quality_classifier_conformal"](
        spark, SF
    ).collect()
    n = sum(r.n_docs for r in rows)
    cov = sum(r.n_covered for r in rows)
    assert n == 100  # the %5==0 test split at sf0.001
    assert cov / n >= 0.84
    types = {r.set_type for r in rows}
    assert types <= {"both", "only_pos", "only_neg", "empty"}
    singletons = sum(
        r.n_docs for r in rows if r.set_type in ("only_pos", "only_neg")
    )
    assert singletons > 0  # informative, not all-"both"
    for r in rows:
        if r.set_type == "empty":
            assert r.n_covered == 0
        assert 0 <= r.n_covered <= r.n_docs


def test_mondrian_conformal_per_group_coverage(spark):
    """Group-conditional coverage: EVERY language's own test rows are
    covered at >= ~0.8 (finite-sample slack below the 0.9 target at
    per-group n); groups partition the test split; per-group qhat is
    a real calibration value (selected, not interpolated)."""
    rows = registry.QUERIES["quality_classifier_conformal_mondrian"](
        spark, SF
    ).collect()
    assert len(rows) >= 3  # several languages present
    assert sum(r.n_test for r in rows) == 100  # tiles the %5==0 split
    for r in rows:
        assert r.n_cal > 0 and r.n_test > 0
        assert r.n_covered / r.n_test >= 0.8, r.lang
        assert 0 <= r.n_both <= r.n_test


def test_trunc_division_agrees_cross_engine_on_negatives(spark):
    """The quantized-ratio rule (q_ratio in ab_cuped_adjusted) divides
    covariance numerators that CAN be negative. Spark `div` truncates
    toward zero; this pins that DuckDB's integer `//` does too (it
    floors only for FLOAT operands), so a negative pre/post covariance
    cannot diverge by one quantum between the engines."""
    import duckdb

    cases = [(-7, 2), (7, -2), (-7, -2), (7, 2), (-1, 3), (-6, 3)]
    got_spark = [
        spark.sql(
            f"SELECT cast({a} as decimal(38,0)) div cast({b} as decimal(38,0))"
        ).collect()[0][0]
        for a, b in cases
    ]
    got_duck = [
        duckdb.sql(
            f"SELECT CAST({a} AS HUGEINT) // CAST({b} AS HUGEINT)"
        ).fetchone()[0]
        for a, b in cases
    ]
    trunc = [int(a / b) for a, b in cases]
    assert [int(x) for x in got_spark] == trunc
    assert [int(x) for x in got_duck] == trunc


def test_shapley_attribution_efficiency_and_brute_force(spark):
    """Shapley axioms on the real relation: (1) efficiency — the scaled
    values sum EXACTLY to n!·(v(N) − v(∅)); (2) the registry query
    equals a brute-force driver Shapley over the same coalition
    counts."""
    import math

    from pyspark.sql import functions as F

    from etl_pipeline_orchestration_spark.operators.attribution import (
        journey_channel_conversions,
    )
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    events = load_table(spark, SF, "events")
    cs = {
        r.cset_mask: r.conv_n
        for r in journey_channel_conversions(events).collect()
    }
    chans = sorted(
        r[0]
        for r in events.filter(F.col("event_type") != "purchase")
        .select("event_type")
        .distinct()
        .collect()
    )
    n = len(chans)

    def v(S):
        return sum(c for m, c in cs.items() if (m & S) == m)

    ref = {}
    for ci, ch in enumerate(chans):
        b = 1 << ci
        tot = 0
        for S in range(2**n):
            if S & b:
                continue
            s = bin(S).count("1")
            tot += (
                math.factorial(s)
                * math.factorial(n - 1 - s)
                * (v(S | b) - v(S))
            )
        ref[ch] = tot
    out = {
        r.channel: r.shapley_x_factn
        for r in registry.QUERIES["shapley_attribution_events"](
            spark, SF
        ).collect()
    }
    assert out == ref
    assert sum(out.values()) == math.factorial(n) * (
        v(2**n - 1) - v(0)
    )


def test_pca_power_rayleigh_matches_numpy_lambda1(spark):
    """The quantized power iteration's Rayleigh quotient must sit
    within a few percent of numpy's λ₁ of the same integer Gram matrix
    (the eigenvalue converges quadratically even while the direction is
    still turning on near-isotropic synthetic embeddings; ~1% at
    sf0.01's 500 vectors, ~2% at sf0.001's 100)."""
    import numpy as np

    from etl_pipeline_orchestration_spark.sources.tables import load_table

    rows = registry.QUERIES["embedding_pca_power_exact"](spark, SF).collect()
    assert len(rows) == 64
    rq = rows[0].rayleigh_q
    assert all(r.rayleigh_q == rq for r in rows)
    emb = load_table(spark, SF, "embeddings").select("embedding").collect()

    def halfup(v):
        import math

        return (
            int(math.floor(v * 1048576.0 + 0.5))
            if v >= 0
            else -int(math.floor(-v * 1048576.0 + 0.5))
        )

    X = np.array(
        [[halfup(float(v)) for v in r[0]] for r in emb], dtype=np.float64
    )
    lam1 = np.linalg.eigvalsh(X.T @ X)[-1]
    lam1_unit = lam1 / (len(X) * float(1 << 40))
    assert abs(rq / 1e6 - lam1_unit) / lam1_unit < 0.05
    # the iterate's Rayleigh quotient can never exceed λ₁
    assert rq / 1e6 <= lam1_unit * (1 + 1e-9)


def test_did_estimate_matches_cell_means(spark):
    """DiD identity on the quantized outputs: the estimate equals
    (post_B − pre_B) − (post_A − pre_A) up to the 1e-3 quantization of
    the per-arm difference mean (md is quantized directly, not derived
    from the quantized mx/my)."""
    r = registry.QUERIES["ab_diff_in_differences"](spark, SF).collect()[0]
    cell_did = (r.post_mean_b - r.pre_mean_b) - (
        r.post_mean_a - r.pre_mean_a
    )
    assert abs(r.did_estimate - cell_did) <= 2e-3 + 1e-9
    assert r.did_se > 0
    assert abs(r.t_stat - r.did_estimate / r.did_se) < 1e-12


def test_hits_mutual_reinforcement_on_planted_graph(spark, tmp_path):
    """Planted supply graph: parts p1-p3 are shipped by MANY suppliers
    (authoritative); supplier 100 ships all three (a hub), supplier
    200 ships only the obscure p9. HITS must rank hub 100 over 200 and
    authority p1 over p9 — and the hub score must come from the
    authority of its parts, not raw degree: supplier 300 ships three
    OBSCURE parts (same degree as 100) and must still rank below it."""
    rows = []
    line = 0

    def ship(s, p):
        nonlocal line
        line += 1
        rows.append((line, p, s, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", None))

    for p in (1, 2, 3):
        for s in range(10, 20):  # ten background suppliers each
            ship(s, p)
    for p in (1, 2, 3):
        ship(100, p)  # hub over authoritative parts
    ship(200, 9)  # lone obscure part
    for p in (91, 92, 93):
        ship(300, p)  # same degree as 100, obscure parts
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE l (l_orderkey BIGINT, l_partkey BIGINT,"
        " l_suppkey BIGINT, l_linenumber INT, l_quantity DOUBLE,"
        " l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE,"
        " l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP)"
    )
    con.executemany("INSERT INTO l VALUES (?,?,?,?,?,?,?,?,?,?,?)", rows)
    con.execute(f"COPY l TO '{tmp_path}/lineitem.parquet' (FORMAT PARQUET)")
    out = {
        (r.kind, r.node): r.score_q
        for r in registry.QUERIES["hits_supplier_part"](
            spark, str(tmp_path)
        ).collect()
    }
    assert out[("hub", 100)] > out[("hub", 200)]
    assert out[("hub", 100)] > out[("hub", 300)]  # authority-weighted, not degree
    assert out[("auth", 1)] > out[("auth", 9)]


def test_lift_deciles_identities(spark):
    """Structural identities of the gains curve: decile 10 covers the
    whole split (gain == 1e6, lift == 1e6 exactly — cum_pos == P and
    cum_n == N cancel), cumulative gain is nondecreasing in decile,
    each decile covers at least d·N/10 rows, and a better-than-random
    classifier's top decile lifts above 1."""
    rows = registry.QUERIES["classifier_lift_deciles"](spark, SF).collect()
    by = {}
    for r in rows:
        by.setdefault(r.split, {})[r.decile] = r
    for split, d in by.items():
        assert set(d) == set(range(1, 11))
        assert d[10].gain_micro == 1_000_000
        assert d[10].lift_micro == 1_000_000
        gains = [d[k].gain_micro for k in range(1, 11)]
        assert gains == sorted(gains)
        nt = d[10].cum_n
        for k in range(1, 11):
            assert d[k].cum_n >= (k * nt) // 10
    assert by["holdout"][1].lift_micro > 1_000_000


def test_attribution_heuristics_planted_journeys(spark, tmp_path):
    """Hand-computable first/last/linear on planted journeys:
    u1 view->CONV; u2 click->CONV; u3 click->NULL (non-converting,
    excluded); u4 view,click,view->CONV (first=view, last=view,
    linear splits 500k/500k over the DISTINCT channel set)."""
    import datetime

    import duckdb

    t0 = datetime.datetime(2024, 1, 1)
    rows = []

    def ev(eid, u, typ, s):
        rows.append((eid, t0 + datetime.timedelta(seconds=s), u, typ, 0.0, "{}"))

    ev(1, 1, "view", 0); ev(2, 1, "purchase", 1)
    ev(3, 2, "click", 0); ev(4, 2, "purchase", 1)
    ev(5, 3, "click", 0)
    ev(6, 4, "view", 0); ev(7, 4, "click", 1); ev(8, 4, "view", 2)
    ev(9, 4, "purchase", 3)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?,?,?,?,?,?)", rows)
    con.execute(f"COPY e TO '{tmp_path}/events.parquet' (FORMAT PARQUET)")
    out = {
        r.channel: r
        for r in registry.QUERIES["attribution_heuristics_events"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {"view", "click"}
    assert out["view"].first_touch_n == 2
    assert out["click"].first_touch_n == 1
    assert out["view"].last_touch_n == 2
    assert out["click"].last_touch_n == 1
    assert out["view"].linear_credit_micro == 1_500_000
    assert out["click"].linear_credit_micro == 1_500_000


def test_dtree_split_matches_bruteforce_gini(spark):
    """The histogram argmax must equal a brute-force scan of every
    (feature, threshold) with the same quantized-Gini gain — parity
    with the oracle alone would not catch a shared formula bug
    (verify-skill rule: re-derivations also get a builtin/brute
    check)."""
    import itertools

    from pyspark.sql import functions as F

    from etl_pipeline_orchestration_spark.plans.ml_analytics import (
        _DT_SCALE,
        _dtree_best_splits,
        _dtree_unpivot,
    )

    rows = []
    # f_band separates y almost perfectly; others are noise-ish
    for i in range(200):
        band = i % 4
        y = 1 if (band <= 1) == (i % 17 != 0) else 0
        rows.append((i, y, band, (i * 7) % 3, (i * 5) % 6, i % 2))
    base = spark.createDataFrame(
        rows, "okey bigint, y int, f_band bigint, f_items bigint,"
        " f_month bigint, f_year bigint"
    )
    got = _dtree_best_splits(_dtree_unpivot(base, F.lit(0))).head()

    # brute force on the same quantized gain
    feats = {"f_band": 2, "f_items": 3, "f_month": 4, "f_year": 5}
    best = None
    for f, idx in sorted(feats.items()):
        vals = sorted({r[idx] for r in rows})
        for t in vals[:-1]:
            lpos = sum(r[1] for r in rows if r[idx] <= t)
            ln = sum(1 for r in rows if r[idx] <= t)
            rpos = sum(r[1] for r in rows) - lpos
            rn = len(rows) - ln
            gq = (_DT_SCALE * (lpos * lpos + (ln - lpos) * (ln - lpos))) // ln
            gq += (_DT_SCALE * (rpos * rpos + (rn - rpos) * (rn - rpos))) // rn
            key = (-gq, f, t)
            if best is None or key < best:
                best = key
    assert (got["feature"], int(got["threshold"])) == (best[1], best[2])
    assert int(got["gain_q"]) == -best[0]


def test_gbt_stump_matches_bruteforce_and_planted_signal(spark):
    """The histogram stump argmax must equal a brute-force scan of
    every (feature, threshold) under the same quantized criterion —
    including NEGATIVE residual sums (trunc-toward-zero division on
    both sides). The planted frame makes f_items the dominant signal;
    the stump must find it."""
    from pyspark.sql import functions as F

    from etl_pipeline_orchestration_spark.plans.ml_analytics import (
        _GBT_S,
        _gbt_best_stump,
    )

    def trunc(a, b):
        return int(a / b)

    rows = []
    # resid strongly increasing in f_items; month/prio/year noise-ish;
    # mix of signs so the negative-sum division path is exercised
    for i in range(300):
        items = i % 5
        resid = (items - 2) * 1000 + ((i * 13) % 7) - 3
        rows.append((resid, items, (i * 7) % 12 + 1, i % 5 + 1, i % 7))
    base = spark.createDataFrame(
        rows,
        "resid bigint, f_items bigint, f_month bigint,"
        " f_prio bigint, f_year bigint",
    )
    got = _gbt_best_stump(base).head()

    feats = {"f_items": 1, "f_month": 2, "f_prio": 3, "f_year": 4}
    best = None
    for f, idx in sorted(feats.items()):
        vals = sorted({r[idx] for r in rows})
        for t in vals[:-1]:
            ls = sum(r[0] for r in rows if r[idx] <= t)
            ln = sum(1 for r in rows if r[idx] <= t)
            rs = sum(r[0] for r in rows) - ls
            rn = len(rows) - ln
            ml = trunc(_GBT_S * ls, ln)
            mr = trunc(_GBT_S * rs, rn)
            gq = trunc(ln * ml * ml + rn * mr * mr, ln + rn)
            key = (-gq, f, t)
            if best is None or key < best:
                best = key
    assert got["feature"] == "f_items" == best[1]
    assert int(got["threshold"]) == best[2]
    assert int(got["gain_q"]) == -best[0]
    # leaf values replay: trunc(s / 2n) on the winning split
    t = best[2]
    ls = sum(r[0] for r in rows if r[1] <= t)
    ln = sum(1 for r in rows if r[1] <= t)
    rs = sum(r[0] for r in rows) - ls
    rn = len(rows) - ln
    assert int(got["left_value"]) == trunc(ls, 2 * ln)
    assert int(got["right_value"]) == trunc(rs, 2 * rn)


def test_gbt_training_curve_monotone_and_consistent(spark):
    """Boosting must never increase the training SSE (leaf value
    s div 2n lies inside the decreasing interval or is 0), and the
    stump table must be internally consistent with the curve run
    (same deterministic training loop)."""
    curve = sorted(
        _q("gbt_training_curve")(spark, SF).collect(), key=lambda r: r.round
    )
    assert [r.round for r in curve] == [0, 1, 2, 3]
    assert len({r.n for r in curve}) == 1
    for a, b in zip(curve, curve[1:]):
        assert b.sse_avg_q <= a.sse_avg_q, (a, b)
    # at least one round actually moved the loss on real data
    assert curve[-1].sse_avg_q < curve[0].sse_avg_q

    stumps = _q("gbt_stump_boosting")(spark, SF).collect()
    assert [r.round for r in sorted(stumps, key=lambda r: r.round)] == [1, 2, 3]
    for r in stumps:
        assert r.n_left > 0 and r.n_right > 0
        assert r.gain_q >= 0


def test_ipw_stratified_ate_removes_planted_confounding(spark, tmp_path):
    """Planted Simpson's-paradox fixture: two segments with different
    baseline outcomes AND different treatment rates (both keyed the
    way the query keys them), constant additive effect tau. The naive
    ALL-row contrast (y_treat_q - y_ctrl_q) must be biased away from
    tau; the stratified/IPW effect_q must recover tau exactly (all
    arithmetic integer-exact by construction)."""
    import duckdb

    KNUTH = 2654435761

    def bucket(k):
        return ((k % 2**31) * KNUTH) % 2**32 % 1000

    def thr(seg):
        return 100 + 60 * (ord(seg[0]) % 7)

    # FURNITURE: thr 100 (10% treated), baseline 1000; BUILDING:
    # thr 280 (28% treated), baseline 5000 -> treated pool over-weights
    # the high-baseline segment => naive contrast biased upward.
    tau = 700
    custs, orders = [], []
    for k in range(1, 2001):
        seg = "FURNITURE" if k % 2 == 0 else "BUILDING"
        treat = 1 if bucket(k) < thr(seg) else 0
        base = 1000 if seg == "FURNITURE" else 5000
        y = base + tau * treat
        custs.append((k, seg))
        orders.append((k, k, float(y)))
    con = duckdb.connect()
    con.execute("CREATE TABLE c (c_custkey BIGINT, c_mktsegment VARCHAR)")
    con.executemany("INSERT INTO c VALUES (?,?)", custs)
    con.execute(
        "CREATE TABLE o (o_orderkey BIGINT, o_custkey BIGINT,"
        " o_totalprice DOUBLE)"
    )
    con.executemany("INSERT INTO o VALUES (?,?,?)", orders)
    con.execute(f"COPY c TO '{tmp_path}/customer.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY o TO '{tmp_path}/orders.parquet' (FORMAT PARQUET)")

    out = {
        r.stratum: r
        for r in _q("ab_ipw_stratified_ate")(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"FURNITURE", "BUILDING", "ALL"}
    for seg in ("FURNITURE", "BUILDING"):
        assert out[seg].effect_q == tau * 1000, seg
    allr = out["ALL"]
    # stratified/IPW recovers tau; the naive contrast does not
    assert allr.effect_q == tau * 1000
    naive = allr.y_treat_q - allr.y_ctrl_q
    assert naive > tau * 1000 + 100_000  # biased up by >100 dollars
    # propensities match the planted rates per stratum
    n_f, t_f = out["FURNITURE"].n, out["FURNITURE"].n_treat
    assert out["FURNITURE"].p_hat_q == (1_000_000 * t_f) // n_f


def test_target_encode_oof_excludes_own_fold(spark, tmp_path):
    """Planted fixture: one category whose target differs BY FOLD —
    the encoding for fold k must equal the mean of the other folds
    only (own-fold rows excluded), and a single-fold category must
    report NULL (no out-of-fold evidence)."""
    import duckdb

    KNUTH = 2654435761

    def fold_of(k):
        return ((k % 2**31) * KNUTH) % 2**32 % 1000 // 200

    custs, orders = [], []
    okey = 1
    # category 7: y == fold number (each customer gets `fold` orders)
    by_fold = {}
    k = 1
    while len(by_fold) < 5 or min(len(v) for v in by_fold.values()) < 2:
        f = fold_of(k)
        custs.append((k, 7))
        by_fold.setdefault(f, []).append(k)
        for _ in range(f):
            orders.append((okey, k)); okey += 1
        k += 1
    # category 9: all its customers land in ONE fold -> enc NULL
    lone = []
    kk = k
    target_fold = fold_of(kk)
    while len(lone) < 3:
        if fold_of(kk) == target_fold:
            custs.append((kk, 9)); lone.append(kk)
            orders.append((okey, kk)); okey += 1
        kk += 1
    con = duckdb.connect()
    con.execute("CREATE TABLE c (c_custkey BIGINT, c_nationkey BIGINT)")
    con.executemany("INSERT INTO c VALUES (?,?)", custs)
    con.execute("CREATE TABLE o (o_orderkey BIGINT, o_custkey BIGINT)")
    con.executemany("INSERT INTO o VALUES (?,?)", orders)
    con.execute(f"COPY c TO '{tmp_path}/customer.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY o TO '{tmp_path}/orders.parquet' (FORMAT PARQUET)")

    rows = _q("target_encode_oof")(spark, str(tmp_path)).collect()
    cat7 = {r.fold: r for r in rows if r.cat == 7}
    n_tot = sum(len(v) for v in by_fold.values())
    s_tot = sum(f * len(v) for f, v in by_fold.items())
    for f, members in by_fold.items():
        n_oof = n_tot - len(members)
        s_oof = s_tot - f * len(members)
        assert cat7[f].n_oof == n_oof
        assert cat7[f].enc_q == (1_000_000 * s_oof) // n_oof, f
    cat9 = [r for r in rows if r.cat == 9]
    assert len(cat9) == 1 and cat9[0].enc_q is None


def test_ips_replay_hand_computed(spark, tmp_path):
    """Planted log, one context (all user_ids ≡ 1 mod 4): action 'a'
    logged 15x with reward 2.0, action 'b' 5x with reward 10.0. The
    greedy target picks 'b' (higher mean). Naive matched mean = 10e6
    micro. Smoothed propensity = (5+5)/(20+25) = 10/45; IPS =
    sr_b * w / (n * 1e6) with w = (1e6*45) div 10."""
    import datetime

    import duckdb

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 1
    for i in range(15):
        rows.append((eid, t0, 1 + 4 * i, "a", 2.0, "{}")); eid += 1
    for i in range(5):
        rows.append((eid, t0, 1 + 4 * i, "b", 10.0, "{}")); eid += 1
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?,?,?,?,?,?)", rows)
    con.execute(f"COPY e TO '{tmp_path}/events.parquet' (FORMAT PARQUET)")

    out = {r.ctx: r for r in _q("offpolicy_ips_replay")(spark, str(tmp_path)).collect()}
    r1 = out[1]
    assert r1.target_action == "b"
    assert r1.n == 20 and r1.n_matched == 5
    assert r1.v_target_mean_micro == 10_000_000
    w_q = (1_000_000 * 45) // 10
    assert r1.w_q == w_q
    sr_b = 5 * 10_000_000
    assert r1.v_ips_micro == (sr_b * w_q) // (20 * 1_000_000)
    # smoothing pulls the propensity toward 1/K (10/45 ≈ 0.22 < the
    # empirical 0.25), so IPS up-weights: 11.25e6 vs naive 10e6 — the
    # estimator-vs-naive gap the query exists to expose
    assert r1.v_ips_micro == 11_250_000 != r1.v_target_mean_micro
    allr = out[-1]
    assert allr.n == 20 and allr.target_action is None


def test_stump_forest_matches_python_replay(spark):
    """Full independent replay at sf0.001: folds, per-tree cross-fitted
    training (feature t excluded, folds != t), quantized-Gini argmax,
    majority labels, OOB accuracy on the held-out fold, and the 4-tree
    ensemble vote — every output cell must match."""
    from etl_pipeline_orchestration_spark.plans.ml_analytics import (
        _DT_FEATURES,
        _DT_SCALE,
        _dtree_base,
    )

    KNUTH = 2654435761
    rows = _dtree_base(spark, SF).collect()
    feats = list(_DT_FEATURES)

    def fold_of(okey):
        return ((okey % 2**31) * KNUTH) % 2**32 % 1000 % 4

    data = [
        (fold_of(r.okey), r.y, {f: r[f] for f in feats}) for r in rows
    ]
    stumps = []
    want = []
    for t, excl in enumerate(feats):
        train = [(y, fv) for fo, y, fv in data if fo != t]
        best = None
        for f in sorted(feats):
            if f == excl:
                continue
            vals = sorted({fv[f] for _, fv in train})
            tot_n = len(train)
            tot_p = sum(y for y, _ in train)
            for v in vals[:-1]:
                ln = sum(1 for _, fv in train if fv[f] <= v)
                lp = sum(y for y, fv in train if fv[f] <= v)
                rn, rp = tot_n - ln, tot_p - lp
                gq = (_DT_SCALE * (lp * lp + (ln - lp) * (ln - lp))) // ln
                gq += (_DT_SCALE * (rp * rp + (rn - rp) * (rn - rp))) // rn
                key = (-gq, f, v)
                if best is None or key < best:
                    best = key
                    side = (ln, lp, rn, rp)
        gq, f, v = -best[0], best[1], best[2]
        ln, lp, rn, rp = side
        ll, rl = int(2 * lp > ln), int(2 * rp > rn)
        stumps.append((f, v, ll, rl))
        oob = [(y, fv) for fo, y, fv in data if fo == t]
        correct = sum(
            1
            for y, fv in oob
            if (ll if fv[f] <= v else rl) == y
        )
        want.append((t, f, v, gq, len(train), len(oob), correct))
    ens_correct = sum(
        1
        for _, y, fv in data
        if int(
            2 * sum(ll if fv[f] <= v else rl for f, v, ll, rl in stumps) > 4
        )
        == y
    )
    want.append((-1, None, None, None, len(data), len(data), ens_correct))

    got = sorted(
        (tuple(r) for r in _q("stump_forest_oob")(spark, SF).collect()),
        key=lambda r: r[0],
    )
    assert got == sorted(want, key=lambda r: r[0])
    # cross-fitting guarantees: tree t never uses its excluded feature
    for t, (f, _, _, _) in enumerate(stumps):
        assert f != feats[t]


def test_gbt_conformal_coverage_guarantee(spark):
    """Split-conformal marginal guarantee: fold-3 coverage of ŷ ± qhat
    must be ≥ ~90% (the finite-sample bound allows ≥ 0.9 - 1/(n_cal+1)
    slack below and exchangeability noise; we assert the practical
    band), qhat must be a SELECTED calibration value, and the folds
    must partition the corpus."""
    r = _q("gbt_conformal_intervals")(spark, SF).head()
    assert r.n_train + r.n_cal + r.n_test > 0
    total = _q("gbt_training_curve")(spark, SF).head().n
    # folds 0..3 partition: train(2 folds)+cal+test == all orders
    assert r.n_train + r.n_cal + r.n_test == total
    assert r.qhat >= 0
    cov = r.covered / r.n_test
    assert cov >= 0.9 - 1.0 / (r.n_cal + 1) - 0.05, cov
    assert r.coverage_ppm == (1_000_000 * r.covered) // r.n_test


def test_feature_mi_planted_signal(spark, tmp_path):
    """MI semantics on planted data: a feature that DETERMINES the
    label gets I = H(Y) (binary entropy of the label split, here
    ln 2); an independent feature gets ~0; ranking follows."""
    import math

    import duckdb

    custs = []  # reuse orders/lineitem shape: build orders directly
    orders, lines = [], []
    for k in range(1, 1201):
        # month parity DETERMINES status (k%12 odd ⇔ k odd); the price
        # band (k//2)%8 is EXACTLY independent of k's parity over the
        # 1200 = 75·16 full blocks, so its MI is exactly 0
        month = 1 + (k % 12)
        status = "F" if month % 2 == 0 else "O"
        price = 10000.0 + ((k // 2) % 8) * 25000.0
        orders.append(
            (k, status, f"199{2 + k % 7}-{month:02d}-15", price, "3-MEDIUM")
        )
        lines.append((k, 1))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE o (o_orderkey BIGINT, o_orderstatus VARCHAR,"
        " o_orderdate DATE, o_totalprice DOUBLE, o_orderpriority VARCHAR)"
    )
    con.executemany(
        "INSERT INTO o VALUES (?,?,CAST(? AS DATE),?,?)", orders
    )
    con.execute("CREATE TABLE l (l_orderkey BIGINT, l_linenumber INT)")
    con.executemany("INSERT INTO l VALUES (?,?)", lines)
    con.execute(f"COPY o TO '{tmp_path}/orders.parquet' (FORMAT PARQUET)")
    con.execute(f"COPY l TO '{tmp_path}/lineitem.parquet' (FORMAT PARQUET)")

    out = {r.feature: r for r in _q("feature_mi_ranking")(spark, str(tmp_path)).collect()}
    # month determines y exactly -> I(month; y) = H(y) = ln 2 (balanced)
    assert abs(out["f_month"].mi_micro / 1e6 - math.log(2)) < 2e-3
    assert out["f_month"].rk == 1
    # price band is EXACTLY independent of label -> MI exactly 0
    assert out["f_band"].mi_micro == 0
    # year (k%7) nearly independent of parity -> MI ~ 0
    assert abs(out["f_year"].mi_micro) < 5_000  # < 0.005 nats
    # items constant (all orders have 1 line) -> exactly 0
    assert out["f_items"].mi_micro == 0


def test_dp_noisy_counts_inverse_cdf_replay(spark):
    """The released integers must equal a python replay of the
    Laplace inverse CDF from the same Knuth-seeded uniforms, and the
    noise must actually perturb (not all zero) while staying
    plausible for Laplace(1) (|noise| < 15 w.p. ~1-6e-7)."""
    import math

    rows = _q("dp_noisy_counts")(spark, SF).collect()
    assert len(rows) == 25
    nonzero = 0
    for r in rows:
        u = (((r.nation * 2654435761 + 987654321) % 2**32) + 0.5) / 2**32
        mag = math.floor(-math.log(1.0 - 2.0 * abs(u - 0.5)) * 1e6 + 0.5)
        noise = -mag if u < 0.5 else mag
        assert r.noisy_micro == r.n * 1_000_000 + noise, r.nation
        assert abs(noise) < 15_000_000
        nonzero += noise != 0
    assert nonzero >= 20


def test_kn_trigram_python_replay_and_normalization(spark, tmp_path):
    """Full python replay of the interpolated trigram KN chain on a
    planted corpus — per-doc scores must match to the 1e-6 rounding —
    and the model must be a PROPER distribution: for a seen context
    (w1,w2), p(w3|w1w2) summed over the whole seen vocabulary is
    exactly 1 (the discount mass λ re-enters through the continuation
    chain)."""
    import collections
    import math

    import duckdb

    texts = [
        "the cat sat on the mat",
        "the cat ran on the mat",
        "a dog sat on a rug",
        "the dog ran to the rug",
        "cat and dog sat here now",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?,?)", list(enumerate(texts, 1))
    )
    con.execute(
        f"COPY docs TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)"
    )

    tgs = []
    docs_tg = {}
    for i, t in enumerate(texts, 1):
        ws = t.split()
        cur = [(ws[j], ws[j + 1], ws[j + 2]) for j in range(len(ws) - 2)]
        docs_tg[i] = cur
        tgs.extend(cur)
    c3 = collections.Counter(tgs)
    c2 = collections.Counter((a, b) for a, b, _ in tgs)
    n1f12 = {
        k: len({w3 for (a, b, w3) in c3 if (a, b) == k}) for k in c2
    }
    m23 = {
        (b, c): len({a for (a, bb, cc) in c3 if (bb, cc) == (b, c)})
        for (_, b, c) in c3
    }
    m2dot = collections.Counter()
    m2n1f = collections.Counter()
    for (b, c), v in m23.items():
        m2dot[b] += v
        m2n1f[b] += 1
    b3 = {
        c: len({(a, b) for (a, b, cc) in c3 if cc == c})
        for (_, _, c) in c3
    }
    tt = len(c3)
    d = 0.75

    def p_mid(w2, w3):
        cnt = m23.get((w2, w3), 0)
        return max(cnt - d, 0.0) / m2dot[w2] + (
            d * m2n1f[w2] / m2dot[w2]
        ) * (b3.get(w3, 0) / tt)

    def p(w1, w2, w3):
        return max(c3[(w1, w2, w3)] - d, 0.0) / c2[(w1, w2)] + (
            d * n1f12[(w1, w2)] / c2[(w1, w2)]
        ) * p_mid(w2, w3)

    got = {
        r.doc_id: r
        for r in _q("kneser_ney_trigram_scores")(
            spark, str(tmp_path)
        ).collect()
    }
    for i, cur in docs_tg.items():
        want = sum(math.log(p(*t)) for t in cur) / len(cur)
        want = round(want * 1e6) / 1e6
        assert got[i].n_trigrams == len(cur)
        assert abs(got[i].avg_logprob - want) <= 1e-6, i

    # properness: sum over the whole seen w3 vocabulary == 1
    vocab = sorted({w for t in texts for w in t.split()})
    ctx = ("the", "cat")
    total = sum(p(ctx[0], ctx[1], w3) for w3 in vocab)
    # P_cont sums to 1 over vocab => interpolated mass closes exactly
    assert abs(sum(b3.get(w, 0) for w in vocab) / tt - 1.0) < 1e-12
    assert abs(total - 1.0) < 1e-9
