"""Connected components: both execution paths must produce identical,
correct clusters — the driver union-find (small graphs) and the
distributed pointer-jumping loop (forced via driver_threshold=0)."""

from __future__ import annotations

import pytest

from etl_pipeline_orchestration_spark.operators.graph import connected_components

# chain 1-2-3-4-5 (one component, diameter 4 — forces >1 jump round),
# triangle 10-11-12, isolated edge 20-21, singleton-free: nodes only
# appear via edges
EDGES = [(2, 1), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (12, 10), (20, 21)]
WANT = {
    1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
    10: 10, 11: 10, 12: 10,
    20: 20, 21: 20,
}


@pytest.mark.parametrize("threshold", [2_000_000, 0], ids=["driver", "distributed"])
def test_connected_components_paths_agree(spark, threshold):
    edges = spark.createDataFrame(EDGES, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, driver_threshold=threshold).collect()
    }
    assert got == WANT


def test_connected_components_empty(spark):
    edges = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    assert connected_components(edges).count() == 0


def test_pagerank_matches_numpy_power_iteration(spark):
    """PageRank on a fixed directed graph (with a dangling node) must
    match a dense numpy power iteration within tolerance."""
    import numpy as np

    from etl_pipeline_orchestration_spark.operators.graph import pagerank

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (3, 5)]  # 5 dangles
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, max_iter=40).collect()}

    ids = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    M = np.zeros((n, n))
    out = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    for s, ds in out.items():
        for d in ds:
            M[idx[d], idx[s]] = 1.0 / len(ds)
    r = np.full(n, 1.0 / n)
    damping = 0.85
    for _ in range(200):
        dangling = sum(r[idx[v]] for v in ids if v not in out)
        r = (1 - damping) / n + damping * (M @ r + dangling / n)
    want = {v: r[idx[v]] for v in ids}

    assert set(got) == set(want)
    for v in ids:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9
