"""Exact distributed epsilon-join + DBSCAN (operators/density.py).

The load-bearing claim is COMPLETENESS: the pivot-cell + halo
construction must produce exactly the brute-force eps-pair relation —
a dropped halo pair flips a neighbor count and cascades through the
whole labeling. Pinned here against an independent numpy all-pairs
computation (the driver's DuckDB oracle re-pins it cross-engine)."""

from __future__ import annotations

import numpy as np
import pytest

from etl_pipeline_orchestration_spark.operators import density
from etl_pipeline_orchestration_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
EPS2 = 1_500_000_000_000
MINPTS = 5


@pytest.fixture(scope="module")
def ticks(spark):
    return density.quantize_ticks(load_table(spark, SF, "embeddings"))


@pytest.fixture(scope="module")
def brute(ticks):
    rows = sorted(
        (int(r["vec_id"]), np.array(r["xq"], dtype=np.int64))
        for r in ticks.collect()
    )
    ids = [i for i, _ in rows]
    X = np.stack([x for _, x in rows]).astype(np.float64)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(axis=2)
    pairs = {
        (ids[i], ids[j]): int(d2[i, j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if d2[i, j] <= EPS2
    }
    return ids, pairs


def test_epsilon_join_complete_and_exact(ticks, brute):
    _, want = brute
    got = {
        (int(r["id_a"]), int(r["id_b"])): int(r["d2"])
        for r in density.epsilon_join_exact(ticks, EPS2, n_pivots=8).collect()
    }
    assert got == want  # no missing halo pair, no spurious pair, exact d2


def test_epsilon_join_complete_with_few_pivots(ticks, brute):
    """Completeness must not depend on pivot count or placement —
    pivots only shape balance. One pivot degenerates to a single cell
    (all-pairs); three is an awkward in-between."""
    _, want = brute
    for m in (1, 3):
        got = {
            (int(r["id_a"]), int(r["id_b"]))
            for r in density.epsilon_join_exact(
                ticks, EPS2, n_pivots=m
            ).collect()
        }
        assert got == set(want)


def test_dbscan_labels_match_reference(ticks, brute):
    ids, pairs = brute
    nb: dict[int, set[int]] = {i: set() for i in ids}
    for a, b in pairs:
        nb[a].add(b)
        nb[b].add(a)
    core = {i for i in ids if len(nb[i]) + 1 >= MINPTS}
    # reference components over core-core edges (union-find)
    parent = {i: i for i in core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in pairs:
        if a in core and b in core:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    roots: dict[int, list[int]] = {}
    for i in core:
        roots.setdefault(find(i), []).append(i)
    label = {i: min(mem) for mem in roots.values() for i in mem}
    want = {}
    for i in ids:
        if i in core:
            want[i] = ("core", label[i])
        else:
            cn = [label[j] for j in nb[i] if j in core]
            want[i] = ("border", min(cn)) if cn else ("noise", -1)
    got = {
        int(r["vec_id"]): (r["role"], int(r["cluster"]))
        for r in density.dbscan(ticks, EPS2, MINPTS, n_pivots=8).collect()
    }
    assert got == want
    assert any(v[0] == "core" for v in got.values())
    assert any(v[0] == "noise" for v in got.values())
