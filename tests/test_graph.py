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
