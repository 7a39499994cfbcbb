"""Distributed k-means. The synthetic embeddings carry no separable
label structure (within-label cosine ≈ cross-label ≈ 0 — verified), so
recovery-of-labels is untestable on this data; what IS testable:
Lloyd's objective is monotone non-increasing, the assignment is
deterministic across runs, and no cluster is empty."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.operators.clustering import kmeans_fit_assign
from etl_pipeline_orchestration_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_kmeans_objective_decreases(spark):
    vecs = load_table(spark, SF, "embeddings")
    inertia = []
    for iters in (1, 4, 8):
        a = kmeans_fit_assign(vecs, k=10, iters=iters, dim=64)
        inertia.append(a.agg(F.sum("sq_dist")).head()[0])
    assert inertia[1] <= inertia[0] + 1e-6, inertia
    assert inertia[2] <= inertia[1] + 1e-6, inertia


def test_kmeans_deterministic_and_covering(spark):
    vecs = load_table(spark, SF, "embeddings")
    runs = [
        sorted(
            (r["vec_id"], r["cluster_id"])
            for r in kmeans_fit_assign(vecs, k=10, iters=4, dim=64).collect()
        )
        for _ in range(2)
    ]
    assert runs[0] == runs[1]
    n_clusters = len({c for _, c in runs[0]})
    assert n_clusters == 10
    assert len(runs[0]) == vecs.count()
