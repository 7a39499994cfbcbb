"""Isolation forest (operators/iforest.py): planted far outliers are
isolated first, scores are bit-deterministic across independent fits,
and inliers score below outliers."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.operators import iforest

SF = "/root/testdata/sf0.001"


def test_planted_outliers_rank_first_and_determinism(spark):
    vecs = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planted = spark.createDataFrame(
        [
            (9_000_001, [50.0] * 64),
            (9_000_002, [-40.0] * 64),
            (9_000_003, [0.0] * 32 + [80.0] * 32),
        ],
        "vec_id long, embedding array<double>",
    )
    corpus = vecs.withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    ).unionByName(planted)
    model = iforest.fit_iforest(corpus)
    scored = iforest.score_iforest(corpus, model)
    top = scored.orderBy(F.desc("score_micro"), "vec_id").limit(3).collect()
    assert {r.vec_id for r in top} == {9_000_001, 9_000_002, 9_000_003}
    # scores live in (0, 1e6] and outliers clear the corpus median
    stats = scored.agg(
        F.min("score_micro"), F.max("score_micro"),
        F.expr("percentile(score_micro, 0.5)"),
    ).collect()[0]
    assert 0 < stats[0] <= stats[1] <= 1_000_000
    assert min(r.score_micro for r in top) > stats[2]

    # bit-determinism: an independent fit+score run is identical
    model2 = iforest.fit_iforest(corpus)
    s1 = sorted((r.vec_id, r.score_micro) for r in scored.collect())
    s2 = sorted(
        (r.vec_id, r.score_micro)
        for r in iforest.score_iforest(corpus, model2).collect()
    )
    assert s1 == s2
