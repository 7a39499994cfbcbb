"""Phase-level profile of embedding_topk_ivf (r14 item 5): time each
driver action of the query separately to find where the 2.9 s goes.

Usage: python tools/prof_ivf.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from etl_pipeline_orchestration_spark.session import get_spark
    from etl_pipeline_orchestration_spark.plans.llm_data import (
        _kmeans_exact_assign_expr,
        _kmeans_exact_centroids_of,
        _quantize_vecs,
    )
    from etl_pipeline_orchestration_spark.sources.tables import load_table

    spark = get_spark("prof_ivf")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    best: dict[str, float] = {}
    for rep in range(reps):
        t = time.perf_counter()

        def lap(name):
            nonlocal t
            now = time.perf_counter()
            dt = now - t
            best[name] = min(best.get(name, 1e9), dt)
            t = now

        dfq = _quantize_vecs(
            load_table(spark, sf_dir, "embeddings")
        ).localCheckpoint()
        lap("ckpt_dfq")
        c0 = _kmeans_exact_centroids_of(
            dfq.withColumn("j", (F.col("vec_id") % 16).cast("int"))
        )
        lap("c0_collect")
        j1, _ = _kmeans_exact_assign_expr(c0)
        c1 = _kmeans_exact_centroids_of(dfq.select("vec_id", "xq", j1))
        lap("c1_collect")
        q = [
            int(v)
            for v in dfq.filter(F.col("vec_id") == 0).select("xq").head()[0]
        ]
        lap("q_head")
        probes = [
            j
            for _, j in sorted(
                (sum((qi - ci) ** 2 for qi, ci in zip(q, c1[j])), j)
                for j in c1
            )[:3]
        ]
        j2, _ = _kmeans_exact_assign_expr(c1)
        qarr = F.array(*[F.lit(v) for v in q])
        dot = F.aggregate(
            F.zip_with("xq", qarr, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        out = (
            dfq.select("vec_id", "xq", j2)
            .filter(F.col("j").isin(probes))
            .select(
                "vec_id",
                F.col("j").cast("int").alias("list_j"),
                dot.alias("dot_q"),
            )
            .orderBy(F.col("dot_q").desc(), "vec_id")
            .limit(10)
        )
        out.write.format("noop").mode("overwrite").save()
        lap("final_noop")

    for k, v in best.items():
        print(f"{k}\t{v:.3f}")
    print(f"TOTAL\t{sum(best.values()):.3f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
