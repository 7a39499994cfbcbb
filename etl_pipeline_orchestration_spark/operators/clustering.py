"""Distributed k-means (Lloyd's algorithm) over an embedding column.

The corpus-organization primitive behind IVF index builds, topic
sharding, and diversity-aware sampling. The IVF path
(similarity.ivf_train_centroids) trains on a driver-side hash SAMPLE —
right for index building where approximate centroids suffice. This is
the FULL distributed iteration for when the model must see every row:

- **assignment** is one narrow pass: an Arrow-batched pandas UDF doing
  a single (batch × dim) @ (dim × k) matmul per batch against the
  broadcast centroid matrix (KBs) — no shuffle, no per-row Python.
- **update** is one shuffle of k × dim PARTIAL sums: posexplode the
  assigned vectors to (cluster, dim_idx, value), aggregate sum+count
  with map-side combine — each of the 1000 executors emits at most
  k × dim partial rows regardless of data size, so the shuffle is
  model-sized, not data-sized.
- centroids (k × dim doubles) collect to the driver between rounds —
  that is MODEL state, not data; at k=10⁴, dim=10³ it is 80 MB, still
  driver-sized.

Iteration count is fixed (Lloyd converges geometrically; production
corpus-clustering runs 5-20 rounds); empty clusters keep their previous
centroid (the standard degenerate-case rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from etl_pipeline_orchestration_spark.operators.similarity import (
    ivf_train_centroids,
)


def _assign_udf(centroids: np.ndarray):
    """cluster_id = argmin L2 distance to a broadcast centroid matrix
    (ties break to the lowest cluster index — argmin is deterministic).
    ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² is constant per row, so
    argmin needs only the matmul term and the centroid norms."""
    c = centroids.astype(np.float64)
    c_sq = (c * c).sum(axis=1)
    dim = c.shape[1]

    @pandas_udf("int")
    def _nearest(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:  # empty Arrow batch (empty partition at scale)
            return pd.Series([], dtype="int32")
        mat = np.stack(emb.to_numpy())[:, :dim].astype(np.float64)
        d = c_sq - 2.0 * (mat @ c.T)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return _nearest


def kmeans_fit_assign(
    vectors: DataFrame,
    k: int = 10,
    iters: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Run ``iters`` distributed Lloyd rounds; returns (id, cluster_id,
    sq_dist) for every vector under the FINAL centroids. Deterministic:
    hash-sampled seeding, argmin tie-break to lowest index, and the
    float drift from partial-sum order only moves points that sit
    exactly on a bisector."""
    cents = ivf_train_centroids(
        vectors, k=k, iters=1, dim=dim, id_col=id_col, vec_col=vec_col, seed=seed
    )
    for _ in range(iters):
        assigned = vectors.select(
            F.col(vec_col).alias("__v__"),
            _assign_udf(cents)(F.col(vec_col)).alias("cluster_id"),
        )
        partials = (
            assigned.select(
                "cluster_id", F.posexplode(F.col("__v__")).alias("dim_idx", "val")
            )
            .groupBy("cluster_id", "dim_idx")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = cents.copy()
        counts = np.zeros(len(cents))
        for r in partials:
            new[r["cluster_id"], r["dim_idx"]] = r["s"] / r["n"]
            counts[r["cluster_id"]] = r["n"]
        cents = np.where(counts[:, None] > 0, new, cents)

    c = cents.astype(np.float64)
    c_sq = (c * c).sum(axis=1)

    @pandas_udf("cluster_id int, sq_dist double")
    def _final(emb: pd.Series) -> pd.DataFrame:
        if len(emb) == 0:
            return pd.DataFrame({"cluster_id": pd.Series([], dtype="int32"),
                                 "sq_dist": pd.Series([], dtype="float64")})
        mat = np.stack(emb.to_numpy())[:, : c.shape[1]].astype(np.float64)
        d = (mat * mat).sum(axis=1, keepdims=True) - 2.0 * (mat @ c.T) + c_sq
        return pd.DataFrame(
            {"cluster_id": d.argmin(axis=1).astype("int32"), "sq_dist": d.min(axis=1)}
        )

    out = vectors.select(F.col(id_col), _final(F.col(vec_col)).alias("__a__"))
    return out.select(id_col, "__a__.cluster_id", "__a__.sq_dist")


def _trunc_div(a: int, b: int) -> int:
    """Truncating integer division (toward zero): Python ``//`` floors,
    but Spark ``div`` and the oracle's guarded division truncate, and
    centroid tick sums CAN be negative."""
    return -((-a) // b) if a < 0 else a // b


def kmeans_fit_assign_quantized(
    vectors: DataFrame,
    k: int = 10,
    iters: int = 8,
    dim: int = 64,
    scale: int = 1 << 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """INTEGER-EXACT distributed Lloyd k-means — the same plan shape as
    ``kmeans_fit_assign`` (Arrow-matmul assignment, model-sized partial
    -sum shuffle per round, centroids as driver MODEL state) but run on
    quantized ticks round(v * 2^20) with truncating-division centroid
    means, so every distance, argmin, and centroid is an exact int64
    on any engine. This removes the one thing that kept the k-means
    surface rows-only: a float argmin near a bisector could flip on a
    last-ulp BLAS-vs-SQL difference and cascade; over integers there
    is no bisector ambiguity (ties break to the lowest cluster index,
    deterministically, on both engines).

    Deterministic seeding: cluster j starts as the truncated mean of
    ticks over {id % k == j} — distributed (one model-sized aggregate),
    replayable in SQL. Empty clusters keep their previous centroid.

    All integer magnitudes are safe in float64 matmuls: |tick| < 2^20,
    so any dot/sq term is < 64 * 2^40 = 2^46 << 2^53.

    Returns (id, cluster_id int, sq_dist_q long) under the final
    centroids."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    xq = vectors.select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col},"
            f" v -> cast(round(cast(v as double) * {float(scale)}) as bigint))"
        ).alias("xq"),
    ).localCheckpoint()  # consumed by every round's assign + update

    def _collect_centroids(grouped) -> tuple[np.ndarray, np.ndarray]:
        cents = np.zeros((k, dim), dtype=np.int64)
        nonempty = np.zeros(k, dtype=bool)
        for r in grouped:
            cents[int(r["j"]), int(r["i"])] = _trunc_div(int(r["s"]), int(r["n"]))
            nonempty[int(r["j"])] = True
        return cents, nonempty

    init = (
        xq.select(
            (F.col(id_col) % k).cast("int").alias("j"),
            F.posexplode("xq").alias("i", "v"),
        )
        .groupBy("j", "i")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    cents, _ = _collect_centroids(init)

    def _assign_ticks_udf(c: np.ndarray):
        cf = c.astype(np.float64)
        c_sq = (cf * cf).sum(axis=1)

        @pandas_udf("int")
        def _nearest(emb: pd.Series) -> pd.Series:
            if len(emb) == 0:
                return pd.Series([], dtype="int32")
            mat = np.stack(emb.to_numpy()).astype(np.float64)
            d = c_sq - 2.0 * (mat @ cf.T)  # ||x||^2 constant per row
            return pd.Series(d.argmin(axis=1).astype("int32"))

        return _nearest

    for _ in range(iters):
        assigned = xq.select(
            "xq", _assign_ticks_udf(cents)(F.col("xq")).alias("j")
        )
        partials = (
            assigned.select("j", F.posexplode("xq").alias("i", "v"))
            .groupBy("j", "i")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        upd, nonempty = _collect_centroids(partials)
        cents = np.where(nonempty[:, None], upd, cents)

    cf = cents.astype(np.float64)
    c_sq = (cf * cf).sum(axis=1)

    @pandas_udf("cluster_id int, sq_dist_q long")
    def _final(emb: pd.Series) -> pd.DataFrame:
        if len(emb) == 0:
            return pd.DataFrame(
                {
                    "cluster_id": pd.Series([], dtype="int32"),
                    "sq_dist_q": pd.Series([], dtype="int64"),
                }
            )
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        d = (mat * mat).sum(axis=1, keepdims=True) - 2.0 * (mat @ cf.T) + c_sq
        return pd.DataFrame(
            {
                "cluster_id": d.argmin(axis=1).astype("int32"),
                "sq_dist_q": d.min(axis=1).astype("int64"),
            }
        )

    out = xq.select(F.col(id_col), _final(F.col("xq")).alias("__a__"))
    return out.select(id_col, "__a__.cluster_id", "__a__.sq_dist_q")
