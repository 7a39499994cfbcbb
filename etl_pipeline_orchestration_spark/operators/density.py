"""Density-based clustering (DBSCAN) over an embedding column, built on
an EXACT distributed epsilon-join.

The epsilon-join is the part that must survive 100 TB: all-pairs is
quadratic, and sign-LSH banding (the near-dup path) loses recall at
moderate similarity, which silently breaks DBSCAN's neighbor counts.
The scale-correct exact construction is the classic Voronoi pivot
partitioning with halo replication (the distributed similarity-join
literature's standard; public method):

1. pick m pivots (deterministic: the m smallest ids — pivot QUALITY
   only affects balance, never correctness);
2. one narrow Arrow-matmul pass computes every vector's squared
   distance to each pivot; home(v) = argmin (tie -> lowest pivot);
3. replicate v into every pivot cell P with
   d(v,P) <= d(v,home(v)) + 2*eps — the triangle inequality then
   guarantees every eps-pair co-locates in home(a)'s cell, so
   within-cell (home x member) pairs are COMPLETE;
4. verify candidates with the exact integer squared distance.

Everything is integer-exact on 2^20-tick quantized vectors: the halo
test sqrt(B) <= sqrt(A) + 2e is evaluated square-free as
B - A - 4e^2 <= 0 OR (B - A - 4e^2)^2 <= 16 e^2 A (DECIMAL(38,0) for
the square; both engines replay it by value), and pair distances are
|a|^2 + |b|^2 - 2ab in int64.

DBSCAN on top (Ester et al. 1996; public method): core = point with
>= minPts neighbors within eps (the point itself included), clusters =
connected components over core-core eps-edges (the repo's pointer-jump
CC), border = non-core with a core neighbor (joins the min cluster
label — the deterministic variant of the classic order-dependent
assignment), noise = the rest.

Scale: per-vec pivot distances are one narrow pass; cell sizes are
corpus/m with a bounded halo, and within-cell work is (cell x cell)
pairs pruned by the halo test — m grows with the corpus to hold the
cell size constant. The CC rounds are O(log diameter) model-free
shuffles. No driver collect beyond the m x dim pivot matrix.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TICK = 1 << 20


def quantize_ticks(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, xq array<bigint>): embeddings as integer ticks
    round(v * 2^20) — exact on both engines."""
    return vectors.select(
        F.col(id_col),
        F.expr(
            f"transform({vec_col},"
            f" v -> cast(round(cast(v as double) * {float(TICK)}) as bigint))"
        ).alias("xq"),
    )


def epsilon_join_exact(
    ticks: DataFrame,
    eps2: int,
    n_pivots: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """COMPLETE (id_a < id_b, d2) relation of every pair with squared
    tick distance <= eps2, via pivot cells + halo replication — never
    an unbounded all-pairs join. Completeness is independent of pivot
    count/placement (pinned against the brute-force relation in
    tests/test_density.py, including m=1 and m=3).

    ``n_pivots=None`` scales m with the corpus as max(8, isqrt(n)):
    the pivot-distance pass costs dim*n*m and the within-cell verify
    ~dim*n^2/m (when the halo prunes, i.e. eps << typical distances),
    so m = sqrt(n) balances both at O(dim * n^1.5) — the standard
    pivot-join trade. When eps approaches the median pair distance the
    halo provably cannot prune (2*eps spans the distance range) and
    ANY exact method degenerates toward all-pairs; that regime is
    documented, not hidden, in embedding_dbscan_clusters."""
    import math

    import numpy as np

    # Materialize the input once: the count, pivot collection, and the
    # pivot-distance pass below are three separate actions, and callers
    # like embedding_dbscan_clusters feed a multi-way-unioned lineage
    # that would otherwise be recomputed per action.
    ticks = ticks.localCheckpoint(eager=True)
    if n_pivots is None:
        n_pivots = max(8, math.isqrt(ticks.count()))
    pivots = [
        (int(r[id_col]), list(r["xq"]))
        for r in ticks.orderBy(id_col).limit(n_pivots).collect()
    ]
    pmat = np.array([v for _, v in pivots], dtype=np.float64)  # (m, dim)
    p_sq = (pmat * pmat).sum(axis=1)
    m = len(pivots)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<bigint>")
    def _pivot_d2(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        mat = np.stack(emb.to_numpy()).astype(np.float64)
        d2 = (
            (mat * mat).sum(axis=1, keepdims=True)
            - 2.0 * (mat @ pmat.T)
            + p_sq
        ).astype(np.int64)
        return pd.Series(list(d2))

    with_d2 = ticks.select(id_col, "xq", _pivot_d2(F.col("xq")).alias("pd2"))
    # home = argmin over the pivot-distance array (tie -> lowest index)
    home = with_d2.select(
        id_col,
        "xq",
        "pd2",
        F.expr(
            "array_position(pd2, array_min(pd2)) - 1"
        ).cast("int").alias("home"),
        F.expr("array_min(pd2)").cast("bigint").alias("d2home"),
    )
    # halo: v joins cell p iff sqrt(B) <= sqrt(A) + 2e, evaluated
    # square-free: B <= A + 4e^2 short-circuit, else
    # (B - A - 4e^2)^2 <= 16 e^2 A in DECIMAL(38,0)
    cells = home.select(
        id_col,
        "xq",
        "home",
        F.posexplode("pd2").alias("cell", "d2cell"),
        F.col("d2home"),
    ).filter(
        (F.col("d2cell") <= F.col("d2home") + F.lit(4 * eps2))
        | (
            (F.col("d2cell") - F.col("d2home") - F.lit(4 * eps2))
            .cast("decimal(38,0)")
            * (F.col("d2cell") - F.col("d2home") - F.lit(4 * eps2))
            .cast("decimal(38,0)")
            <= F.lit(16 * eps2).cast("decimal(38,0)")
            * F.col("d2home").cast("decimal(38,0)")
        )
    )
    # Within-cell verify: ONE exact numpy matmul per cell (blocked
    # all-pairs — D = |a|^2 + |b|^2 - 2ab over int-valued float64,
    # < 2^53 so exact), instead of per-candidate-row JVM expressions
    # (measured 10x slower at the same pair count). Every eps-pair is
    # guaranteed present in home(a)'s cell with a home there, so pairs
    # with at least one home member cover everything; cross-cell
    # duplicates are identical rows removed by the final distinct.
    grouped = cells.select(
        "cell",
        F.col(id_col).alias("vid"),
        (F.col("cell") == F.col("home")).alias("is_home"),
        "xq",
    )

    def _cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "d2": pd.Series([], dtype="int64"),
            }
        )
        if len(pdf) < 2:
            return empty
        ids = pdf["vid"].to_numpy()
        home_m = pdf["is_home"].to_numpy()
        X = np.stack(pdf["xq"].to_numpy()).astype(np.float64)
        n2 = (X * X).sum(axis=1)
        outs = []
        # row-blocked so the distance matrix never exceeds ~block x n
        # doubles regardless of cell size (a mega-cell must not OOM an
        # executor; the blocks are still single BLAS matmuls)
        block = 2048
        for lo in range(0, len(X), block):
            hi = min(lo + block, len(X))
            D = (
                n2[lo:hi, None]
                + n2[None, :]
                - 2.0 * (X[lo:hi] @ X.T)
            )
            ii, jj = np.where(
                (D <= float(eps2))
                & (ids[lo:hi, None] < ids[None, :])
                & (home_m[lo:hi, None] | home_m[None, :])
            )
            if len(ii):
                outs.append(
                    pd.DataFrame(
                        {
                            "id_a": ids[lo + ii].astype("int64"),
                            "id_b": ids[jj].astype("int64"),
                            "d2": D[ii, jj].astype("int64"),
                        }
                    )
                )
        return pd.concat(outs, ignore_index=True) if outs else empty

    return (
        grouped.groupBy("cell")
        .applyInPandas(_cell_pairs, schema="id_a long, id_b long, d2 long")
        .distinct()
    )


def dbscan(
    ticks: DataFrame,
    eps2: int,
    min_pts: int,
    n_pivots: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, role in {'core','border','noise'}, cluster): deterministic
    DBSCAN labels; cluster is the minimum core id of the component
    (-1 for noise). Border points take the MIN cluster label among
    their core neighbors (the deterministic refinement of the classic
    order-dependent rule)."""
    from etl_pipeline_orchestration_spark.operators.graph import (
        connected_components,
    )

    pairs = epsilon_join_exact(
        ticks, eps2, n_pivots=n_pivots, id_col=id_col
    ).localCheckpoint()  # feeds degree count, core edges, border join
    sym = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).unionAll(pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    ids = ticks.select(F.col(id_col).alias("u"))
    # |N_eps(v)| >= minPts with v itself included
    core = (
        ids.join(deg, "u", "left")
        .select("u", F.coalesce("nb", F.lit(0)).alias("nb"))
        .withColumn("is_core", F.col("nb") + 1 >= F.lit(min_pts))
    ).localCheckpoint()
    core_ids = core.filter("is_core").select("u")
    cedges = (
        sym.join(core_ids, "u", "left_semi")
        .join(core_ids.withColumnRenamed("u", "v"), "v", "left_semi")
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    comp = connected_components(cedges, "src", "dst").select(
        F.col("node").alias("u"), F.col("component").alias("cluster")
    )
    # isolated cores (no core neighbor) form singleton clusters
    core_clusters = (
        core_ids.join(comp, "u", "left")
        .select("u", F.coalesce("cluster", F.col("u")).alias("cluster"))
        .localCheckpoint()  # consumed by core labels AND the border join
    )
    border = (
        sym.join(
            core_clusters.select(
                F.col("u").alias("v"), F.col("cluster").alias("ccl")
            ),
            "v",
        )
        .groupBy("u")
        .agg(F.min("ccl").alias("cluster"))
    )
    labeled = (
        core.join(border.withColumnRenamed("cluster", "bcl"), "u", "left")
        .join(
            core_clusters.withColumnRenamed("cluster", "ccl2"), "u", "left"
        )
        .select(
            F.col("u").alias(id_col),
            F.when(F.col("is_core"), F.lit("core"))
            .when(F.col("bcl").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.when(F.col("is_core"), F.col("ccl2"))
            .when(F.col("bcl").isNotNull(), F.col("bcl"))
            .otherwise(F.lit(-1))
            .cast("bigint")
            .alias("cluster"),
        )
    )
    return labeled
