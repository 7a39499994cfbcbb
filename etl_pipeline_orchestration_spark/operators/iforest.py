"""Isolation forest (Liu, Ting & Zhou 2008, public method) for
embedding-outlier pruning — the anomaly gate a curation pipeline runs
before contrastive training or ANN indexing (a handful of corrupt
vectors poison both).

Split of labor (the k-means / classifier discipline):
* DRIVER fit: each tree grows on a deterministic hash-sample of
  ``psi`` vectors (bottom-k by xxhash64(vec_id, tree_seed) — the
  consistent-sampling primitive, so the sample set is reproducible
  and differs per tree), with split dims/thresholds drawn from
  ``random.Random(seed + tree)`` — explicit seeds, bit-reproducible
  across runs and machines. The model is T trees x <=2^(d+1) nodes of
  (dim, threshold) — kilobytes.
* DISTRIBUTED score: one Arrow pass; every tree is traversed
  VECTORIZED (all rows descend together, one numpy gather per level,
  never a per-row python loop). Path length of an early-terminated
  node adds the standard c(n) correction; the anomaly score is the
  textbook 2^(-avg_path/c(psi)).

Determinism: sampling is hash-rank, splits are seeded, traversal is
exact float comparisons — two runs (or two clusters) produce
identical scores, so the planted-outlier tests pin real behavior.
"""

from __future__ import annotations

import math
import random
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _c(n: float) -> float:
    """Average unsuccessful-search path length in a BST of n nodes —
    the iForest normalization constant."""
    if n <= 1:
        return 0.0
    h = math.log(n - 1) + 0.5772156649015329  # harmonic approx
    return 2.0 * h - 2.0 * (n - 1) / n


class _Tree:
    __slots__ = ("dim", "thr", "left", "right", "size")

    def __init__(self):
        self.dim: List[int] = []
        self.thr: List[float] = []
        self.left: List[int] = []
        self.right: List[int] = []
        self.size: List[int] = []  # leaf sample size (0 = internal)

    def _add(self) -> int:
        self.dim.append(-1)
        self.thr.append(0.0)
        self.left.append(-1)
        self.right.append(-1)
        self.size.append(0)
        return len(self.dim) - 1


def _grow(rows, rng: random.Random, max_depth: int) -> _Tree:
    import numpy as np

    t = _Tree()

    def build(idx, depth) -> int:
        node = t._add()
        n = len(idx)
        if depth >= max_depth or n <= 1:
            t.size[node] = max(n, 1)
            return node
        d = rng.randrange(rows.shape[1])
        lo = float(rows[idx, d].min())
        hi = float(rows[idx, d].max())
        if lo == hi:  # constant dim in this cell — leaf out
            t.size[node] = n
            return node
        thr = rng.uniform(lo, hi)
        mask = rows[idx, d] < thr
        t.dim[node] = d
        t.thr[node] = thr
        t.left[node] = build(idx[mask], depth + 1)
        t.right[node] = build(idx[~mask], depth + 1)
        return node

    import numpy as np

    build(np.arange(rows.shape[0]), 0)
    return t


def fit_iforest(
    vecs: DataFrame,
    n_trees: int = 32,
    psi: int = 256,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> List[Tuple[list, list, list, list, list, float]]:
    """Train on deterministic per-tree hash-samples; returns the
    flat-array model [(dim, thr, left, right, size, c_psi)] — a
    driver-side value small enough to close over in the scoring UDF
    (a broadcast variable on a real cluster)."""
    import numpy as np

    from pyspark.sql import Window

    max_depth = max(int(math.ceil(math.log2(max(psi, 2)))), 1)
    # ALL trees' samples in ONE job: explode the tree ids, rank every
    # (tree, row) by its per-tree hash, keep bottom-psi per tree — a
    # single bounded shuffle + one model-sized collect, instead of
    # n_trees separate TakeOrdered jobs (32 driver round-trips).
    trees = F.explode(
        F.sequence(F.lit(0), F.lit(n_trees - 1))
    ).alias("tree")
    wk = Window.partitionBy("tree").orderBy("rk")
    sampled = (
        vecs.select(id_col, vec_col)
        .select(id_col, vec_col, trees)
        .withColumn(
            "rk", F.xxhash64(F.col(id_col), F.lit(seed) + F.col("tree"))
        )
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= psi)
        .select("tree", vec_col)
        .collect()
    )
    by_tree: dict = {}
    for r in sampled:
        by_tree.setdefault(r["tree"], []).append(list(r[vec_col]))
    model = []
    for tree in range(n_trees):
        rows = np.array(by_tree[tree], dtype=np.float64)
        t = _grow(rows, random.Random(seed * 1_000_003 + tree), max_depth)
        model.append(
            (t.dim, t.thr, t.left, t.right, t.size, _c(float(rows.shape[0])))
        )
    return model


def score_iforest(
    vecs: DataFrame,
    model,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, score_micro): anomaly score 2^(-avg_path/c(psi)) frozen
    to integer micro-units. One Arrow pass; per tree the whole batch
    descends level-synchronously (numpy gathers), so scoring cost is
    T x depth vector ops per batch — no per-row python."""
    import numpy as np
    import pandas as pd

    mats = [
        (
            np.array(dim, dtype=np.int64),
            np.array(thr, dtype=np.float64),
            np.array(left, dtype=np.int64),
            np.array(right, dtype=np.int64),
            np.array(size, dtype=np.int64),
            c_psi,
        )
        for dim, thr, left, right, size, c_psi in model
    ]

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            n = X.shape[0]
            total = np.zeros(n)
            for dim, thr, left, right, size, c_psi in mats:
                node = np.zeros(n, dtype=np.int64)
                depth = np.zeros(n)
                active = np.ones(n, dtype=bool)
                while active.any():
                    d = dim[node]
                    internal = active & (d >= 0)
                    if not internal.any():
                        break
                    ii = np.where(internal)[0]
                    go_left = (
                        X[ii, d[internal]] < thr[node[internal]]
                    )
                    nxt = np.where(
                        go_left, left[node[internal]], right[node[internal]]
                    )
                    node[ii] = nxt
                    depth[ii] += 1.0
                    active = active & (dim[node] >= 0)
                # leaf correction: + c(leaf_size)
                leaf_sizes = size[node].astype(np.float64)
                corr = np.array([_c(s) for s in leaf_sizes])
                total += (depth + corr) / max(c_psi, 1e-9)
            avg = total / len(mats)
            s = np.power(2.0, -avg)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "score_micro": np.floor(s * 1e6 + 0.5).astype("int64"),
                }
            )

    return vecs.select(id_col, vec_col).mapInPandas(
        score, schema=f"{id_col} long, score_micro long"
    )
