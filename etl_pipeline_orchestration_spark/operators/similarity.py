"""Similarity search over embedding columns [EXT].

* Brute-force cosine top-k — the correctness baseline. The dot product is
  a single codegen'd ``aggregate(zip_with(...))`` expression over
  ``array<float>`` (cast to double element-wise so accumulation order and
  width match the DuckDB oracle); top-k is ``orderBy().limit(k)`` →
  TakeOrderedAndProject (per-partition heaps, driver merge — no global
  sort even at 10^9 vectors).
* Random-hyperplane LSH — the scale path: h sign-bits from fixed
  pseudo-random hyperplanes bucket the vectors; candidate search touches
  only the probe's bucket (and optionally neighboring buckets by Hamming
  distance). Hyperplanes are derived deterministically from xxhash64 so
  the index is reproducible without storing planes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _as_double(arr: F.Column) -> F.Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: F.Column, b: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: F.Column) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: F.Column, b: F.Column) -> F.Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine(F.col(vec_col), q)
    return (
        vectors.select(F.col(id_col), sim.alias("__sim__"))
        .orderBy(F.col("__sim__").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("__sim__", 6).alias("cosine_sim"))
    )


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    num_planes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector a ``num_planes``-bit sign bucket.

    Plane p's component j is a deterministic pseudo-random value in
    [-1, 1): (xxhash64("plane", p, j) % 2^20) / 2^19 - 1. All JVM-side.
    """
    v = _as_double(F.col(vec_col))
    bucket = None
    for p in range(num_planes):
        plane = F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.lit("plane"), F.lit(p), F.lit(j)), F.lit(2**20)).cast(
                        "double"
                    )
                    / F.lit(float(2**19))
                    - 1.0
                )
                for j in range(dim)
            ]
        )
        bit = F.when(dot(v, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, p)
        bucket = term if bucket is None else bucket.bitwiseOR(term)
    return vectors.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def lsh_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine restricted to the query's LSH
    bucket plus buckets at Hamming distance 1 (multi-probe)."""
    bucketed = hyperplane_lsh_buckets(vectors, num_planes, dim, id_col, vec_col)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    qrow = bucketed.sparkSession.range(1).select(
        F.lit(0).alias("__one__")
    )
    # Compute the query bucket with the same plane family (1-row plan).
    qbucketed = hyperplane_lsh_buckets(
        qrow.select(F.lit(0).alias(id_col), q.alias(vec_col)),
        num_planes,
        dim,
        id_col,
        vec_col,
    )
    probes = qbucketed.select(
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << p))
                    for p in range(num_planes)
                ],
            )
        ).alias("bucket")
    ).distinct()
    sim = cosine(F.col(vec_col), q)
    return (
        bucketed.join(F.broadcast(probes), "bucket")
        .select(F.col(id_col), sim.alias("__sim__"))
        .orderBy(F.col("__sim__").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("__sim__", 6).alias("cosine_sim"))
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: exact
    cosine only within buckets (self-join on bucket — candidates shrink
    exponentially with num_planes)."""
    bucketed = hyperplane_lsh_buckets(vectors, num_planes, dim, id_col, vec_col)
    a = bucketed.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = bucketed.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", F.round(sim, 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )
