"""Similarity search over embedding columns [EXT].

* Brute-force cosine top-k — the correctness baseline. The dot product is
  a single codegen'd ``aggregate(zip_with(...))`` expression over
  ``array<float>`` (cast to double element-wise so accumulation order and
  width match the DuckDB oracle); top-k is ``orderBy().limit(k)`` →
  TakeOrderedAndProject (per-partition heaps, driver merge — no global
  sort even at 10^9 vectors).
* Random-hyperplane LSH — the scale path. Sign-bucket assignment is dense
  linear algebra (vectors × plane matrix), so it runs as an Arrow-batched
  ``pandas_udf``: one BLAS matmul per batch instead of thousands of
  Catalyst expression nodes per row (a 96-plane expression tree was ~100×
  slower to plan AND execute than the matmul). Planes are generated from
  a fixed seed, so the index is reproducible everywhere without storing
  planes. Everything after bucket assignment (guard, self-join, verify)
  stays JVM-side.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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


# ---------------------------------------------------------------- LSH --


def plane_matrix(dim: int, n_planes: int, seed: int = 0) -> np.ndarray:
    """Deterministic (dim × n_planes) hyperplane matrix in [-1, 1)."""
    return np.random.RandomState(seed).uniform(-1.0, 1.0, size=(dim, n_planes))


def _pack_buckets(bits: np.ndarray, num_bands: int, planes_per_band: int) -> np.ndarray:
    """(n, bands*planes) sign bits → (n, bands) integer bucket ids."""
    weights = (1 << np.arange(planes_per_band)).astype(np.int64)
    banded = bits.reshape(bits.shape[0], num_bands, planes_per_band)
    return (banded * weights).sum(axis=2)


def band_buckets_udf(num_bands: int, planes_per_band: int, dim: int, seed: int = 0):
    """Vectorized bucket assignment: pandas_udf returning one bucket id
    per band (``array<long>``). One (batch × dim) · (dim × planes) matmul
    per Arrow batch — the whole index fits in a closure (dim·planes
    doubles), broadcast to executors with the serialized udf."""
    planes = plane_matrix(dim, num_bands * planes_per_band, seed)

    @pandas_udf("array<long>")
    def _buckets(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:  # empty Arrow batch (empty partition at scale)
            return pd.Series([], dtype="object")
        mat = np.stack(emb.to_numpy())[:, :dim].astype(np.float64)
        bits = (mat @ planes) >= 0
        vals = _pack_buckets(bits, num_bands, planes_per_band)
        return pd.Series(list(vals))

    return _buckets


def query_buckets(
    query_vec: list[float], num_bands: int, planes_per_band: int, seed: int = 0
) -> list[int]:
    """Driver-side bucket ids of a single probe vector (same planes)."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = plane_matrix(len(q), num_bands * planes_per_band, seed)
    bits = (q @ planes >= 0).reshape(1, -1)
    return [int(v) for v in _pack_buckets(bits, num_bands, planes_per_band)[0]]


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    num_planes: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Assign each vector a ``num_planes``-bit sign bucket (one family)."""
    udf = band_buckets_udf(1, num_planes, dim, seed)
    return vectors.select(
        F.col(id_col),
        F.col(vec_col),
        udf(F.col(vec_col))[0].alias("bucket"),
    )


def lsh_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Approximate top-k: exact cosine restricted to the probe's LSH
    bucket plus buckets at Hamming distance 1 (multi-probe). The probe's
    buckets are computed driver-side in numpy (1 row — no Spark job)."""
    bucketed = hyperplane_lsh_buckets(vectors, num_planes, dim, id_col, vec_col, seed)
    center = query_buckets(query_vec, 1, num_planes, seed)[0]
    probes = [center] + [center ^ (1 << p) for p in range(num_planes)]
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine(F.col(vec_col), q)
    return (
        bucketed.filter(F.col("bucket").isin(probes))
        .select(F.col(id_col), sim.alias("__sim__"))
        .orderBy(F.col("__sim__").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("__sim__", 6).alias("cosine_sim"))
    )


# ---------------------------------------------------------------- IVF --


def derive_sample_mod(n_rows: int, max_sample: int = 65536) -> int:
    """Hash-sample modulus that caps the expected driver sample at
    ``max_sample`` rows: keep-probability 1/mod, so expected sample size
    is n/mod ≤ max_sample. At n=10^9 this is mod=15258 (~2^14)."""
    return max(1, n_rows // max_sample)


def ivf_train_centroids(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 3,
    sample_mod: int | None = None,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
    max_sample: int = 65536,
) -> np.ndarray:
    """Deterministic (k × dim) IVF centroids: hash-sample rows to the
    driver (xxhash64(id) % sample_mod == 0), then run a few Lloyd
    iterations in NumPy. Training is a driver-side O(sample · k) problem;
    only assignment is distributed.

    ``sample_mod=None`` (the default) derives the modulus from a cheap
    ``count()`` so the driver sample is capped at ~``max_sample`` rows no
    matter the corpus size — at 10^9 vectors that is mod ≈ 2^14 and a
    ~65k sample; callers never get a full-table collect by accident.
    Pass an explicit ``sample_mod`` to override."""
    if sample_mod is None:
        sample_mod = derive_sample_mod(vectors.count(), max_sample)
    sample = (
        vectors.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0)
        .select(vec_col)
        .collect()
    )
    mat = np.array([list(r[0]) for r in sample], dtype=np.float64)[:, :dim]
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(k, len(mat)), replace=False)]
    for _ in range(iters):
        # cosine assignment: normalize then argmax dot
        nm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        nc = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        assign = (nm @ nc.T).argmax(axis=1)
        for j in range(len(cents)):
            members = mat[assign == j]
            if len(members):
                cents[j] = members.mean(axis=0)
    return cents


def ivf_assign(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``cluster_id`` = nearest centroid by cosine. One Arrow-batched
    matmul per batch against the (k × dim) centroid matrix shipped in the
    udf closure — the IVF index build is a single narrow pass, usually
    followed by a write partitioned/bucketed by cluster_id so queries
    prune to their probed clusters at the file level."""
    nc = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    dim = centroids.shape[1]

    @pandas_udf("int")
    def _nearest(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="int32")
        mat = np.stack(emb.to_numpy())[:, :dim].astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return pd.Series((mat @ nc.T).argmax(axis=1).astype("int32"))

    return vectors.select(
        F.col(id_col), F.col(vec_col), _nearest(F.col(vec_col)).alias("cluster_id")
    )


def ivf_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    seed: int = 0,
) -> DataFrame:
    """Approximate top-k via IVF: exact cosine only inside the ``n_probe``
    clusters nearest the query (probed centroids chosen driver-side in
    NumPy). Scans ~n_probe/n_centroids of the data; with the index
    written partitioned by cluster_id, partition pruning makes that a
    file-level skip, not a filter."""
    if centroids is None:
        centroids = ivf_train_centroids(
            vectors,
            k=n_centroids,
            dim=len(query_vec),
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
        )
    indexed = ivf_assign(vectors, centroids, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    nc = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    probes = [int(i) for i in np.argsort(-(q / np.linalg.norm(q)) @ nc.T)[:n_probe]]
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    sim = cosine(F.col(vec_col), qcol)
    return (
        indexed.filter(F.col("cluster_id").isin(probes))
        .select(F.col(id_col), sim.alias("__sim__"))
        .orderBy(F.col("__sim__").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("__sim__", 6).alias("cosine_sim"))
    )


# ----------------------------------------------------------------- PQ --


def pq_train_codebooks(
    vectors: DataFrame,
    n_sub: int = 8,
    k: int = 16,
    iters: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
    max_sample: int = 65536,
) -> np.ndarray:
    """Product-quantization codebooks (n_sub × k × dim/n_sub): split the
    vector into ``n_sub`` subspaces and k-means each independently
    (classic PQ, Jégou et al. 2011 — public method). Training is
    driver-side NumPy on a hash sample capped at ``max_sample`` rows
    (same bound discipline as ivf_train_centroids); the model is
    n_sub·k·sub_dim floats — kilobytes — shipped in UDF closures."""
    sub_dim = dim // n_sub
    mod = derive_sample_mod(vectors.count(), max_sample)
    sample = (
        vectors.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0)
        .select(vec_col)
        .collect()
    )
    mat = np.array([list(r[0]) for r in sample], dtype=np.float64)[:, :dim]
    rng = np.random.RandomState(seed)
    books = np.zeros((n_sub, k, sub_dim))
    for s in range(n_sub):
        x = mat[:, s * sub_dim : (s + 1) * sub_dim]
        cents = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(len(cents)):
                members = x[assign == j]
                if len(members):
                    cents[j] = members.mean(axis=0)
        books[s, : len(cents)] = cents
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress each vector to ``n_sub`` one-byte codes (nearest codeword
    per subspace, L2). One Arrow-batched pandas_udf — per batch, one
    (rows × k) distance matrix per subspace, all NumPy. At 10^9 × 64-dim
    float32 this turns a 256 GB embedding column into 8 GB of codes —
    the difference between an ANN index that fits executor memory and
    one that doesn't."""
    n_sub, k, sub_dim = codebooks.shape
    books = codebooks.copy()

    @pandas_udf("array<int>")
    def _codes(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype="object")
        mat = np.stack(emb.to_numpy())[:, : n_sub * sub_dim].astype(np.float64)
        out = np.empty((len(mat), n_sub), dtype=np.int32)
        for s in range(n_sub):
            x = mat[:, s * sub_dim : (s + 1) * sub_dim]
            # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
            d2 = -2.0 * (x @ books[s].T) + (books[s] ** 2).sum(axis=1)[None, :]
            out[:, s] = d2.argmin(axis=1)
        return pd.Series(list(out))

    return vectors.select(
        F.col(id_col), _codes(F.col(vec_col)).alias("pq_codes")
    )


def pq_adc_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: np.ndarray | None = None,
    seed: int = 0,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation: the query
    stays exact; each corpus vector is its PQ reconstruction, so
    dot(q, x) ≈ Σ_s LUT[s, code_s] where the (n_sub × k) lookup table
    of per-subspace dot products is built driver-side. Scoring a row is
    n_sub table lookups — no vector math touches the corpus at query
    time, which is the entire point of PQ at 10^9 rows. Top-k via
    orderBy(limit) → TakeOrderedAndProject (no global sort)."""
    dim = len(query_vec)
    if codebooks is None:
        codebooks = pq_train_codebooks(
            vectors, n_sub=n_sub, k=n_codes, dim=dim,
            id_col=id_col, vec_col=vec_col, seed=seed,
        )
    n_sub, _, sub_dim = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    lut = np.stack(
        [codebooks[s] @ q[s * sub_dim : (s + 1) * sub_dim] for s in range(n_sub)]
    )  # (n_sub, k) dot products

    codes = pq_encode(vectors, codebooks, id_col, vec_col)

    @pandas_udf("double")
    def _adc(c: pd.Series) -> pd.Series:
        if len(c) == 0:
            return pd.Series([], dtype="float64")
        m = np.stack(c.to_numpy()).astype(np.int64)
        return pd.Series(lut[np.arange(n_sub)[None, :], m].sum(axis=1))

    return (
        codes.select(F.col(id_col), _adc(F.col("pq_codes")).alias("__score__"))
        .orderBy(F.col("__score__").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("__score__", 6).alias("approx_dot"))
    )


def ivfpq_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 3,
    n_sub: int = 8,
    n_codes: int = 16,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """IVF-PQ with exact re-rank — the composition that actually ships
    at 10^9 vectors (FAISS ``IVFx,PQy`` + refine, Jégou et al. 2011,
    public method): a coarse quantizer limits the scan to ``n_probe``
    of ``n_centroids`` inverted lists (compute scale), PQ codes make
    the in-list scoring ``n_sub`` table lookups per row on 8 bytes of
    state (memory scale), and the top ``k*refine`` ADC candidates are
    re-scored with exact cosine so the final ranking error is bounded
    by the candidate set, not the quantization error.

    Plan shape: both model fits are driver-side NumPy on capped hash
    samples (``derive_sample_mod`` — never a full collect); assignment
    and encoding are one Arrow pass each over the probed subset only;
    the refine join is a broadcast of ``k*refine`` ids back onto the
    probed lists, and both top-k's are TakeOrderedAndProject. This
    variant encodes raw vectors (IVF-Flat-PQ); residual encoding
    (x - centroid, classic IVFADC) drops in by replacing ``vec_col``
    with the residual before ``pq_encode`` — same plan, one extra
    ``zip_with`` projection.
    """
    dim = len(query_vec)
    # dim must flow to BOTH model fits: the coarse quantizer and the PQ
    # codebooks have to agree with the query's dimensionality, else
    # non-64-dim embeddings get silently truncated during training.
    centroids = ivf_train_centroids(
        vectors, k=n_centroids, dim=dim, id_col=id_col, vec_col=vec_col, seed=seed
    )
    indexed = ivf_assign(vectors, centroids, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    nc = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    probes = [int(i) for i in np.argsort(-(q / np.linalg.norm(q)) @ nc.T)[:n_probe]]
    cand = indexed.filter(F.col("cluster_id").isin(probes))

    codebooks = pq_train_codebooks(
        vectors, n_sub=n_sub, k=n_codes, dim=dim,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )
    sub_dim = codebooks.shape[2]
    lut = np.stack(
        [codebooks[s] @ q[s * sub_dim : (s + 1) * sub_dim] for s in range(n_sub)]
    )
    codes = pq_encode(cand, codebooks, id_col, vec_col)

    @pandas_udf("double")
    def _adc(c: pd.Series) -> pd.Series:
        if len(c) == 0:
            return pd.Series([], dtype="float64")
        m = np.stack(c.to_numpy()).astype(np.int64)
        return pd.Series(lut[np.arange(n_sub)[None, :], m].sum(axis=1))

    shortlist = (
        codes.select(F.col(id_col), _adc(F.col("pq_codes")).alias("__adc__"))
        .orderBy(F.col("__adc__").desc(), F.col(id_col))
        .limit(k * refine)
        .select(id_col)
    )
    sim = cosine(F.col(vec_col), F.array(*[F.lit(float(v)) for v in query_vec]))
    return (
        cand.join(F.broadcast(shortlist), id_col)
        .select(F.col(id_col), sim.alias("__sim__"))
        .orderBy(F.col("__sim__").desc(), F.col(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("__sim__", 6).alias("cosine_sim"))
    )


def recommended_planes(n_vectors: int, target_bucket_size: int = 64) -> int:
    """Planes-per-band for an expected bucket occupancy: 2^planes buckets
    should exceed n / target_bucket_size, i.e. planes ≈ log2(n/target).
    At 10^9 vectors this gives ~24 planes (not a fixed 12) — bucket
    population stays bounded as n grows, the round-1 scale flaw."""
    if n_vectors <= target_bucket_size:
        return 4
    return max(4, math.ceil(math.log2(n_vectors / target_bucket_size)))


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    num_bands: int = 8,
    planes_per_band: int = 12,
    dim: int = 64,
    max_bucket: int = 1_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH.

    Recall math: a pair at cosine θ-angle collides in one band with
    p = (1 - θ/π)^planes_per_band; across bands 1-(1-p)^num_bands. The
    defaults give ~0.93 recall at cosine 0.95 and ~1.0 at 0.99, while a
    single 12-plane family (round-1 design) gave only ~0.28.

    Scale shape:
    * ONE scan + one Arrow-batched matmul computes all band buckets;
    * the self-join shuffles on (band_id, bucket) — uniformly distributed
      keys; ``planes_per_band`` should scale with log2(n) (see
      ``recommended_planes``) so per-bucket population stays bounded;
    * mega-bucket guard: buckets holding > ``max_bucket`` vectors are
      dropped before the join (a bucket of k yields k² candidate pairs —
      one degenerate bucket at 10^5 would emit 10^10 pairs). Vectors that
      cluster that densely are exact-dup territory: run exact dedup
      first; the guard makes the approximate pass robust to them.
    """
    from etl_pipeline_orchestration_spark.operators.partitioning import (
        ensure_min_partitions,
    )

    vectors = ensure_min_partitions(vectors)
    udf = band_buckets_udf(num_bands, planes_per_band, dim, seed)
    banded = vectors.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(udf(F.col(vec_col))).alias("band_id", "bucket"),
    )
    wb = W.partitionBy("band_id", "bucket")
    guarded = (
        banded.withColumn("__bn__", F.count(F.lit(1)).over(wb))
        .filter(F.col("__bn__") <= max_bucket)
        .drop("__bn__")
    )
    a = guarded.select(
        "band_id", "bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = guarded.select(
        "band_id", "bucket", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    pairs = (
        a.join(b, ["band_id", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sim = cosine(F.col("va"), F.col("vb"))
    return (
        pairs.select("id_a", "id_b", F.round(sim, 6).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def cross_corpus_cosine_pairs(
    corpus: DataFrame,
    bench_rows: list,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (corpus, bench) pairs with cosine >= threshold, EXACT — the
    semantic-decontamination primitive: benchmark suites are small
    (10³-10⁵ vectors), so the bench matrix broadcasts inside an
    Arrow-batched UDF and every corpus batch scores against ALL of it
    in one BLAS matmul. No recall loss (unlike an LSH prefilter), one
    scan of the corpus, zero shuffles before the emit. ``bench_rows``
    is a driver-side list of (id, vector) — the deliberate small-side
    collect, same pattern as the n-gram decontamination broadcast.
    """
    import json

    bench_ids = np.array([r[0] for r in bench_rows], dtype=np.int64)
    bm = np.array([r[1] for r in bench_rows], dtype=np.float64)
    bm_n = bm / np.linalg.norm(bm, axis=1, keepdims=True)

    @pandas_udf("string")
    def matches(vecs: pd.Series) -> pd.Series:
        m = np.array(vecs.tolist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        cos = (m / norms) @ bm_n.T  # (batch, n_bench)
        out = []
        for row in cos:
            hits = np.nonzero(row >= threshold)[0]
            out.append(
                json.dumps(
                    [[int(bench_ids[j]), float(row[j])] for j in hits]
                )
            )
        return pd.Series(out)

    hits = corpus.select(
        F.col(id_col).alias("corpus_id"), matches(F.col(vec_col)).alias("h")
    ).filter(F.col("h") != "[]")
    parsed = hits.select(
        "corpus_id",
        F.explode(
            F.from_json("h", "array<array<double>>")
        ).alias("pair"),
    )
    return parsed.select(
        "corpus_id",
        F.col("pair")[0].cast("bigint").alias("bench_id"),
        (F.round(F.col("pair")[1] * 1e4) / 1e4).alias("cos_4dp"),
    )
