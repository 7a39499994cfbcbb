"""Deduplication operators for large text corpora [EXT].

All variants are pure built-in-function plans (no Python in the hot path):

* exact dedup        — hash-groupBy on the normalized text (one shuffle).
* MinHash + LSH      — word-shingle → k independent min-hashes (xxhash64
  with per-hash salt) → band into b buckets → candidate pairs via a
  self-join on (band_id, band_hash) → exact Jaccard verification on the
  candidates only. The band join is the scale path: at 100 TB the
  candidate set is tiny compared to the O(n²) naive pair space, and the
  join shuffles on the band hash, which is uniformly distributed.
* SimHash            — 64-bit fingerprint by majority vote over token-hash
  bits; near-dups = equal fingerprints (or small Hamming distance via
  band-rotation).

xxhash64 is Spark's built-in 64-bit hash (deterministic across runs and
cluster sizes), so every operator here is reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from etl_pipeline_orchestration_spark.operators.partitioning import (
    ensure_min_partitions,
)


def normalized_text(col: str = "text") -> F.Column:
    return F.lower(F.trim(F.col(col)))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical normalized texts; keep the minimum id as canonical."""
    return (
        docs.groupBy(normalized_text(text_col).alias("norm_text"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup_hash(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Same, but grouping on a sha256 of the normalized text — the form
    that scales when texts are long (shuffle 32-byte keys, not documents).
    """
    return (
        docs.groupBy(F.sha2(normalized_text(text_col), 256).alias("text_sha"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def _tokens(text_col: str) -> F.Column:
    return F.split(F.trim(F.col(text_col)), r"\s+")


def _shingles(text_col: str, k: int) -> F.Column:
    """Distinct word k-shingles as strings."""
    toks = _tokens(text_col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """id + array<long> of ``num_hashes`` min-hashes over word shingles.

    Two-level construction: ONE xxhash64 pass turns each shingle *string*
    into a base int64, then family member i re-hashes that fixed-width
    long with a salt (``xxhash64(i, h)``). min over the shingle set
    approximates a uniform permutation minimum. Hashing the
    variable-length string once instead of ``num_hashes`` times removes
    the dominant cost of the old plan; the salted re-hash works on 8-byte
    inputs. (An affine ``a*h+b`` family would be marginally cheaper, but
    it throws on int64 overflow under ANSI sessions — our session.py
    runs ANSI OFF, yet the xxhash64 form keeps the operator portable to
    ANSI-on clusters for free, and the re-hash is not the bottleneck:
    the per-shingle string hash is.)
    """
    sh = _shingles(text_col, shingle_k).alias("__sh__")
    base = F.transform(F.col("__sh__"), lambda s: F.xxhash64(s)).alias("__hs__")

    def _salted(i: int):
        return lambda h: F.xxhash64(F.lit(i), h)

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__hs__"), _salted(i)))
            for i in range(num_hashes)
        ]
    )
    # shingling+hashing is CPU-bound: spread small scans across cores
    docs = ensure_min_partitions(docs)
    return docs.select(F.col(id_col), sh).select(F.col(id_col), base).select(
        F.col(id_col), sig.alias("signature")
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    max_bucket: int = 1_000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH.

    rows = num_hashes // bands per band; a pair collides if any band's
    sub-signature matches exactly. Returns (id_a, id_b, n_bands_matched),
    id_a < id_b.

    Mega-bucket guard: a band hash shared by k docs yields k² intra-bucket
    pairs — shared boilerplate (license headers, templated pages) can put
    10^5 docs in one bucket at corpus scale, i.e. 10^10 pairs from a
    single key. Buckets over ``max_bucket`` are dropped before the
    self-join (the window count shuffles on the same key the join needs,
    so the guard adds no extra shuffle stage). Dense exact-duplicate
    clusters belong to ``exact_dedup``, which should run first.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.col("signature")[b * rows + r] for r in range(rows)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        F.col(id_col), F.explode(band_structs).alias("band")
    ).select(
        F.col(id_col),
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_hash").alias("band_hash"),
    )
    wb = W.partitionBy("band_id", "band_hash")
    banded = (
        banded.withColumn("__bn__", F.count(F.lit(1)).over(wb))
        .filter(F.col("__bn__") <= max_bucket)
        .drop("__bn__")
    )
    left = banded.alias("a")
    right = banded.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_bands_matched"))
    )


def jaccard_verify(
    docs: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs only (the cheap final
    filter after LSH pruning)."""
    sh = ensure_min_partitions(docs).select(
        F.col(id_col), _shingles(text_col, shingle_k).alias("sh")
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        joined.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash: majority vote per bit over the token-hash set.

    Split execution: token hashing stays JVM-side (xxhash64 — the same
    deterministic hash family as every other dedup operator), the 64-bit
    majority vote runs as a vectorized pandas_udf (an expression tree
    doing 64 filter passes over the token array was the slowest per-row
    operator in the repo; numpy counts all 64 bit positions in one
    broadcasted shift). Output values are identical to the pure-
    expression formulation.
    """
    docs = ensure_min_partitions(docs)
    toks = F.array_distinct(_tokens(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    @pandas_udf("long")
    def _vote(hs: pd.Series) -> pd.Series:
        # one batch = one numpy program: concatenate every row's hash
        # array, expand to an (N, 64) bit matrix, and segment-sum per row
        # with add.reduceat — no per-row or per-bit Python loops
        shifts = np.arange(bits, dtype=np.uint64)
        lens = np.fromiter((len(a) for a in hs), dtype=np.int64, count=len(hs))
        out = np.zeros(len(hs), dtype=np.int64)
        nz = lens > 0
        if nz.any():
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in hs[nz]]
            ).view(np.uint64)
            bits_mat = (flat[:, None] >> shifts) & np.uint64(1)
            starts = np.zeros(int(nz.sum()), dtype=np.int64)
            starts[1:] = np.cumsum(lens[nz])[:-1]
            votes = np.add.reduceat(bits_mat, starts, axis=0)
            maj = (votes * 2 > lens[nz, None]).astype(np.uint64)
            out[nz] = (maj << shifts).sum(axis=1).view(np.int64)
        return pd.Series(out)

    return docs.select(F.col(id_col), _vote(hashes).alias("simhash"))


def simhash_near_dup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: split the 64-bit fingerprint into ``bands``
    chunks; any pair within Hamming ``bands - 1`` (so ≤ 3 for 4 bands)
    must match EXACTLY in at least one chunk — candidate generation is an
    equi-self-join per band, never an all-pairs scan. Candidates are then
    verified with ``bit_count(xor) <= max_hamming``. Same mega-bucket
    guard as the other LSH joins.
    """
    if max_hamming >= bands:
        raise ValueError("need max_hamming < bands for the pigeonhole guarantee")
    width = 64 // bands
    mask = (1 << width) - 1
    fps = simhash_fingerprints(docs, id_col, text_col)
    chunks = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.shiftrightunsigned(F.col("simhash"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    banded = fps.select(
        F.col(id_col), F.col("simhash"), F.explode(chunks).alias("c")
    ).select(
        F.col(id_col),
        "simhash",
        F.col("c.band_id").alias("band_id"),
        F.col("c.band_key").alias("band_key"),
    )
    wb = W.partitionBy("band_id", "band_key")
    banded = (
        banded.withColumn("__bn__", F.count(F.lit(1)).over(wb))
        .filter(F.col("__bn__") <= max_bucket)
        .drop("__bn__")
    )
    a = banded.select(
        "band_id", "band_key", F.col(id_col).alias("id_a"), F.col("simhash").alias("fp_a")
    )
    b = banded.select(
        "band_id", "band_key", F.col(id_col).alias("id_b"), F.col("simhash").alias("fp_b")
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def lsh_band_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, band_id, band_hash): the persistable LSH INDEX of a corpus —
    what a production pipeline stores (bucketed by band_hash) so
    tomorrow's batch dedups against years of history without
    re-signaturing it. Identical banding to minhash_lsh_candidates."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_k)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.col("signature")[b * rows + r] for r in range(rows)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(
        F.col(id_col), F.explode(band_structs).alias("band")
    ).select(
        F.col(id_col),
        F.col("band.band_id").alias("band_id"),
        F.col("band.band_hash").alias("band_hash"),
    )


def minhash_incremental_candidates(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    max_bucket: int = 1_000,
) -> DataFrame:
    """Incremental dedup: candidate pairs touching the NEW batch only —
    (new × index) cross-corpus pairs plus (new × new) within-batch
    pairs. The historical corpus is joined through its PRE-BUILT band
    index (``lsh_band_table``), never re-read or re-signatured: daily
    cost scales with the batch, not the archive. The mega-bucket guard
    counts over the COMBINED table, so guarded output equals exactly
    what a full-corpus run would emit for these pairs (equivalence is
    pinned by tests/test_dedup_similarity.py)."""
    new_bands = lsh_band_table(
        new_docs, id_col, text_col, num_hashes, bands, shingle_k
    ).withColumn("__new__", F.lit(True))
    combined = index.withColumn("__new__", F.lit(False)).unionByName(new_bands)
    wb = W.partitionBy("band_id", "band_hash")
    combined = (
        combined.withColumn("__bn__", F.count(F.lit(1)).over(wb))
        .filter(F.col("__bn__") <= max_bucket)
        .drop("__bn__")
    )
    a = combined.filter("__new__").alias("a")
    b = combined.alias("b")
    pair_a = F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}"))
    pair_b = F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}"))
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (
                # new×old in any order, new×new counted once
                (~F.col("b.__new__") )
                | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            )
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .groupBy(pair_a.alias("id_a"), pair_b.alias("id_b"))
        .agg(F.countDistinct("a.band_id").alias("n_bands_matched"))
    )


def jaccard_all_pairs_prefix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.4,
) -> DataFrame:
    """EXACT n-gram-Jaccard similarity join via prefix filtering (PPJoin-lite).

    Unlike MinHash-LSH (probabilistic recall), this returns *every* pair
    with shingle-Jaccard >= threshold, yet never materializes the O(n²)
    pair space. The prefix-filter principle: order every document's
    shingle set by one global total order (ascending document frequency,
    rarest first); two sets with Jaccard >= t MUST share at least one
    shingle among each one's first ``n - ceil(t*n) + 1`` elements. So the
    candidate self-join runs on prefix tokens only — and because prefixes
    are the RAREST shingles, bucket sizes in that join are tiny (the
    common-shingle mega-buckets that plague naive token joins are pruned
    away by construction).

    Plan shape (one pass over the corpus, three shuffles):
      1. shingle sets (per-row expression, no shuffle)
      2. global shingle document-frequency (shuffle on shingle)
      3. per-doc frequency rank -> prefix (shuffle on doc id)
      4. candidate pairs = prefix self-join on shingle (shuffle on the
         rare prefix shingles), distinct
      5. exact verify: rejoin the full sorted sets by id, Jaccard from
         array_intersect — candidate count << pair space, so the array
         shuffle is proportional to matches, not to n².

    The prefix length uses exact integer arithmetic (ceil(a*n/b) =
    (a*n + b - 1) div b) — a float ceil could round UP on values like
    0.4*5 = 2.0000000000000004 and silently shorten the prefix, which
    would break the exactness guarantee.

    Scale note: step 5 shuffles the shingle arrays of candidate docs
    only. Against adversarial corpora where everything matches
    everything, cap candidates per doc upstream (quality-gate first);
    for typical web corpora the prefix join output is ~O(matches).
    """
    from fractions import Fraction

    frac = Fraction(threshold).limit_denominator(10_000)
    t_num, t_den = frac.numerator, frac.denominator

    base = ensure_min_partitions(docs).filter(
        F.size(_tokens(text_col)) >= F.lit(shingle_k)
    )
    # Three consumers (token pipeline + both verify sides) and NO shared
    # shuffle between them — without materialization the CPU-dominant
    # shingling runs three times (ReusedExchange can't help a narrow
    # plan; measured ~18% off the query at sf0.1). At cluster scale use
    # persist(DISK_ONLY) if replayability on executor loss matters.
    sets = base.select(
        F.col(id_col).alias("id"), _shingles(text_col, shingle_k).alias("sh")
    ).localCheckpoint(eager=True)
    tok = sets.select("id", F.explode("sh").alias("s"))
    freq = tok.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w_rank = W.partitionBy("id").orderBy("df", "s")
    ranked = (
        tok.join(freq, "s")
        .withColumn("pos", F.row_number().over(w_rank))
        .withColumn("n", F.count(F.lit(1)).over(W.partitionBy("id")))
    )
    # prefix length = n - ceil(t*n) + 1, exact in integers
    ceil_tn = (F.lit(t_num) * F.col("n") + F.lit(t_den - 1)) / F.lit(t_den)
    prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.floor(ceil_tn).cast("long") + F.lit(1)
    ).select("id", "s", "pos", "n")

    # Two further exact prunes at candidate time (both integer
    # arithmetic, neither can drop a qualifying pair):
    #  * size-ratio: J >= t  =>  t * max(n_a, n_b) <= min(n_a, n_b)
    #  * positional (PPJoin): a shared prefix token at positions
    #    (pa, pb) bounds the overlap by min(n_a - pa, n_b - pb) + 1,
    #    which must reach ceil(t/(1+t) * (n_a + n_b)); a qualifying
    #    pair always passes on at least one shared prefix token.
    na, nb = F.col("a.n"), F.col("b.n")
    size_ok = F.lit(t_num) * F.greatest(na, nb) <= F.lit(t_den) * F.least(na, nb)
    need = F.floor(
        (F.lit(t_num) * (na + nb) + F.lit(t_num + t_den - 1))
        / F.lit(t_num + t_den)
    ).cast("long")
    bound = (
        F.least(na - F.col("a.pos"), nb - F.col("b.pos")) + F.lit(1)
    ).cast("long")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "s")
        .filter((F.col("a.id") < F.col("b.id")) & size_ok & (bound >= need))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = sets.select(
        F.col("id").alias("id_a"),
        F.col("sh").alias("sh_a"),
        F.size("sh").cast("long").alias("n_a"),
    )
    sb = sets.select(
        F.col("id").alias("id_b"),
        F.col("sh").alias("sh_b"),
        F.size("sh").cast("long").alias("n_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    jacc = inter.cast("double") / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_a",
            "n_b",
            inter.alias("intersect_size"),
            jacc.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


# Cross-engine MinHash constants: base-131 char fold mod the Mersenne
# prime 2^31-1 (the winnowing/doc_fingerprints_poly hash), and an
# affine permutation family (a_i*h + b_i) mod p whose products stay
# under 2^62 — int64-safe under ANSI sessions on BOTH engines.
XENGINE_P = 2147483647


def xengine_affine(num_hashes: int) -> list[tuple[int, int]]:
    return [
        ((2654435761 * (i + 1)) % XENGINE_P, (40503 * i + 9973) % XENGINE_P)
        for i in range(num_hashes)
    ]


def minhash_lsh_pairs_crossengine(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    max_bucket: int = 1_000,
    threshold: float = 0.4,
) -> DataFrame:
    """The FULL MinHash-LSH pipeline — signatures, banding, mega-bucket
    guard, candidate join, exact-Jaccard verify — built on the
    cross-engine polynomial hash instead of xxhash64, so every stage is
    replayable in SQL and the ENTIRE pipeline is oracle-verifiable by
    value (the xxhash64 sibling ``minhash_lsh_candidates`` is stronger
    per-bit and stays the production path, but can only be
    rows-checked). Same trade as doc_fingerprints_poly vs
    doc_fingerprints.

    Output: (id_a, id_b, n_bands_matched, intersect_size, n_a, n_b,
    jaccard) for verified pairs with Jaccard >= ``threshold`` —
    all-integer except the single int/int division, which is
    bit-identical across engines.

    Plan shape is the production one: per-row codegen'd folds (no
    UDF), one explode to the (band, hash) relation, the windowed
    mega-bucket guard on the join key's own shuffle, the bucket
    self-join, and a candidates-only verify join — nothing all-pairs.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    ab = xengine_affine(num_hashes)
    p = F.lit(XENGINE_P)

    base = ensure_min_partitions(docs).filter(
        F.size(_tokens(text_col)) >= F.lit(shingle_k)
    )
    sets = base.select(
        F.col(id_col).alias("id"), _shingles(text_col, shingle_k).alias("sh")
    ).localCheckpoint()  # three consumers (sigs, tok, sz); narrow plan

    def charfold(s):
        return F.aggregate(
            F.filter(F.split(s, ""), lambda c: c != F.lit("")),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * 131 + F.ascii(c)) % p,
        )

    hs = sets.select("id", F.transform("sh", charfold).alias("hv"))

    def _perm(a: int, b: int):
        # factory closure: PySpark inspects the lambda's arity, so
        # capturing (a, b) via default args would read as a 3-arg HOF
        return lambda h: (F.lit(a) * h + F.lit(b)) % p

    sigs = hs.select(
        "id",
        *[
            F.array_min(F.transform("hv", _perm(a, b))).alias(f"s{i}")
            for i, (a, b) in enumerate(ab)
        ],
    )
    band_structs = []
    for bi in range(bands):
        bh = F.lit(0).cast("long")
        for r in range(rows):
            bh = (bh * 131 + F.col(f"s{bi * rows + r}")) % p
        band_structs.append(
            F.struct(F.lit(bi).alias("band_id"), bh.alias("band_hash"))
        )
    banded = sigs.select(
        "id", F.explode(F.array(*band_structs)).alias("b")
    ).select("id", F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash"))
    wb = W.partitionBy("band_id", "band_hash")
    banded = (
        banded.withColumn("__bn__", F.count(F.lit(1)).over(wb))
        .filter(F.col("__bn__") <= max_bucket)
        .drop("__bn__")
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands_matched"))
    )
    tok = sets.select(F.col("id"), F.explode("sh").alias("s"))
    sz = sets.select("id", F.size("sh").alias("n"))
    inter = (
        cand.join(tok.alias("ta"), F.col("id_a") == F.col("ta.id"))
        .join(
            tok.alias("tb"),
            (F.col("id_b") == F.col("tb.id")) & (F.col("ta.s") == F.col("tb.s")),
        )
        .groupBy("id_a", "id_b", "n_bands_matched")
        .agg(F.count(F.lit(1)).alias("intersect_size"))
    )
    jac = F.col("intersect_size").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("intersect_size")
    )
    return (
        inter.join(sz.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), "id_a")
        .join(sz.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")), "id_b")
        .select(
            "id_a", "id_b",
            F.col("n_bands_matched").cast("bigint").alias("n_bands_matched"),
            F.col("intersect_size").cast("bigint").alias("intersect_size"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
    )


#: Cross-engine simhash band layout over the 31-bit fold hash:
#: (offset, width) — pigeonhole over 4 bands proves hamming <= 3 pairs
#: share at least one exact band.
XENGINE_SIMHASH_BANDS = ((0, 8), (8, 8), (16, 8), (24, 7))


def simhash_crossengine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 10_000,
) -> DataFrame:
    """SimHash near-dup pairs on the CROSS-ENGINE hash: 31-bit base-131
    char folds per token (multiset-weighted, classic simhash), majority
    vote per bit, pigeonhole banding over (8,8,8,7)-bit chunks, exact
    ``bit_count(xor)`` verify — every stage integer arithmetic both
    engines evaluate identically, so the whole pipeline is
    hash-verifiable by value (the xxhash64 sibling
    ``simhash_near_dup_pairs`` is the stronger production path, rows-
    checked + planted-truth-tested). Bit convention: bit j set iff the
    signed bit-j sum is STRICTLY positive (ties at 0 -> 0)."""
    p = F.lit(XENGINE_P)
    toks = (
        ensure_min_partitions(docs)
        .select(F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
    )
    h = F.aggregate(
        F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit("")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 131 + F.ascii(c)) % p,
    )
    t = toks.select("id", h.alias("h"))
    per_doc = t.groupBy("id").agg(
        *[
            F.sum(F.expr(f"((h >> {j}) & 1) * 2 - 1")).alias(f"b{j}")
            for j in range(31)
        ]
    )
    fp = F.lit(0).cast("long")
    for j in range(31):
        fp = fp + F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
    fps = per_doc.select("id", fp.alias("fp"))
    chunks = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band_id"),
                F.expr(f"(fp >> {off}) & {(1 << width) - 1}").alias("band_key"),
            )
            for bi, (off, width) in enumerate(XENGINE_SIMHASH_BANDS)
        ]
    )
    banded = fps.select("id", "fp", F.explode(chunks).alias("c")).select(
        "id", "fp",
        F.col("c.band_id").alias("band_id"),
        F.col("c.band_key").alias("band_key"),
    )
    wb = W.partitionBy("band_id", "band_key")
    banded = (
        banded.withColumn("__bn__", F.count(F.lit(1)).over(wb))
        .filter(F.col("__bn__") <= max_bucket)
        .drop("__bn__")
    )
    a = banded.select("band_id", "band_key", F.col("id").alias("id_a"), F.col("fp").alias("fp_a"))
    b = banded.select("band_id", "band_key", F.col("id").alias("id_b"), F.col("fp").alias("fp_b"))
    return (
        a.join(b, ["band_id", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.col("fp_a").bitwiseXOR(F.col("fp_b")).alias("x"))
        .distinct()
        .select("id_a", "id_b", F.bit_count("x").cast("bigint").alias("hamming"))
        .filter(F.col("hamming") <= F.lit(max_hamming))
    )
