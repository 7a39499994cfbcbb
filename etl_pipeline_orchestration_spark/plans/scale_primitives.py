"""Scale-primitive queries [EXT]: the distributed building blocks a
100 TB curation pipeline leans on where the naive single-node idiom
(one global sort, one unbounded hash table, one giant window) stops
working.

* ``heavy_hitters_topk`` — exact global top-k tokens under bounded
  task memory via per-partition Misra–Gries candidates + exact
  verify (operators/frequent.py has the guarantee argument).
* ``global_contiguous_ids_docs`` — contiguous 0..n-1 ids in key order
  WITHOUT a single-partition window: range-bucket the key on sampled
  quantile boundaries, count per bucket (tiny shuffle), prefix-sum the
  bucket offsets (B rows), then a per-bucket window adds the offset.
  The classic distributed row_number; every stage is parallel across
  buckets. Correctness does not depend on where the sampled boundaries
  land — any monotone bucketing yields the identical ids, boundaries
  only balance the work.
* ``hard_negative_mining`` — contrastive-training data prep: for each
  probe embedding, the most-similar vectors of a DIFFERENT label with
  cosine below the near-dup band (too-similar items are likely
  positives/duplicates, not negatives). Cosine is the same codegen'd
  sequential fold as embedding_topk_bruteforce so the oracle matches
  bit-for-bit before the 6dp display rounding.

Reference scope: the reference pipeline (etl_pipeline.py:176-318) has
none of these; they extend the engine for LLM-data workloads per the
build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.operators import frequent, similarity
from etl_pipeline_orchestration_spark.plans.registry import query
from etl_pipeline_orchestration_spark.sources.tables import load_table

_HH_CAPACITY = 4096
_HH_K = 20


@query(
    "heavy_hitters_topk",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    c AS (
      SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok)
    SELECT CAST(rank AS INT) AS rank, token, cnt FROM (
      SELECT token, cnt,
             row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank
      FROM c, tot
      WHERE cnt * {_HH_CAPACITY + 1} > n
    )
    WHERE rank <= {_HH_K}
    """,
)
def heavy_hitters_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-wide top-{k} tokens with bounded-memory candidate
    generation (Misra–Gries capacity {m}) + exact verify. The oracle is
    the NAIVE full group-by with the same guarantee floor — identical
    output by the superset theorem, so the hash check certifies the
    sketch path end-to-end. The final rank window runs over ≤ m rows
    (only counts above N/(m+1) survive, and at most m values can
    exceed that floor), so its single partition is size-bounded by
    construction, not by luck."""
    docs = load_table(spark, sf_dir, "documents")
    return frequent.exact_heavy_hitters(docs, capacity=_HH_CAPACITY, k=_HH_K)


_ID_BUCKETS = 32


def assign_contiguous_ids_ordered(
    df: DataFrame,
    order_cols: list[str],
    proj: F.Column,
    n_buckets: int = _ID_BUCKETS,
    id_col: str = "global_id",
    bounds: list[int] | None = None,
) -> DataFrame:
    """Contiguous 0..n-1 ids in ``order_cols`` lexicographic order
    (rows must be unique under that order) without a global
    single-partition window. ``proj`` is any NUMERIC, MONOTONE
    COARSENING of the order (equal-order rows must project equal;
    order must never invert) — it exists only to bucket the work; the
    within-bucket sort uses the true ``order_cols``. Plan shape:
    (1) approx_percentile samples B-1 boundary values of ``proj`` (one
    scalar-sized collect); (2) a codegen'd fold over the literal
    boundary array assigns each row its bucket; (3) per-bucket counts
    shuffle B rows; (4) the exclusive prefix sum over those B rows is
    the only single-partition step (B rows); (5) a broadcast join
    attaches offsets and a window PARTITIONED BY BUCKET (parallel
    across buckets, each a bounded range) adds the local row_number.
    At 10^12 rows every stage stays bounded: no task ever sees more
    than one bucket's rows. Correct for ANY boundary placement
    (monotone bucketing + exact offsets); boundaries only balance the
    work, and a coarse ``proj`` (heavy duplication) only skews it.

    ``bounds``: explicit boundary values, skipping the percentile scan
    — correct for ANY placement, so callers whose projection is known
    near-uniform (dense ranks over [0, n]) pass equal-width bounds and
    save one full pass per call (the suffix-array rounds measured
    ~30% of their wall in boundary scans)."""
    with_p = df.withColumn("__proj", proj)
    if bounds is None:
        fracs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
        bounds = with_p.agg(
            F.expr(f"approx_percentile(__proj, array({fracs}), 10000)")
        ).first()[0]
    # Distinct boundaries only (duplicate quantiles on skewed keys
    # would create empty buckets — harmless, but smaller literals win).
    uniq = sorted({int(b) for b in bounds})
    barr = F.array(*[F.lit(b) for b in uniq])
    bucket = F.aggregate(
        barr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col("__proj") > b, 1).otherwise(0),
    )
    with_b = with_p.withColumn("__bucket", bucket)
    counts = with_b.groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("__n_rows")
    )
    # Exclusive prefix sum over B rows — the lone SinglePartition
    # exchange in the plan, bounded at B rows by construction.
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__bucket",
        F.coalesce(F.sum("__n_rows").over(w_off), F.lit(0)).alias("__offset"),
    )
    w_local = Window.partitionBy("__bucket").orderBy(*order_cols)
    return (
        with_b.join(F.broadcast(offsets), "__bucket")
        .select(
            *df.columns,
            (
                F.col("__offset") + F.row_number().over(w_local) - 1
            ).cast("bigint").alias(id_col),
        )
    )


def assign_contiguous_ids(
    df: DataFrame,
    key_col: str,
    n_buckets: int = _ID_BUCKETS,
    id_col: str = "global_id",
) -> DataFrame:
    """Contiguous 0..n-1 ids in ``key_col`` order (keys must be unique
    numerics) — see ``assign_contiguous_ids_ordered`` for the
    distributed plan shape (here the key is its own projection)."""
    return assign_contiguous_ids_ordered(
        df, [key_col], F.col(key_col), n_buckets=n_buckets, id_col=id_col
    )


@query(
    "global_contiguous_ids_docs",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT)
             AS global_id
    FROM documents
    """,
)
def global_contiguous_ids_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous global ids over documents in doc_id order — see
    assign_contiguous_ids for the distributed row_number plan shape."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return assign_contiguous_ids(docs, "doc_id")


_HN_QUERIES = 5
_HN_K = 5
_HN_BAND_MAX = 0.9


@query(
    "hard_negative_mining",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe, label AS qlabel
      FROM embeddings WHERE vec_id < {_HN_QUERIES}
    ),
    dots AS (
      SELECT q.query_id, e.vec_id, e.label,
             sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(q.qe[t.i] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[t.i] AS DOUBLE)
                           * CAST(e.embedding[t.i] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[t.i] AS DOUBLE)
                             * CAST(q.qe[t.i] AS DOUBLE)))) AS cosine
      FROM embeddings e, q, (SELECT unnest(range(1, 65)) AS i) t
      WHERE e.label <> q.qlabel
      GROUP BY q.query_id, e.vec_id, e.label
    )
    SELECT query_id, vec_id, label,
           round(cosine, 6) AS cosine_sim
    FROM (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY cosine DESC, vec_id ASC) AS rn
      FROM dots WHERE cosine < {_HN_BAND_MAX}
    )
    WHERE rn <= {_HN_K}
    """,
)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe
    vector (vec_id < {Q}), the top-{k} most-similar embeddings whose
    LABEL differs and whose cosine sits below the near-dup band
    ({band} — anything above is a likely unlabeled positive or
    duplicate, poison for a contrastive loss). The probe set is a
    scalar-sized collect; candidates fan out via one exploded literal
    array of probe structs (narrow, no join), cosine is the codegen'd
    sequential fold from operators/similarity.py (matches the oracle's
    summation order exactly), and the final per-probe top-k is a
    window over Q keys. At 10^9 vectors the window input would first
    be cut by the ANN index (similarity.ivf_topk) — this query is the
    exact-semantics baseline the index variant is graded against."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = (
        emb.filter(F.col("vec_id") < _HN_QUERIES)
        .select("vec_id", "embedding", "label")
        .collect()
    )
    probe_arr = F.array(
        *[
            F.struct(
                F.lit(int(r["vec_id"])).alias("query_id"),
                F.lit(int(r["label"])).alias("qlabel"),
                F.array(
                    *[F.lit(float(v)) for v in r["embedding"]]
                ).alias("qe"),
            )
            for r in probes
        ]
    )
    fanned = (
        emb.select("vec_id", "label", "embedding", F.explode(probe_arr).alias("p"))
        .filter(F.col("label") != F.col("p.qlabel"))
        .select(
            F.col("p.query_id").alias("query_id"),
            "vec_id",
            "label",
            similarity.cosine(F.col("embedding"), F.col("p.qe")).alias("cosine"),
        )
        .filter(F.col("cosine") < F.lit(_HN_BAND_MAX))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        fanned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _HN_K)
        .select(
            "query_id",
            "vec_id",
            "label",
            F.round(F.col("cosine"), 6).alias("cosine_sim"),
        )
    )


# ------------------------------------------------------------------ MMR --

_MMR_QUERIES = 4  # probe vectors: vec_id < 4
_MMR_POOL = 16  # relevance top-C candidate pool per probe
_MMR_K = 6  # diversified results per probe


def _mmr_oracle() -> str:
    """Unrolled greedy MMR rounds (the quality_classifier_train
    precedent: iteration replayed as CTE stages so the hash certifies
    every selection, not just the final set)."""
    rounds = []
    sels = []
    rounds.append(
        """
    r1 AS MATERIALIZED (
      SELECT query_id, vec_id, rel AS score, 1 AS rank FROM (
        SELECT query_id, vec_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, vec_id ASC) AS rn
        FROM cand) WHERE rn = 1
    ),
    sel1 AS MATERIALIZED (SELECT query_id, vec_id FROM r1)"""
    )
    for t in range(2, _MMR_K + 1):
        rounds.append(
            f"""
    scored{t} AS MATERIALIZED (
      SELECT c.query_id, c.vec_id, c.rel - ms.m AS score
      FROM cand c
      JOIN (SELECT s.query_id, s.ia, max(s.sim) AS m
            FROM sims s JOIN sel{t - 1} p
              ON p.query_id = s.query_id AND p.vec_id = s.ib
            GROUP BY s.query_id, s.ia) ms
        ON ms.query_id = c.query_id AND ms.ia = c.vec_id
      WHERE NOT EXISTS (SELECT 1 FROM sel{t - 1} p2
                        WHERE p2.query_id = c.query_id
                          AND p2.vec_id = c.vec_id)
    ),
    r{t} AS MATERIALIZED (
      SELECT query_id, vec_id, score, {t} AS rank FROM (
        SELECT query_id, vec_id, score,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, vec_id ASC) AS rn
        FROM scored{t}) WHERE rn = 1
    ),
    sel{t} AS MATERIALIZED (SELECT query_id, vec_id FROM sel{t - 1}
               UNION ALL SELECT query_id, vec_id FROM r{t})"""
        )
        sels.append(t)
    union = " UNION ALL ".join(
        f"SELECT * FROM r{t}" for t in range(1, _MMR_K + 1)
    )
    return f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe
      FROM embeddings WHERE vec_id < {_MMR_QUERIES}
    ),
    rels AS (
      SELECT q.query_id, e.vec_id,
             sum(CAST(e.embedding[t.i] AS DOUBLE) * CAST(q.qe[t.i] AS DOUBLE))
               / (sqrt(sum(CAST(e.embedding[t.i] AS DOUBLE)
                           * CAST(e.embedding[t.i] AS DOUBLE)))
                  * sqrt(sum(CAST(q.qe[t.i] AS DOUBLE)
                             * CAST(q.qe[t.i] AS DOUBLE)))) AS rel
      FROM embeddings e, q, (SELECT unnest(range(1, 65)) AS i) t
      WHERE e.vec_id <> q.query_id
      GROUP BY q.query_id, e.vec_id
    ),
    cand AS MATERIALIZED (
      SELECT query_id, vec_id, rel FROM (
        SELECT query_id, vec_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, vec_id ASC) AS rn
        FROM rels) WHERE rn <= {_MMR_POOL}
    ),
    sims AS MATERIALIZED (
      SELECT a.query_id, a.vec_id AS ia, b.vec_id AS ib,
             sum(CAST(ea.embedding[t.i] AS DOUBLE)
                 * CAST(eb.embedding[t.i] AS DOUBLE))
               / (sqrt(sum(CAST(ea.embedding[t.i] AS DOUBLE)
                           * CAST(ea.embedding[t.i] AS DOUBLE)))
                  * sqrt(sum(CAST(eb.embedding[t.i] AS DOUBLE)
                             * CAST(eb.embedding[t.i] AS DOUBLE)))) AS sim
      FROM cand a
      JOIN cand b ON b.query_id = a.query_id AND b.vec_id <> a.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
      GROUP BY a.query_id, a.vec_id, b.vec_id
    ),{",".join(rounds)}
    SELECT query_id, CAST(rank AS INT) AS rank, vec_id,
           round(score, 6) AS mmr_score
    FROM ({union})
    """


@query("mmr_diverse_rerank", oracle=_mmr_oracle())
def mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance reranking (Carbonell & Goldstein
    1998, public method): for each probe vector, take the relevance
    top-{C} candidate pool, then greedily select {K} results where
    each pick maximizes rel(c) - max_{{s in selected}} sim(c, s) —
    relevance minus redundancy at lambda = 1/2 (scores scaled by 2,
    which preserves the argmax). The standard diversification pass
    between ANN retrieval and a context window.

    Determinism: relevance and pairwise similarity use the codegen'd
    sequential-fold cosine (bit-identical to the oracle's index-order
    sums — the hard_negative_mining precedent); the greedy loop does
    NO new float math beyond one subtraction and max-selection, both
    IEEE-identical in Python and DuckDB; ties break on vec_id
    ascending. The oracle unrolls all {K} greedy rounds as CTE stages,
    so the hash certifies every selection, not just the final set.

    100 TB shape: the pool is the scale cut — at 10^9 vectors the
    rels stage is replaced by the ANN index (similarity.ivf_topk) and
    everything downstream is unchanged: pairwise sims are
    per-query C^2 = {C}^2 rows (bounded by construction), and the
    greedy loop runs inside ONE applyInPandas group per probe —
    sequential per query, parallel across the thousands of queries a
    batch rerank serves. The driver sees only the probe vectors.
    Display rounding is 6dp with measured margins (min |frac-0.5|
    over both SFs: 5.5e-3 — dwarfs any ulp divergence); the oracle's
    round CTEs are MATERIALIZED, since inlining the sel-chain
    re-expands the sims subtree exponentially in K (13.5 s -> 0.2 s
    oracle-side)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = (
        emb.filter(F.col("vec_id") < _MMR_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    probe_arr = F.array(
        *[
            F.struct(
                F.lit(int(r["vec_id"])).alias("query_id"),
                F.array(*[F.lit(float(v)) for v in r["embedding"]]).alias("qe"),
            )
            for r in probes
        ]
    )
    rels = (
        emb.select("vec_id", "embedding", F.explode(probe_arr).alias("p"))
        .filter(F.col("vec_id") != F.col("p.query_id"))
        .select(
            F.col("p.query_id").alias("query_id"),
            "vec_id",
            "embedding",
            similarity.cosine(F.col("embedding"), F.col("p.qe")).alias("rel"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("vec_id"))
    cand = (
        rels.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _MMR_POOL)
        .select("query_id", "vec_id", "embedding", "rel")
        .localCheckpoint()  # consumed 3x below with different prunings
    )
    a, b = cand.alias("a"), cand.alias("b")
    sims = (
        a.join(
            b,
            (F.col("a.query_id") == F.col("b.query_id"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.query_id").alias("query_id"),
            F.col("a.vec_id").alias("ia"),
            F.col("b.vec_id").alias("ib"),
            similarity.cosine(F.col("a.embedding"), F.col("b.embedding")).alias(
                "val"
            ),
        )
    )
    rel_rows = cand.select(
        "query_id",
        F.col("vec_id").alias("ia"),
        F.lit(None).cast("bigint").alias("ib"),
        F.col("rel").alias("val"),
    )
    both = sims.unionByName(rel_rows)

    def greedy(pdf):
        import pandas as pd

        qid = int(pdf["query_id"].iloc[0])
        rels_d = {}
        sims_d = {}
        for r in pdf.itertuples(index=False):
            if pd.isna(r.ib):
                rels_d[int(r.ia)] = float(r.val)
            else:
                sims_d[(int(r.ia), int(r.ib))] = float(r.val)
        selected: list[int] = []
        out = []
        remaining = sorted(rels_d)
        for rank in range(1, _MMR_K + 1):
            best_id = None
            best_sc = None
            for c in remaining:  # ascending id: strict > keeps lowest on ties
                ms = max((sims_d[(c, s)] for s in selected), default=0.0)
                sc = rels_d[c] - ms
                if best_sc is None or sc > best_sc:
                    best_id, best_sc = c, sc
            selected.append(best_id)
            remaining.remove(best_id)
            out.append((qid, rank, best_id, best_sc))
        return pd.DataFrame(
            out, columns=["query_id", "rank", "vec_id", "mmr_score"]
        )

    picked = both.groupBy("query_id").applyInPandas(
        greedy, "query_id bigint, rank int, vec_id bigint, mmr_score double"
    )
    return picked.select(
        "query_id", "rank", "vec_id", F.round("mmr_score", 6).alias("mmr_score")
    )


# ---------------------------------------------------------------------------
# Bloom-filter join pruning
# ---------------------------------------------------------------------------

_BLOOM_K = 4  # Kirsch-Mitzenmacher double-hash probe count


@query(
    "bloom_join_prune_audit",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT o_orderkey AS key FROM orders
      WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995
    ),
    sized AS (
      SELECT CAST(count(*) AS BIGINT) AS n_dim,
             CAST(greatest((16 * count(*) + 31) // 32, 1) AS BIGINT)
               AS n_words,
             CAST(greatest((16 * count(*) + 31) // 32, 1) * 32 AS BIGINT)
               AS m_bits
      FROM dim
    ),
    pos AS (
      SELECT ((key * 2654435761) % 2147483647
              + t.i * ((key * 40503) % 2147483629 + 1)) % m_bits AS pos
      FROM dim, sized, unnest(range(0, 4)) AS t(i)
    ),
    grouped AS (
      SELECT pos // 32 AS word,
             bit_or(1::BIGINT << CAST(pos % 32 AS INT)) AS w
      FROM pos GROUP BY 1
    ),
    dense AS (
      SELECT r.word, COALESCE(g.w, 0) AS w
      FROM (SELECT unnest(range(0, n_words)) AS word FROM sized) r
      LEFT JOIN grouped g USING (word)
    ),
    bloom AS (
      SELECT list(w ORDER BY word) AS arr,
             CAST(sum(bit_count(w)) AS BIGINT) AS bits_set
      FROM dense
    ),
    mk AS (
      SELECT l.l_orderkey AS key, b.arr, s.m_bits, s.n_dim, b.bits_set,
             (l.l_orderkey * 2654435761) % 2147483647 AS g1,
             (l.l_orderkey * 40503) % 2147483629 + 1 AS g2
      FROM lineitem l, bloom b, sized s
    ),
    hits AS (
      SELECT key, n_dim, m_bits, bits_set,
        (((arr[CAST(((g1 + 0 * g2) % m_bits) // 32 AS INT) + 1]
           >> CAST(((g1 + 0 * g2) % m_bits) % 32 AS INT)) & 1) = 1
         AND ((arr[CAST(((g1 + 1 * g2) % m_bits) // 32 AS INT) + 1]
           >> CAST(((g1 + 1 * g2) % m_bits) % 32 AS INT)) & 1) = 1
         AND ((arr[CAST(((g1 + 2 * g2) % m_bits) // 32 AS INT) + 1]
           >> CAST(((g1 + 2 * g2) % m_bits) % 32 AS INT)) & 1) = 1
         AND ((arr[CAST(((g1 + 3 * g2) % m_bits) // 32 AS INT) + 1]
           >> CAST(((g1 + 3 * g2) % m_bits) % 32 AS INT)) & 1) = 1) AS hit
      FROM mk
    ),
    truth AS (
      SELECT h.*, (d.key IS NOT NULL) AS is_true
      FROM hits h LEFT JOIN dim d USING (key)
    )
    SELECT
      CAST(max(n_dim) AS BIGINT) AS n_dim,
      CAST(max(m_bits) AS BIGINT) AS m_bits,
      CAST(max(bits_set) AS BIGINT) AS bits_set,
      CAST(count(*) AS BIGINT) AS n_fact,
      CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
      CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT)
        AS n_true_match,
      CAST(sum(CASE WHEN hit AND NOT is_true THEN 1 ELSE 0 END) AS BIGINT)
        AS n_false_pos,
      CAST(sum(CASE WHEN is_true AND NOT hit THEN 1 ELSE 0 END) AS BIGINT)
        AS n_false_neg,
      CAST((sum(CASE WHEN hit AND NOT is_true THEN 1 ELSE 0 END) * 1000000)
           // greatest(count(*)
                       - sum(CASE WHEN is_true THEN 1 ELSE 0 END), 1)
           AS BIGINT) AS fp_ppm
    FROM truth
    """,
)
def bloom_join_prune_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter join pruning with an exact false-positive audit —
    THE pre-shuffle trick for a 100 TB fact/dim join: build a bitset
    over the dim keys (urgent 1995 orders), broadcast it (KB, not the
    dim itself), and drop fact rows that cannot match BEFORE they pay
    the shuffle. The audit certifies the whole construction end to
    end: bitset size/density, rows passing the filter, exact matches,
    false positives (the shuffle traffic the filter admits anyway),
    provably-zero false negatives, and the false-positive rate in
    exact integer ppm.

    Cross-engine construction (public method, Bloom 1970 + Kirsch-
    Mitzenmacher double hashing): probe i lands at
    (g1 + i*g2) mod m with g1/g2 two independent multiplicative mixes
    of the int64 key reduced mod 2^31-range primes — plain integer
    arithmetic both engines evaluate bit-identically, so the BITSET
    itself is oracle-checked, not just the summary. m is sized at
    16 bits/key (k=4 -> 25% load -> ~0.4% fp), derived from the dim
    count inside the plan (no driver action). Production note: Spark's
    own `bloom_filter_agg`/xxhash64 would be the JVM-native choice;
    the multiplicative mix keeps the relation verifiable and stays
    ANSI-safe while keys stay below ~2^32 (key * 2654435761 < 2^63).

    100 TB shape: dim aggregate is map-side combined into <= n_words
    rows; the finished bitset is ONE row cross-joined (broadcast) onto
    the fact scan — the fact side is a narrow map with four shifts and
    one AND per row, no shuffle until the (already pruned) aggregate;
    the truth join broadcasts the dim keys only for the audit. Sibling:
    ``operators/bloom_index.py`` is the PARTITION-skipping flavor of
    the same filter (a persisted per-partition sidecar consulted before
    the scan); this one prunes rows in-flight before a join shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # Checkpointed: three consumers (the sizing count, the bitset
    # build, the truth join) prune differently, so ReusedExchange
    # cannot deduplicate them — without the cut the orders scan +
    # distinct shuffle runs once PER consumer (the dsir precedent).
    # The relation is dim-key-sized, the legitimate checkpoint case.
    dim = (
        orders.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.year("o_orderdate") == 1995)
        )
        .select(F.col("o_orderkey").alias("key"))
        .distinct()
        .localCheckpoint()
    )
    sized = (
        dim.agg(F.count(F.lit(1)).cast("long").alias("n_dim"))
        .withColumn(
            "n_words", F.expr("greatest((16 * n_dim + 31) div 32, 1)")
        )
        .withColumn("m_bits", F.col("n_words") * 32)
    )

    def _g1(key):
        return (key * F.lit(2654435761)) % F.lit(2147483647)

    def _g2(key):
        return (key * F.lit(40503)) % F.lit(2147483629) + 1

    keyed = dim.crossJoin(F.broadcast(sized))
    pos = keyed.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(_BLOOM_K - 1)),
                lambda i: (_g1(F.col("key")) + i * _g2(F.col("key")))
                % F.col("m_bits"),
            )
        ).alias("pos")
    )
    grouped = (
        pos.select(
            F.expr("pos div 32").alias("word"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(pos % 32 as int))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("w"))
    )
    dense = (
        sized.select(
            F.explode(F.sequence(F.lit(0), F.col("n_words") - 1)).alias("word")
        )
        .join(grouped, "word", "left")
        .select("word", F.coalesce(F.col("w"), F.lit(0).cast("long")).alias("w"))
    )
    bloom = dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("word", "w"))),
            lambda s: s["w"],
        ).alias("arr"),
        F.sum(F.bit_count("w")).cast("long").alias("bits_set"),
    )
    mk = (
        lineitem.select(F.col("l_orderkey").alias("key"))
        .crossJoin(F.broadcast(bloom))
        .crossJoin(F.broadcast(sized))
    )
    g1, g2 = _g1(F.col("key")), _g2(F.col("key"))
    for i in range(_BLOOM_K):
        mk = mk.withColumn(f"p{i}", (g1 + F.lit(i) * g2) % F.col("m_bits"))
    hit = F.expr(
        " AND ".join(
            f"((shiftright(element_at(arr, cast(p{i} div 32 as int) + 1),"
            f" cast(p{i} % 32 as int)) & 1) = 1)"
            for i in range(_BLOOM_K)
        )
    )
    marked = mk.withColumn("hit", hit)
    truth = marked.join(
        F.broadcast(dim.withColumn("is_true", F.lit(True))), "key", "left"
    ).withColumn("is_true", F.coalesce(F.col("is_true"), F.lit(False)))
    return truth.agg(
        F.max("n_dim").cast("long").alias("n_dim"),
        F.max("m_bits").cast("long").alias("m_bits"),
        F.max("bits_set").cast("long").alias("bits_set"),
        F.count(F.lit(1)).cast("long").alias("n_fact"),
        F.sum(F.col("hit").cast("long")).cast("long").alias("n_pass_bloom"),
        F.sum(F.col("is_true").cast("long")).cast("long").alias("n_true_match"),
        F.sum((F.col("hit") & ~F.col("is_true")).cast("long"))
        .cast("long")
        .alias("n_false_pos"),
        F.sum((F.col("is_true") & ~F.col("hit")).cast("long"))
        .cast("long")
        .alias("n_false_neg"),
    ).select(
        "*",
        F.expr(
            "(n_false_pos * 1000000) div greatest(n_fact - n_true_match, 1)"
        )
        .cast("long")
        .alias("fp_ppm"),
    )


# ---------------------------------------------------------------------------
# Pareto skyline
# ---------------------------------------------------------------------------


@query(
    "pareto_skyline_parts",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice AS price,
           CAST(p.p_size AS INT) AS size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
    """,
)
def pareto_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline (Borzsony/Kossmann/Stocker 2001, public method):
    the parts no other part beats on BOTH axes — cheaper-or-equal price
    AND larger-or-equal size with at least one strict — i.e. the
    undominated frontier of the (minimize price, maximize size) trade.
    Duplicate (price, size) points do not dominate each other and all
    survive, which the strict-in-one clause encodes.

    Distributed shape — the partition/local/merge skyline, NOT the
    oracle's O(n^2) NOT EXISTS and NOT one global sort: band the rows
    by a deterministic price bucket, compute each band's LOCAL skyline
    with band-parallel windows over the per-price size maxima (global
    skyline is always a subset of any partition's local skyline), then
    run the exact dominance pass once more over the surviving
    candidates — a frontier-sized relation, so its single-partition
    window is candidate-bounded, not corpus-bounded. Dominance is
    decided from two histogram quantities per price level: the running
    size-max over strictly cheaper prices (lag of the cummax) and the
    size-max at the same price; no UDF, no cross join anywhere."""
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.col("p_size").cast("int").alias("size"),
    )

    def survivors(df: DataFrame, *band: str) -> DataFrame:
        lvl = df.groupBy(*band, "price").agg(F.max("size").alias("mx"))
        w = (
            Window.partitionBy(*band).orderBy("price")
            if band
            else Window.orderBy("price")
        )
        cum = F.max("mx").over(w.rowsBetween(Window.unboundedPreceding, 0))
        stats = lvl.select(
            *band,
            "price",
            "mx",
            F.lag(cum).over(w).alias("cheaper_mx"),
        )
        return (
            df.join(stats, [*band, "price"])
            .filter(
                (
                    F.col("cheaper_mx").isNull()
                    | (F.col("cheaper_mx") < F.col("size"))
                )
                & (F.col("mx") <= F.col("size"))
            )
            .select("p_partkey", "price", "size")
        )

    banded = parts.withColumn(
        "band", F.floor(F.col("price") / 100).cast("long")
    )
    candidates = survivors(banded, "band")
    return survivors(candidates)


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

_CM_P = 2147483647  # XENGINE_P — the cross-engine poly-hash modulus
_CM_W = 1024  # sketch width (columns per row)
# One odd multiplier per sketch row (public xxHash/MurmurHash-family
# constants); h < 2^31 and r < 2^32 keep h*r below 2^63 — ANSI-safe.
_CM_MULTS = (2654435761, 2246822519, 3266489917, 668265263)
_CM_TOPK = 20

_CM_MULTS_SQL = ", ".join(f"({i}, {r})" for i, r in enumerate(_CM_MULTS))


@query(
    "count_min_heavy_audit",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    counts AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cnt
      FROM toks WHERE w <> '' GROUP BY w
    ),
    hashed AS (
      SELECT w, cnt,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(w, ''),
                              c -> CAST(ascii(c) AS BIGINT))),
               (a, b) -> (a * 131 + b) % {_CM_P}) AS h
      FROM counts
    ),
    mults AS (SELECT * FROM (VALUES {_CM_MULTS_SQL}) v(i, r)),
    cells AS (
      SELECT i, ((h * r) % {_CM_P}) % {_CM_W} AS pos,
             CAST(sum(cnt) AS BIGINT) AS total
      FROM hashed, mults GROUP BY 1, 2
    ),
    top AS (
      SELECT w, cnt, h FROM hashed
      QUALIFY row_number() OVER (ORDER BY cnt DESC, w) <= {_CM_TOPK}
    )
    SELECT t.w AS term, t.cnt AS exact_cnt,
           CAST(min(c.total) AS BIGINT) AS cm_est,
           CAST(min(c.total) - t.cnt AS BIGINT) AS overcount
    FROM top t CROSS JOIN mults m
    JOIN cells c
      ON c.i = m.i AND c.pos = ((t.h * m.r) % {_CM_P}) % {_CM_W}
    GROUP BY t.w, t.cnt
    """,
)
def count_min_heavy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over the corpus
    token stream, audited against exact counts: a fixed d×w grid of
    integer counters where each token occurrence increments one cell
    per row and estimate(token) = min over rows — never an
    UNDER-estimate (every cell the token touches holds at least its
    true count). The audit reports, for the exact top-k tokens, the
    exact count, the sketch estimate, and the collision overcount.
    Counters are exact integer sums on the shared cross-engine
    poly-hash, so the driver hash certifies the SKETCH CELLS' content
    (through the min), not just row counts — the KMV discipline
    applied to the frequency sketch that complements it (KMV answers
    "how many distinct", count-min answers "how often is X").

    100 TB shape: token counting is the one corpus-scale shuffle
    (map-side combined on the token string); the hash fold runs per
    DISTINCT token (vocab-sized, not corpus-sized); the sketch is
    d×w = 4096 cells REGARDLESS of corpus size and is cell-wise
    mergeable across shards/streams (sum), which is the whole point —
    a bounded-memory frequency oracle. The estimation join touches
    top-k × d rows against the 4k-cell relation. At true scale the
    exact side (here the audit's ground truth) is dropped and the
    sketch alone survives; `heavy_hitters_topk` is the exact-top-k
    sibling (Misra-Gries), this is the bounded-memory point-query
    sibling."""
    from etl_pipeline_orchestration_spark.operators import dedup as dedup_ops

    docs = load_table(spark, sf_dir, "documents")
    p = F.lit(_CM_P)
    # Checkpointed: cells and top prune different columns from the
    # hashed vocab, so ReusedExchange cannot share the token shuffle.
    # The relation is vocab-sized — the legitimate checkpoint case.
    hashed = cm_hashed_counts(docs).localCheckpoint()
    mults = F.array(*[F.lit(r) for r in _CM_MULTS])
    cells = cm_cells(hashed)
    wk = Window.orderBy(F.desc("cnt"), F.asc("w"))
    top = (
        hashed.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= _CM_TOPK)
        .drop("rk")
    )
    probes = top.select(
        "w", "cnt", "h", F.posexplode(mults).alias("i", "r")
    ).select(
        "w",
        "cnt",
        "i",
        (((F.col("h") * F.col("r")) % p) % _CM_W).alias("pos"),
    )
    return (
        F.broadcast(probes)
        .join(cells, ["i", "pos"])
        .groupBy(F.col("w").alias("term"), F.col("cnt").alias("exact_cnt"))
        .agg(F.min("total").cast("long").alias("cm_est"))
        .select(
            "term",
            "exact_cnt",
            "cm_est",
            (F.col("cm_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
        )
    )


def cm_hashed_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, cnt, h): token counts with the cross-engine poly-hash —
    the vocab-sized relation every count-min consumer builds on. One
    map-side-combined shuffle on the token; the char fold runs per
    DISTINCT token."""
    from etl_pipeline_orchestration_spark.operators import dedup as dedup_ops

    p = F.lit(_CM_P)
    counts = (
        docs.select(F.explode(dedup_ops._tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wordfold = F.aggregate(
        F.filter(F.split(F.col("w"), ""), lambda c: c != F.lit("")),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 131 + F.ascii(c)) % p,
    )
    return counts.withColumn("h", wordfold)


def cm_cells(hashed: DataFrame) -> DataFrame:
    """(i, pos, total): the d×w sketch grid from hashed token counts —
    at most d·w (4096) rows regardless of corpus size."""
    p = F.lit(_CM_P)
    mults = F.array(*[F.lit(r) for r in _CM_MULTS])
    return (
        hashed.select("cnt", "h", F.posexplode(mults).alias("i", "r"))
        .select(
            "i",
            (((F.col("h") * F.col("r")) % p) % _CM_W).alias("pos"),
            "cnt",
        )
        .groupBy("i", "pos")
        .agg(F.sum("cnt").cast("long").alias("total"))
    )


def cm_fold(term: str) -> int:
    """Driver-side replica of the cross-engine char fold."""
    h = 0
    for c in term:
        h = (h * 131 + ord(c)) % _CM_P
    return h


def cm_positions(h: int) -> list:
    """[(row, pos)] cell coordinates of one hashed term."""
    return [
        (i, ((h * r) % _CM_P) % _CM_W) for i, r in enumerate(_CM_MULTS)
    ]


# ---------------------------------------------------------------------------
# Johnson–Lindenstrauss projection with exact distortion audit
# ---------------------------------------------------------------------------

_JL_D = 64  # input dims
_JL_K = 16  # output dims
_JL_Q = 1024  # 2^10 quantization grid (keeps every square in int64)
_JL_NVEC = 50  # audited vector subset -> 1225 pairs


@query(
    "jl_projection_distortion",
    oracle=f"""
    WITH vq AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {_JL_Q} + 0.5) AS BIGINT))
               AS xq
      FROM embeddings WHERE vec_id < {_JL_NVEC}
    ),
    proj AS (
      SELECT vec_id, xq,
             list_transform(range(1, {_JL_K} + 1), j ->
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, {_JL_D} + 1), i ->
                     CASE WHEN ((i * 131 + j) * 2654435761)
                               % 2147483647 % 2 = 0
                          THEN xq[i] ELSE -xq[i] END)),
                 (a, b) -> a + b)) AS p
      FROM vq
    ),
    pairs AS (
      SELECT a.vec_id AS ida, b.vec_id AS idb,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, {_JL_D} + 1),
                 i -> (a.xq[i] - b.xq[i]) * (a.xq[i] - b.xq[i]))),
               (x, y) -> x + y) AS dorig2,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, {_JL_K} + 1),
                 j -> (a.p[j] - b.p[j]) * (a.p[j] - b.p[j]))),
               (x, y) -> x + y) AS dproj2
      FROM proj a JOIN proj b ON a.vec_id < b.vec_id
    ),
    rat AS (
      SELECT (dproj2 * 1000) // ({_JL_K} * dorig2) AS permille
      FROM pairs WHERE dorig2 > 0
    )
    SELECT permille // 100 AS band,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(permille) AS BIGINT) AS min_permille,
           CAST(max(permille) AS BIGINT) AS max_permille
    FROM rat GROUP BY 1
    """,
)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection (64 → 16 dims, ±1
    Achlioptas 2003 signs, public method) with an EXACT pairwise
    distortion audit: every audited pair's projected-distance² over
    k·original-distance² in integer permille, banded. The
    dimensionality cut that precedes ANN / clustering at scale —
    memory and matmul cost drop 4×, and THIS query measures what that
    costs in distance fidelity (E[ratio] = 1; spread shrinks as k
    grows).

    Exactness: vectors live on the 2^10 quantization grid and the
    sign matrix is the Knuth multiplicative parity of (i·131 + j) —
    every projection, distance, and ratio is int64 arithmetic both
    engines replay bit-for-bit (grid and k chosen so the largest
    square, 16·(2·64·80·2^10)², stays under 2^63; the ×1000 permille
    numerator too).

    100 TB shape: projections are computed PER VECTOR (n rows × one
    k·d codegen fold — at scale an Arrow matmul per the similarity-op
    rule), pairs only over the audited subset (the audit is a sample
    diagnostic, never corpus²); nothing here shuffles beyond the
    subset self-join."""
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _JL_NVEC
    )
    xq = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * _JL_Q + F.lit(0.5)).cast("long"),
    )

    def sign(i: int, j: int) -> int:
        return 1 if ((i * 131 + j) * 2654435761) % 2147483647 % 2 == 0 else -1

    vq = emb.select("vec_id", xq.alias("xq"))
    proj_cols = [
        F.aggregate(
            F.sequence(F.lit(1), F.lit(_JL_D)),
            F.lit(0).cast("long"),
            lambda acc, i: acc
            + F.element_at("xq", i)
            * F.element_at(
                F.array(
                    *[F.lit(sign(ii, j)) for ii in range(1, _JL_D + 1)]
                ),
                i,
            ),
        ).alias(f"p{j}")
        for j in range(1, _JL_K + 1)
    ]
    proj = vq.select("vec_id", "xq", *proj_cols)
    a = proj.alias("a")
    b = proj.alias("b")
    dorig2 = F.aggregate(
        F.zip_with("a.xq", "b.xq", lambda p, q: (p - q) * (p - q)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    dproj2 = None
    for j in range(1, _JL_K + 1):
        t = (F.col(f"a.p{j}") - F.col(f"b.p{j}")) * (
            F.col(f"a.p{j}") - F.col(f"b.p{j}")
        )
        dproj2 = t if dproj2 is None else dproj2 + t
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        dorig2.alias("dorig2"), dproj2.alias("dproj2")
    )
    rat = pairs.filter(F.col("dorig2") > 0).select(
        F.expr(f"(dproj2 * 1000) div ({_JL_K} * dorig2)").alias("permille")
    )
    return rat.groupBy(
        F.expr("permille div 100").alias("band")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.min("permille").cast("bigint").alias("min_permille"),
        F.max("permille").cast("bigint").alias("max_permille"),
    )


def _zorder_interleave_sql(qp: str, qs: str) -> str:
    """32-term flat bit-interleave expression (16 bits per dimension →
    one 32-bit Morton code), identical text on both engines."""
    # every term fully parenthesized: SQL `<<` binds LOOSER than `+`,
    # so an unwrapped `a << 0 + b << 1` parses as `a << (0 + b) << 1`
    terms = []
    for i in range(16):
        terms.append(f"(((({qp}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({qs}) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_ZORDER_FILES = 64


def _zorder_oracle() -> str:
    inter = _zorder_interleave_sql("qp", "qs")
    return f"""
    WITH mx AS (
      SELECT CAST(max(l_partkey) AS BIGINT) AS mp,
             CAST(max(l_suppkey) AS BIGINT) AS ms,
             CAST(max(l_orderkey) AS BIGINT) AS mo
      FROM lineitem
    ),
    rows_q AS (
      SELECT l_orderkey AS ok, l_partkey AS p, l_suppkey AS s,
             (l_partkey * 65536) // (mx.mp + 1) AS qp,
             (l_suppkey * 65536) // (mx.ms + 1) AS qs,
             mx.mp, mx.ms, mx.mo
      FROM lineitem, mx
    ),
    zr AS (
      SELECT *, CAST({inter} AS BIGINT) AS zval FROM rows_q
    ),
    filed AS (
      SELECT 'natural' AS layout, ok * {_ZORDER_FILES} // (mo + 1) AS file_id,
             p, s, mp, ms
      FROM zr
      UNION ALL
      SELECT 'zorder', zval * {_ZORDER_FILES} // 4294967296, p, s, mp, ms
      FROM zr
    ),
    files AS (
      SELECT layout, file_id,
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(min(p) AS BIGINT) AS pmin,
             CAST(min(s) AS BIGINT) AS smin,
             CAST(any_value(mp) AS BIGINT) AS mp,
             CAST(any_value(ms) AS BIGINT) AS ms
      FROM filed GROUP BY 1, 2
    )
    SELECT layout,
           CAST(count(*) AS BIGINT) AS n_files,
           CAST(sum(n_rows) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE pmin <= mp // 10 AND smin <= ms // 10)
                AS BIGINT) AS files_scanned,
           CAST(sum(n_rows) FILTER (WHERE pmin <= mp // 10
                                      AND smin <= ms // 10)
                AS BIGINT) AS rows_scanned,
           CAST((1000000 * count(*) FILTER (WHERE pmin <= mp // 10
                                              AND smin <= ms // 10))
                // count(*) AS BIGINT) AS scan_ratio_micro
    FROM files GROUP BY layout
    """


@query("zorder_pruning_audit", oracle=_zorder_oracle())
def zorder_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) data-layout audit — the OPTIMIZE ZORDER
    decision report: lay lineitem out into {files} equal-z-range files
    on the interleaved (l_partkey, l_suppkey) code vs the natural
    orderkey layout, then measure how many files a 10%×10% box query
    (both keys in their bottom decile) must scan under min/max
    zone-map pruning. On this data the natural layout scans ALL
    {files} files (order keys carry no part/supplier locality) while
    the z-order layout scans ~1 — the quantified justification for
    multi-dimensional clustering, consumed by the same zone-map
    sidecars sources/ builds.

    Exactness: quantization to 16-bit grid cells, the 32-term bit
    interleave, file assignment, per-file minima, and the pruning
    predicate are ALL integer — both engines agree bit-for-bit (box
    starts at 0, so overlap reduces to pmin/smin thresholds).

    100 TB shape: ONE fact scan fans into the two layout labelings
    (a union of narrow maps over the same scan), a file-grain
    aggregate, and a {files}-row report — the audit costs one pass
    regardless of corpus size; the 3 domain maxima are one
    map-side-combined scalar collect inlined as literals (the
    kcenter/probe discipline)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    mx = li.agg(
        F.max("l_orderkey").alias("mo"),
        F.max("l_partkey").alias("mp"),
        F.max("l_suppkey").alias("ms"),
    ).head()
    mo, mp, ms = int(mx["mo"]), int(mx["mp"]), int(mx["ms"])
    inter = _zorder_interleave_sql(
        f"(l_partkey * 65536) div {mp + 1}",
        f"(l_suppkey * 65536) div {ms + 1}",
    )
    zr = li.select(
        F.col("l_partkey").alias("p"),
        F.col("l_suppkey").alias("s"),
        F.expr(f"l_orderkey * {_ZORDER_FILES} div {mo + 1}").alias(
            "nat_file"
        ),
        F.expr(
            f"cast({inter} as bigint) * {_ZORDER_FILES} div 4294967296"
        ).alias("z_file"),
    )
    filed = zr.select(
        F.lit("natural").alias("layout"), F.col("nat_file").alias("file_id"),
        "p", "s",
    ).unionAll(
        zr.select(
            F.lit("zorder").alias("layout"), F.col("z_file").alias("file_id"),
            "p", "s",
        )
    )
    files = filed.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("p").cast("bigint").alias("pmin"),
        F.min("s").cast("bigint").alias("smin"),
    )
    hit = (F.col("pmin") <= mp // 10) & (F.col("smin") <= ms // 10)
    return files.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.sum(F.when(hit, 1).otherwise(0)).cast("bigint").alias(
            "files_scanned"
        ),
        F.sum(F.when(hit, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("rows_scanned"),
        F.expr(
            "cast((1000000 * sum(case when pmin <= {mp10} and smin <= {ms10}"
            " then 1 else 0 end)) div count(1) as bigint)".format(
                mp10=mp // 10, ms10=ms // 10
            )
        ).alias("scan_ratio_micro"),
    )


zorder_pruning_audit.__doc__ = zorder_pruning_audit.__doc__.format(
    files=_ZORDER_FILES
)
