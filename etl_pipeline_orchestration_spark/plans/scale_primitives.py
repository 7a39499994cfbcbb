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


def assign_contiguous_ids(
    df: DataFrame,
    key_col: str,
    n_buckets: int = _ID_BUCKETS,
    id_col: str = "global_id",
) -> DataFrame:
    """Contiguous 0..n-1 ids in ``key_col`` order (keys must be unique
    numerics) without a global single-partition window. Plan shape:
    (1) approx_percentile samples B-1 boundary values (one scalar-sized
    collect); (2) a codegen'd fold over the literal boundary array
    assigns each row its bucket; (3) per-bucket counts shuffle B rows;
    (4) the exclusive prefix sum over those B rows is the only
    single-partition step (B rows); (5) a broadcast join attaches
    offsets and a window PARTITIONED BY BUCKET (parallel across
    buckets, each a bounded key range) adds the local row_number. At
    10^12 rows every stage stays bounded: no task ever sees more than
    one bucket's rows. Correct for ANY boundary placement (monotone
    bucketing + exact offsets); boundaries only balance the work."""
    fracs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    bounds = df.agg(
        F.expr(f"approx_percentile({key_col}, array({fracs}), 10000)")
    ).first()[0]
    # Distinct boundaries only (duplicate quantiles on skewed keys
    # would create empty buckets — harmless, but smaller literals win).
    uniq = sorted({int(b) for b in bounds})
    barr = F.array(*[F.lit(b) for b in uniq])
    bucket = F.aggregate(
        barr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col(key_col) > b, 1).otherwise(0),
    )
    with_b = df.withColumn("__bucket", bucket)
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
    w_local = Window.partitionBy("__bucket").orderBy(key_col)
    return (
        with_b.join(F.broadcast(offsets), "__bucket")
        .select(
            *df.columns,
            (
                F.col("__offset") + F.row_number().over(w_local) - 1
            ).cast("bigint").alias(id_col),
        )
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
