"""UDF-surface coverage [EXT] (SURVEY.md §2.11): vectorized scalar
``pandas_udf`` and grouped-map ``applyInPandas``, both oracle-checked.

UDF discipline: built-ins first (everything else in this repo is JVM
Column expressions); Python only where per-row/per-group logic genuinely
wants NumPy/pandas — and then always Arrow-batched, never row-at-a-time.
These two queries exist to pin the Arrow bridge semantics (batch shapes,
NaN→NULL conversion, grouped-map schemas) with a DuckDB oracle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from etl_pipeline_orchestration_spark.plans.registry import query
from etl_pipeline_orchestration_spark.sources.tables import load_table

_WS = re.compile(r"\s+")


def normalize_text_udf():
    """Vectorized text normalization: trim, lowercase, collapse runs of
    whitespace. One Arrow batch in, one out — no per-row Python calls
    from the executor's perspective. Built lazily: decorating with
    ``pandas_udf`` resolves the return type against the active session,
    so it can't run at import time."""

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.strip().str.lower().str.replace(_WS, " ", regex=True)

    return _norm


@query(
    "pandas_udf_normalize_text",
    oracle="""
    SELECT doc_id,
           lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS norm_text,
           CAST(length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                AS INT) AS norm_len
    FROM documents
    """,
)
def pandas_udf_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U1] pandas_udf scalar: the normalization the dedup pipeline would
    run before hashing, checked value-for-value against SQL."""
    docs = load_table(spark, sf_dir, "documents")
    norm = normalize_text_udf()(F.col("text"))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).alias("norm_len"),
    )


@query(
    "udtf_tokenize_docs",
    oracle="""
    SELECT d.doc_id, t.tok AS token, CAST(t.i - 1 AS INT) AS pos
    FROM (SELECT doc_id,
                 string_split_regex(trim(text), '\\s+') AS tk
          FROM documents) d,
         LATERAL (SELECT unnest(tk) AS tok,
                         unnest(range(1, len(tk) + 1)) AS i) t
    """,
)
def udtf_tokenize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[§2.11] Python UDTF: one input row → one row per token with its
    position. Registered mainly to cover the table-function API surface —
    the docstring-level guidance stands: ``posexplode(split(...))`` does
    this JVM-side and is what the text operators actually use; a Python
    UDTF is row-at-a-time and belongs only where the expansion logic
    can't be expressed with builtins."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, pos int")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.strip().split()):
                yield tok, i

    spark.udtf.register("tokenize_udtf", Tokenize)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.pos
        FROM docs_udtf d, LATERAL tokenize_udtf(d.text) t
        """
    )


def _zscore_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """Z-score per customer, computed inside a coarse bucket with
    pandas groupby-transform (vectorized across ALL customers in the
    bucket at once). Single-order customers have no sample std → NaN,
    which Arrow's from_pandas turns into SQL NULL, matching the oracle's
    NULL from stddev_samp of one row."""
    g = pdf.groupby("o_custkey")["o_totalprice"]
    mu = g.transform("mean")
    sd = g.transform("std")  # ddof=1 (sample std)
    with np.errstate(invalid="ignore", divide="ignore"):
        z = (pdf["o_totalprice"] - mu) / sd
    return pd.DataFrame(
        {
            "o_custkey": pdf["o_custkey"],
            "o_orderkey": pdf["o_orderkey"],
            "price_z": np.round(z * 10_000) / 10_000,
        }
    )


@query(
    "apply_in_pandas_order_zscore",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round((o_totalprice - avg(o_totalprice) OVER w)
                 / nullif(stddev_samp(o_totalprice) OVER w, 0) * 10000) / 10000
             AS price_z
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey)
    """,
)
def apply_in_pandas_order_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[U2] applyInPandas grouped-map: per-customer z-score of order
    totals (the per-group model-scoring shape).

    Grouped on a COARSE bucket of the key, not the key itself: a
    grouped-map over millions of tiny groups pays per-group Python/Arrow
    overhead that dwarfs the work (14s vs 1s at sf0.1 here). Hashing the
    real key into 64 buckets keeps the same shuffle-by-key semantics
    (every customer's rows land in exactly one pandas frame) while the
    per-customer math runs as one vectorized groupby-transform per
    bucket. This is the scale idiom for fine-grained grouped-map work.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy(F.pmod(F.xxhash64("o_custkey"), F.lit(64)).alias("__bucket__"))
        .applyInPandas(
            lambda pdf: _zscore_bucket(pdf),
            "o_custkey long, o_orderkey long, price_z double",
        )
    )


@query(
    "udaf_median_price_by_priority",
    oracle="""
    SELECT o_orderpriority,
           median(o_totalprice) AS median_price,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def udaf_median_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDAF (the custom-aggregate surface): exact
    per-group median via numpy. Median is selection-plus-one-midpoint —
    order-independent and ulp-exact across engines, unlike sum-based
    custom aggregates whose float accumulation order differs (that trap
    is why this UDAF is a median and not a geometric mean). Arrow ships
    each group's column once; no per-row Python."""

    @pandas_udf("double")
    def _median(v: pd.Series) -> float:
        return float(np.median(v.to_numpy(dtype=np.float64)))

    # Spark forbids mixing GROUPED_AGG pandas UDFs with JVM aggregates
    # in one agg() — the row count is a second tiny UDAF, not F.count
    @pandas_udf("long")
    def _n(v: pd.Series) -> int:
        return len(v)

    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        _median("o_totalprice").alias("median_price"),
        _n("o_totalprice").alias("n_orders"),
    )


@query(
    "arrow_vector_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                                              x -> CAST(x AS DOUBLE)
                                                   * CAST(x AS DOUBLE))))
                 * 1e6) / 1e6 AS l2_norm
    FROM embeddings
    """,
)
def arrow_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms via ``mapInArrow`` — the zero-copy Arrow batch surface
    (SURVEY §2.11's fourth UDF shape, below pandas_udf/applyInPandas/
    mapInPandas): the function sees raw ``pyarrow.RecordBatch``es, so
    there is no pandas conversion at all — the right tier for pure
    numeric kernels over columnar data at 100 TB.

    numpy sums pairwise while the oracle's list_sum is sequential —
    same-magnitude positive values differ in last ulps, hence the 1e-6
    rounding (the established discipline for order-varying float
    reductions).
    """
    import pyarrow as pa

    def norms(batches):
        for batch in batches:
            if batch.num_rows == 0:  # empty Arrow batch
                continue
            ids = batch.column(0)
            embs = batch.column(1)
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in embs.to_pylist()]
            )
            out = np.sqrt((mat * mat).sum(axis=1))
            out = np.round(out * 1e6) / 1e6
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=pa.float64())],
                names=["vec_id", "l2_norm"],
            )

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return vecs.mapInArrow(norms, "vec_id bigint, l2_norm double")
