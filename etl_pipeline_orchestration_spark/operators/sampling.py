"""Deterministic sampling / split operators for training-data prep [EXT].

Reproducibility rule: membership must be a pure function of the row's
stable id — never rand() (changes across retries/re-runs) and never
"first n" (changes with partitioning). ``bucket_of`` maps the id to one
of 1000 stable buckets; splits and samples are bucket-range predicates,
so they are consistent across engines, runs, and cluster layouts, and
any subset relation (e.g. a 10% sample of the 80% train split) holds
exactly.

Two bucket functions:
* ``knuth`` (default): multiplicative hashing (((id mod 2^31) * 2654435761) mod
  2^32) mod 1000 — expressible in ANY SQL engine (plain 64-bit
  arithmetic, no overflow for ids < 2^31), so the DuckDB oracle can
  verify membership row-for-row;
* ``xxhash``: Spark's xxhash64 — better avalanche behavior for adversarial
  id spaces, Spark-specific.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / golden ratio, Knuth multiplicative hashing


def bucket_of(id_col: Column, method: str = "knuth") -> Column:
    """Stable bucket in [0, 1000) from an integer id."""
    if method == "knuth":
        # Pre-reduce mod 2^31: the raw product id*KNUTH overflows int64
        # (ANSI throw) once id exceeds ~3.49e9 — a realistic corpus size
        # at 100 TB. (2^31-1)*KNUTH ~= 5.7e18 stays inside int64, and
        # ids below 2^31 (every current oracle) hash identically.
        reduced = F.pmod(id_col, F.lit(2**31))
        return F.pmod(F.pmod(reduced * F.lit(KNUTH), F.lit(2**32)), F.lit(1000))
    if method == "xxhash":
        return F.pmod(F.xxhash64(id_col), F.lit(1000))
    raise ValueError(f"unknown bucket method {method!r}")


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    method: str = "knuth",
) -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test' by default) from
    cumulative bucket ranges. Weights must sum to 1."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    b = bucket_of(F.col(id_col), method)
    expr = None
    edge = 0.0
    for name, w in weights.items():
        edge += w
        cond = b < F.lit(int(round(edge * 1000)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    method: str = "knuth",
) -> DataFrame:
    """Keep each row with its stratum's rate, deterministically: row
    survives iff bucket(id) < rate*1000. Upsampling hot strata down and
    rare strata up is the standard language-balancing move in corpus
    prep; the bucket rule keeps every run identical."""
    b = bucket_of(F.col(id_col), method)
    rate = None
    for stratum, r in rates.items():
        c = F.col(stratum_col) == stratum
        rate = F.when(c, F.lit(r)) if rate is None else rate.when(c, F.lit(r))
    rate = rate.otherwise(F.lit(default_rate)) if rate is not None else F.lit(default_rate)
    return df.filter(b < rate * 1000)


def exact_allocation(
    df: DataFrame,
    stratum_col: str = "lang",
    total_n: int = 200,
    id_col: str = "doc_id",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of EXACTLY ``total_n``
    rows across strata, proportional to stratum size — the allocation
    step of materializing a training-data mixture ("give me exactly N
    documents, language-balanced to the corpus"). Rate-based
    ``stratified_sample`` cannot hit an exact N; this computes, in pure
    integer arithmetic (so the DuckDB oracle replays it bit-for-bit):

      base_s = (N * c_s) div T,   rem_s = (N * c_s) mod T
      leftover = N - sum(base_s)  (< n_strata by construction)
      alloc_s = base_s + 1 for the ``leftover`` largest rem_s
                (ties broken by stratum name ascending)

    Scale shape: one map-side-combined count per stratum, then every
    operator runs at STRATUM cardinality (dozens of rows) — the
    single-partition ranking window is aggregate-bounded by
    construction, the legitimate SP case PLANS.md polices.

    Raises ``ValueError`` when ``total_n`` exceeds the corpus row
    count: Hamilton apportionment guarantees alloc_s <= c_s only for
    N <= T (extras go exclusively to rem>0 strata), and an
    over-allocation would make the downstream histogram-threshold
    select silently under-deliver the stratum instead of failing."""
    from pyspark.sql import Window

    counts = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    # one map-side-combined scalar; validating here lets the rest of
    # the plan inline T as a literal (drops the broadcast crossJoin)
    t_row = counts.agg(F.sum("n_rows").alias("t")).head()
    t = (t_row["t"] if t_row is not None else None) or 0
    if total_n > t:
        raise ValueError(
            f"exact_allocation: total_n={total_n} exceeds the corpus row"
            f" count ({t}); an exact-N stratified sample cannot"
            f" deliver more rows than exist"
        )
    # total_n == 0 on an empty corpus is a legitimate no-op allocation;
    # t is only a divisor below and counts is empty, so any non-zero
    # literal yields the same (empty) result
    t_div = t or 1
    quota = counts.select(
        "stratum",
        "n_rows",
        F.expr(f"({total_n} * n_rows) div {t_div}").cast("bigint").alias("base_n"),
        F.expr(f"({total_n} * n_rows) % {t_div}").cast("bigint").alias("rem"),
    )
    leftover = quota.agg(
        (F.lit(total_n) - F.sum("base_n")).cast("bigint").alias("leftover")
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("stratum"))
    return (
        quota.crossJoin(F.broadcast(leftover))
        .withColumn("rk", F.row_number().over(w))
        .select(
            "stratum",
            "n_rows",
            "base_n",
            "rem",
            F.when(F.col("rk") <= F.col("leftover"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("extra"),
        )
        .withColumn(
            "alloc_n", (F.col("base_n") + F.col("extra")).cast("bigint")
        )
    )


def stratified_sample_exact(
    df: DataFrame,
    stratum_col: str = "lang",
    total_n: int = 200,
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the ``exact_allocation`` mixture: per stratum, keep
    exactly alloc_s rows, chosen deterministically as the first alloc_s
    by (knuth bucket, id) — a reproducible uniform draw (same
    membership every run/engine/layout, the sampling-module rule).

    Scale shape — distributed exact top-k via histogram thresholding,
    NOT a full per-stratum sort: a (stratum x 1000-bucket) histogram
    (aggregate-bounded) gives the smallest bucket threshold t_s whose
    cumulative count covers alloc_s; only rows with bucket <= t_s
    (~alloc_s + one bucket's width, not the stratum) reach the exact
    ranking window. Every row of the true top-alloc has bucket <= t_s
    by the prefix property of (bucket, id) order, so the two-phase
    select is exact, and the per-stratum sort is bounded by the
    allocation, not the corpus — the skewed-language partition never
    sorts in full."""
    from pyspark.sql import Window

    alloc = exact_allocation(df, stratum_col, total_n, id_col)
    b = bucket_of(F.col(id_col), "knuth")
    rows = df.select(
        F.col(id_col),
        F.col(stratum_col).alias("stratum"),
        b.cast("bigint").alias("bucket"),
    )
    hist = rows.groupBy("stratum", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("bn")
    )
    wcum = (
        Window.partitionBy("stratum")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("bn").over(wcum))
    thresholds = (
        cum.join(F.broadcast(alloc.select("stratum", "alloc_n")), "stratum")
        .filter(F.col("cum") >= F.col("alloc_n"))
        .groupBy("stratum")
        .agg(F.min("bucket").alias("t_bucket"))
    )
    cand = rows.join(
        F.broadcast(
            thresholds.join(
                F.broadcast(alloc.select("stratum", "alloc_n")), "stratum"
            )
        ),
        "stratum",
    ).filter(F.col("bucket") <= F.col("t_bucket"))
    wrk = Window.partitionBy("stratum").orderBy("bucket", id_col)
    return (
        cand.withColumn("rk", F.row_number().over(wrk).cast("bigint"))
        .filter(F.col("rk") <= F.col("alloc_n"))
        .select(id_col, "stratum", "bucket", "rk")
    )
