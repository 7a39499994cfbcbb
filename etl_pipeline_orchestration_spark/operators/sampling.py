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
