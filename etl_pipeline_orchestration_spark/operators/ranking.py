"""Distributed exact global ranking [EXT].

The naive way to compute ``row_number() OVER (ORDER BY ...)`` (and the
distribution functions built on it — ``ntile``, ``percent_rank``,
``cume_dist``) is an unpartitioned window, which Spark executes by
shuffling EVERY row to a single partition and sorting there — the
classic 100 TB scale-killer (`WindowExec: No Partition Defined` warns
about exactly this). This module computes the same exact ranks with a
fully parallel plan:

1. **Cutpoints** — one narrow pass computes ``B-1`` approximate
   quantile cutpoints of the bucketing key (``percentile_approx`` is a
   mergeable GK sketch: map-side combined, constant memory). Accuracy
   only affects load balance, never correctness.
2. **Bucket** — each row gets a bucket id via a monotone generated-SQL
   fold over the cutpoint array (one JVM parse, not a py4j-built
   expression chain), so bucket order == key order and equal keys
   always share a bucket.
3. **Local rank** — ``row_number`` over ``Window.partitionBy(bucket)``:
   one hash shuffle, ``B``-way parallel sort of ~1/B of the data each.
4. **Offsets** — per-bucket counts (tiny: ``B`` rows) are collected and
   turned into literal prefix-sum offsets; global row_number =
   offset[bucket] + local row_number. No second full-data shuffle, no
   single-partition exchange anywhere in the final plan.

Total order requirement: ``order_cols`` must be a strict total order
(include a unique tiebreak column, the same discipline every oracle
query here follows) and the bucketing key must be non-null — then
``row_number == rank == dense-rank-with-ties-broken`` and the derived
``ntile`` / ``percent_rank`` formulas below reproduce the SQL-standard
semantics bit-for-bit (verified against DuckDB by the oracle sweep).

Reference parity: the reference (etl_pipeline.py) has no ranking at
all — this is [EXT] surface; semantics follow ANSI SQL window
functions.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def append_global_row_number(
    df: DataFrame,
    order_cols: Sequence[Column],
    bucket_key: Column,
    *,
    descending: bool = False,
    n_buckets: int = 64,
    out_col: str = "rn",
    accuracy: int = 1000,
) -> Tuple[DataFrame, int]:
    """Append an exact 1-based global ``row_number`` over ``order_cols``
    without a single-partition sort. Returns ``(df_with_out_col, n_total)``.

    ``bucket_key`` is the numeric leading sort key used for range
    bucketing (negated internally when ``descending``); it must be
    non-null and must be the first entry of ``order_cols``'s ordering so
    bucket order agrees with row order. ``order_cols`` must be a strict
    total order (unique tiebreak included).

    Cost: two narrow passes over the key column (cutpoints, counts —
    both column-pruned scans with map-side-combined aggregates) plus ONE
    hash shuffle of the full rows. The unpartitioned-window alternative
    shuffles the full rows to one task and sorts serially.
    """
    key = (-bucket_key) if descending else bucket_key
    kdf = df.select(key.cast("double").alias("__k"))
    cuts_row = kdf.agg(
        cutpoint_agg(F.col("__k"), n_buckets, accuracy).alias("cuts")
    ).head()
    cuts = sorted(set(cuts_row["cuts"] or []))  # bucket_expr drops non-finite

    bkt = bucket_expr("__gk", cuts)
    if descending:
        # Spark orders NaN LARGEST: ascending puts NaN rows last, which
        # the fold already honors (NaN > cut is true for every cut →
        # top bucket). Descending puts NaN rows FIRST, but negation
        # leaves NaN as NaN — still landing in the top bucket — so pin
        # them to bucket 0 to agree with the order_cols sort.
        bkt = F.when(F.isnan(F.col("__gk")), F.lit(0)).otherwise(bkt)
    b = df.withColumn("__gk", key.cast("double")).withColumn("__bkt", bkt)
    # The count pass doubles as the non-null precondition check: a NULL
    # key would silently fold into bucket 0 (if(null > c, 1, 0) is 0)
    # while the order_cols sort puts nulls elsewhere — ranks would
    # silently diverge from window semantics, so fail loudly instead.
    # Piggybacked on the same aggregate job; zero extra passes.
    count_rows = b.groupBy("__bkt").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_if(F.col("__gk").isNull()).alias("n_null"),
    ).collect()
    n_null = sum(r["n_null"] for r in count_rows)
    if n_null:
        raise ValueError(
            f"bucket_key has {n_null} NULL value(s); exact global ranking "
            "requires a non-null bucketing key — fill or filter first"
        )
    counts = {r["__bkt"]: r["cnt"] for r in count_rows}
    out, n_total = ranked_from_buckets(
        b, "__bkt", counts, order_cols, out_col=out_col
    )
    return out.drop("__bkt", "__gk"), n_total


def cutpoint_agg(key: Column, n_buckets: int, accuracy: int = 1000) -> Column:
    """The aggregate expression producing ``n_buckets - 1`` approximate
    quantile cutpoints of ``key`` — exposed separately so callers
    ranking several dimensions can batch all cutpoint sketches into ONE
    job (they are all map-side-combined GK sketches)."""
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    return F.percentile_approx(
        key, F.array(*[F.lit(f) for f in fracs]), accuracy
    )


def bucket_expr(key_col: str, cuts: list) -> Column:
    """Monotone bucket id from literal cutpoints over the (numeric,
    pre-negated-if-descending) column named ``key_col``: bucket order
    == key order, equal keys always share a bucket. Emitted as ONE
    generated-SQL fold parsed JVM-side — a 63-branch ``F.when`` chain
    costs ~0.4 s of py4j round-trips PER DIMENSION on the driver
    (measured), while this is a single ``expr`` call.

    Non-finite cutpoints are dropped HERE (not in callers): a ``nan``
    or ``inf`` literal would not parse, and any monotone subset of
    cutpoints still yields exact ranks — only load balance shifts.
    repr of a finite double round-trips through the SQL parser exactly.
    """
    cuts = [c for c in cuts if math.isfinite(c)]
    if not cuts:
        return F.lit(0)
    arr = ",".join(repr(float(c)) for c in cuts)
    return F.expr(
        f"aggregate(array({arr}), 0,"
        f" (acc, c) -> acc + if(cast({key_col} as double) > c, 1, 0))"
    )


def ranked_from_buckets(
    b: DataFrame,
    bucket_col: str,
    counts: dict,
    order_cols: Sequence[Column],
    *,
    out_col: str = "rn",
) -> Tuple[DataFrame, int]:
    """Lift per-bucket local row_numbers to exact global ones using
    precomputed per-bucket counts (a literal prefix-sum — no second
    shuffle). Callers with several rank dimensions compute all their
    count maps in one grouping-sets job and call this per dimension."""
    n_total = sum(counts.values())
    offsets = {}
    acc = 0
    for bk in sorted(counts):
        offsets[bk] = acc
        acc += counts[bk]

    # One generated CASE expression (single JVM parse) instead of a
    # per-bucket F.when chain — same py4j-cost rationale as bucket_expr.
    if offsets:
        branches = " ".join(
            f"WHEN {bk} THEN {off}L" for bk, off in offsets.items()
        )
        off_expr = F.expr(f"CASE {bucket_col} {branches} ELSE 0L END")
    else:
        off_expr = F.lit(0)

    w_local = Window.partitionBy(bucket_col).orderBy(*order_cols)
    out = (
        b.withColumn("__lrn", F.row_number().over(w_local))
        .withColumn(out_col, (off_expr + F.col("__lrn")).cast("bigint"))
        .drop("__lrn")
    )
    return out, n_total


def _idiv(a: Column, b: int) -> Column:
    """Exact integer floor-division for non-negative ``a``: subtract the
    remainder first so the double division is exact (no float-floor
    edge cases up to 2^53)."""
    return ((a - (a % b)) / b).cast("bigint")


def ntile_from_row_number(rn: Column, n_total: int, k: int) -> Column:
    """Exact SQL-standard ``ntile(k)`` from a 1-based global row number:
    the first ``n % k`` tiles get ``n div k + 1`` rows, the rest get
    ``n div k`` (matches both Spark's and DuckDB's ntile). Pure integer
    arithmetic — no window, no shuffle."""
    base = n_total // k
    rem = n_total % k
    big = rem * (base + 1)
    if base == 0:
        return rn.cast("int")
    return (
        F.when(rn <= big, _idiv(rn - 1, base + 1) + 1)
        .otherwise(F.lit(rem) + _idiv(rn - big - 1, base) + 1)
        .cast("int")
    )


def percent_rank_from_row_number(rn: Column, n_total: int) -> Column:
    """``percent_rank() = (rank - 1) / (n - 1)`` under a strict total
    order (row_number == rank). Single-row inputs are defined as 0."""
    if n_total <= 1:
        return F.lit(0.0)
    return (rn - 1).cast("double") / F.lit(float(n_total - 1))
