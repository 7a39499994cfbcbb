"""Skew-handling operators [EXT].

AQE's skew-join splitting handles joins; for *aggregations* on keys with
pathological hot spots (one key = 10% of a 100 TB fact), the classic fix
is salting: spread each key over ``salt_factor`` sub-keys, partially
aggregate, then aggregate the partials. Two shuffles, but the first —
the one that moves all the data — is uniform by construction; the second
moves only ``distinct_keys × salt_factor`` partial rows.

Only worth it for algebraic aggregates (sum/count/min/max — partials
compose); map-side combine already dampens mild skew, so reach for this
when a single reduce task still dominates the stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_factor: int = 16,
    out_col: str | None = None,
) -> DataFrame:
    """Two-phase skew-proof sum: group on (key, xxhash(whole row) %
    salt_factor), then re-group on key summing the partials. Result is
    identical to a direct groupBy-sum (float partial order differs — use
    the same rounding discipline as any distributed sum).

    The salt hashes STABLE payload columns, never
    monotonically_increasing_id or rand: those change when a failed
    task re-executes, so a retried partition could re-salt its rows
    into different sub-groups mid-shuffle and lose or double-count
    partials — exactly the failure scenarios salting is deployed for.
    Identical rows hash to the same salt, which only matters if one
    key's rows are ALSO massively duplicate-heavy; uniqueness of
    (key, payload) is the realistic case for fact rows."""
    out_col = out_col or f"sum_{value_col}"
    salt = F.pmod(F.abs(F.xxhash64(*df.columns)), F.lit(salt_factor))
    partial = (
        df.withColumn("__salt__", salt)
        .groupBy(*key_cols, "__salt__")
        .agg(F.sum(value_col).alias("__partial__"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial__").alias(out_col))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_factor: int = 8,
) -> DataFrame:
    """Skew-proof shuffle join: when one fact key holds a pathological
    share of the rows AND the dim side is too big to broadcast, a plain
    hash join puts that key's entire volume in one reduce task. Salting
    splits it: the fact side gets a uniform salt in [0, salt_factor)
    (hashed from a per-row column, so no RNG nondeterminism), the dim
    side is REPLICATED once per salt value via a tiny literal-array
    explode, and the join runs on (key, salt) — every reduce task gets
    at most 1/salt_factor of the hot key. Join semantics are identical
    to ``fact.join(dim, fact_key == dim_key)`` (inner); cost is
    dim × salt_factor rows through the shuffle, which is why AQE's
    skew splitting is preferred when it can see the skew — this is the
    explicit form for when it can't (e.g. the skew appears only after
    upstream filters).
    """
    f = fact.withColumn(
        "__fsalt__", F.pmod(F.abs(F.xxhash64(*fact.columns)), F.lit(salt_factor))
    )
    d = dim.withColumn(
        "__dsalt__",
        F.explode(F.array([F.lit(i) for i in range(salt_factor)])),
    )
    return f.join(
        d,
        (F.col(fact_key) == F.col(dim_key)) & (F.col("__fsalt__") == F.col("__dsalt__")),
    ).drop("__fsalt__", "__dsalt__")
