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
    """Two-phase skew-proof sum: group on (key, xxhash(key-ish row) %
    salt_factor), then re-group on key summing the partials. Result is
    identical to a direct groupBy-sum (float partial order differs — use
    the same rounding discipline as any distributed sum)."""
    out_col = out_col or f"sum_{value_col}"
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_factor))
    partial = (
        df.withColumn("__salt__", salt)
        .groupBy(*key_cols, "__salt__")
        .agg(F.sum(value_col).alias("__partial__"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("__partial__").alias(out_col))
