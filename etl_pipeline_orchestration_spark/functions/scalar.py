"""Scalar expression helpers replicating the reference's pandas semantics.

Each helper returns a Column (or DataFrame->DataFrame) built purely from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd; no Python UDFs
in any of these hot paths.

Reference semantics pinned here (see SURVEY.md §4 "semantic traps"):

* safe_divide   — reference etl_pipeline.py:195 (`x / y.replace(0, nan)`)
* month_bucket  — reference etl_pipeline.py:197 (`dt.to_period("M")` → str)
* cut           — reference etl_pipeline.py:204-206 (`pd.cut`, left-open /
                  right-closed intervals; values at/below the first edge or
                  above the last → NULL)
* coerce_numeric— reference etl_pipeline.py:193-194
                  (`pd.to_numeric(errors="coerce").fillna(0)`)
* with_global_quantile_flag — reference etl_pipeline.py:198
                  (`x > x.quantile(q)`, *exact* linear-interpolation
                  percentile — NOT percentile_approx)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def safe_divide(num: Column, den: Column, scale: int | None = 2) -> Column:
    """num / den with NULL (not inf/error) when den = 0, rounded to
    ``scale`` decimals.

    Rounding is scale-then-round-to-integer (``round(x*10^s)/10^s``), not
    ``F.round(x, s)``: division results sit exactly on half-boundaries
    where Spark's BigDecimal HALF_UP over the double's shortest decimal
    repr and other engines' scaled ``std::round`` disagree; rounding at
    integer boundaries is engine-agnostic (halves are exactly
    representable doubles, both round away from zero).
    """
    out = num / F.when(den == 0, F.lit(None)).otherwise(den)
    if scale is None:
        return out
    factor = F.lit(float(10**scale))
    # |x| >= 2^52 has ulp >= 1: fractional rounding is the identity, and
    # x*factor would overflow to inf near DBL_MAX — skip the scaling there
    return F.when(
        F.abs(out) < F.lit(float(2**52)), F.round(out * factor) / factor
    ).otherwise(out)


def month_bucket(ts: Column) -> Column:
    """'YYYY-MM' string bucket of a date/timestamp column."""
    return F.date_format(ts, "yyyy-MM")


def cut(col: Column, bins: Sequence[float], labels: Sequence[str]) -> Column:
    """pandas.cut semantics: intervals (b0,b1], (b1,b2], ... ; values
    <= b0 or > bN (or NULL) map to NULL. Built as a when-chain because
    ml.feature.Bucketizer uses right-open intervals (different edges).
    """
    if len(labels) != len(bins) - 1:
        raise ValueError("need len(labels) == len(bins) - 1")
    expr = None
    for lo, hi, label in zip(bins, bins[1:], labels):
        cond = (col > F.lit(lo)) & (col <= F.lit(hi))
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return expr.otherwise(F.lit(None))


def coerce_numeric(col: Column, fill: float = 0.0) -> Column:
    """Cast to double; unparseable → NULL → ``fill``. ``try_cast`` keeps
    coerce-to-null semantics even under an ANSI-enabled session (the
    correctness driver runs a vanilla Spark 4 session with ANSI on)."""
    return F.coalesce(col.try_cast("double"), F.lit(fill))


def exact_quantile_distributed(
    df: DataFrame, value_col: str, q: float, accuracy: int = 10_000
) -> float | None:
    """EXACT q-quantile (linear interpolation, pandas/percentile_cont
    semantics) with bounded memory at any scale.

    Spark's built-in exact ``percentile`` buffers every value in one
    aggregation buffer — executor OOM at 100 TB. This computes the same
    value in two bounded passes:

    1. one scan: row count n + a deterministic GK-sketch bracket
       [lo, hi] = approx_percentile at q ∓ 2/accuracy (GK rank error is
       a hard ≤ n/accuracy bound, not probabilistic, so the true order
       statistics at ranks ⌊r⌋, ⌈r⌉ lie inside the bracket);
    2. one scan: exact count below lo + collect the ~4n/accuracy
       in-bracket candidates (a few hundred values at any n), then read
       the two order statistics off the sorted candidates and
       interpolate on the driver.

    Falls back to the buffered builtin in the (theoretically impossible,
    defensively handled) case the bracket misses.
    """
    import math

    eps = 2.0 / accuracy
    qlo, qhi = max(0.0, q - eps), min(1.0, q + eps)
    first = df.agg(
        F.count(value_col).alias("n"),
        F.expr(
            f"approx_percentile({value_col}, array({qlo}, {qhi}), {accuracy})"
        ).alias("bracket"),
    ).head()
    n = first["n"]
    if not n:
        return None
    lo, hi = first["bracket"]
    r = (n - 1) * q
    k0, k1 = int(math.floor(r)), int(math.ceil(r))
    c = F.col(value_col)
    second = df.agg(
        F.sum(F.when(c < lo, 1).otherwise(0)).alias("c_lo"),
        F.sort_array(
            F.collect_list(F.when(c.between(lo, hi), c))
        ).alias("cands"),
    ).head()
    c_lo, cands = second["c_lo"] or 0, second["cands"]
    if not (c_lo <= k0 and k1 - c_lo < len(cands)):
        return df.agg(F.expr(f"percentile({value_col}, {q})")).head()[0]
    x0, x1 = cands[k0 - c_lo], cands[k1 - c_lo]
    if k0 == k1:
        return x0
    # Spark's Percentile aggregate interpolates in the weighted-average
    # form, which rounds differently from the lerp form in the last ulp —
    # replicate it exactly for bit-parity with the builtin.
    return (k1 - r) * x0 + (r - k0) * x1


def with_global_quantile_flag(
    df: DataFrame,
    value_col: str,
    flag_col: str,
    q: float = 0.9,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Add ``flag_col`` = value > q-quantile of the whole table.

    ``exact=True`` (default): the distributed exact quantile above —
    identical value to pandas ``Series.quantile`` / SQL ``percentile`` /
    ``percentile_cont``, bounded memory at any scale. The threshold
    enters the plan as a literal, so the compare pass is a plain
    codegen'd filter scan.

    ``exact=False``: single-pass ``approx_percentile`` threshold
    (GK sketch, rank error ≤ n/accuracy) broadcast back over the table —
    one fewer scan when a ±n/accuracy rank tolerance on the flag
    boundary is acceptable.
    """
    if exact:
        thresh_val = exact_quantile_distributed(df, value_col, q, accuracy)
        return df.withColumn(flag_col, F.col(value_col) > F.lit(thresh_val))
    pct = F.expr(f"approx_percentile({value_col}, {q}, {accuracy})")
    thresh = df.select(pct.alias("__q_thresh__"))
    return (
        df.crossJoin(F.broadcast(thresh))
        .withColumn(flag_col, F.col(value_col) > F.col("__q_thresh__"))
        .drop("__q_thresh__")
    )
