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
    return F.round(out * factor) / factor


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


def with_global_quantile_flag(
    df: DataFrame,
    value_col: str,
    flag_col: str,
    q: float = 0.9,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Add ``flag_col`` = value > q-quantile of the whole table.

    Two-phase: a 1-row percentile aggregate, broadcast back over the table
    (one scan for the agg, one for the compare — Spark can't do a
    scalar-agg-vs-every-row compare in a single pass).

    ``exact=True`` uses SQL ``percentile`` (exact, linear interpolation —
    matches pandas ``Series.quantile`` and the DuckDB oracle's
    ``percentile_cont``) but buffers EVERY value of ``value_col`` in a
    single aggregation buffer: executor-OOM territory at 100 TB. It is the
    oracle-parity path only.

    ``exact=False`` is the scale path: ``approx_percentile`` with a
    Greenwald-Khanna sketch (bounded memory ≈ O(accuracy), mergeable
    partials). ``accuracy=10_000`` bounds rank error at 1/10000 of the
    rows — at most a sliver of rows near the threshold flip their flag
    relative to exact.
    """
    if exact:
        pct = F.expr(f"percentile({value_col}, {q})")
    else:
        pct = F.expr(f"approx_percentile({value_col}, {q}, {accuracy})")
    thresh = df.select(pct.alias("__q_thresh__"))
    return (
        df.crossJoin(F.broadcast(thresh))
        .withColumn(flag_col, F.col(value_col) > F.col("__q_thresh__"))
        .drop("__q_thresh__")
    )
