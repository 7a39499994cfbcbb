"""Analytics extensions [EXT]: pivot (long→wide), second-moment
statistics with exact cross-engine parity, and calendar gap-fill —
the reshaping / profiling / time-series-regularization operations a
warehouse user reaches for right after the relational core.

Scale notes (100 TB discipline):
- pivot with an EXPLICIT value list compiles to one hash aggregate
  with N conditional sums — one shuffle, no second values-discovery
  pass over the fact table.
- moment statistics aggregate to integer sums first (one pass,
  map-side partial), so the heavy data reduces exactly; the float
  math happens once per GROUP, not per row.
- gap-fill generates the calendar spine from the aggregated bounds
  (rows ∝ days, not ∝ input) and broadcast-joins the daily aggregate
  into it — the fact table is touched exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.plans.registry import query
from etl_pipeline_orchestration_spark.sources.tables import load_table

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@query(
    "pivot_revenue_by_priority",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           round(sum(CASE WHEN o_orderpriority = '1-URGENT'
                          THEN o_totalprice END), 2) AS urgent,
           round(sum(CASE WHEN o_orderpriority = '2-HIGH'
                          THEN o_totalprice END), 2) AS high,
           round(sum(CASE WHEN o_orderpriority = '3-MEDIUM'
                          THEN o_totalprice END), 2) AS medium,
           round(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
                          THEN o_totalprice END), 2) AS not_specified,
           round(sum(CASE WHEN o_orderpriority = '5-LOW'
                          THEN o_totalprice END), 2) AS low
    FROM orders GROUP BY o_year
    """,
)
def pivot_revenue_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot: order revenue per year × priority class.

    Plan: ``pivot`` with an EXPLICIT value list — Catalyst compiles it
    to a single hash aggregate whose buffer holds one conditional sum
    per pivot value (same plan as the oracle's CASE-WHEN spelling).
    Omitting the list would trigger a hidden extra job to collect
    distinct priorities first — at 100 TB that is a full second scan,
    and nondeterministic output columns besides. A priority class
    absent in a year yields NULL (sum over empty), matching SQL.
    """
    renames = {p: p[2:].lower().replace(" ", "_") for p in _PRIORITIES}
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .pivot("o_orderpriority", _PRIORITIES)
        .agg(F.round(F.sum("o_totalprice"), 2))
        .withColumnsRenamed(renames)
    )


@query(
    "stats_moments_quantity",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
             CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
             CAST(sum(CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sy,
             CAST(sum(CAST(l_linenumber AS BIGINT)
                      * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS syy,
             CAST(sum(CAST(l_quantity AS BIGINT)
                      * CAST(l_linenumber AS BIGINT)) AS BIGINT) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           sqrt((n * sxx - sx * sx) / (n * (n - 1))) AS stddev_qty,
           (n * sxy - sx * sy) / (n * (n - 1)) AS covar_qty_line,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
             AS corr_qty_line
    FROM s
    """,
)
def stats_moments_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev / covariance / correlation per return flag, with
    EXACT cross-engine parity.

    Spark has built-in ``stddev_samp``/``covar_samp``/``corr`` (Welford
    merges — the right tool when parity with another engine is not
    required), but their running float divisions make the last ulps
    depend on partition merge order. Here the aggregate keeps INTEGER
    sums (l_quantity is integral; sums and their pairwise products stay
    < 2^53, so they are exact in both engines), and the textbook
    moment formulas run once per group as an identical double
    expression tree on both sides — bit-equal results, no rounding
    needed. One map-side-combined shuffle on a 3-value key.
    """
    x = F.col("l_quantity").cast("bigint")
    y = F.col("l_linenumber").cast("bigint")
    s = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sx"),
            F.sum(x * x).alias("sxx"),
            F.sum(y).alias("sy"),
            F.sum(y * y).alias("syy"),
            F.sum(x * y).alias("sxy"),
        )
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        "n",
        F.sqrt((n * sxx - sx * sx) / (n * (n - 1))).alias("stddev_qty"),
        ((n * sxy - sx * sy) / (n * (n - 1))).alias("covar_qty_line"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_qty_line"),
    )


@query(
    "daily_revenue_gapfill",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(count(*) AS BIGINT) AS n_orders,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY day
    ),
    bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
    spine AS (
      SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds
    )
    SELECT CAST(s.day AS TIMESTAMP) AS day,
           coalesce(d.n_orders, 0) AS n_orders,
           coalesce(d.revenue, 0.0) AS revenue
    FROM spine s LEFT JOIN daily d USING (day)
    """,
)
def daily_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill: one row per day between the first and last
    order, zero-filled where no orders landed — the regularization
    step before any time-series model over bursty data.

    Plan: the fact table is scanned ONCE into a per-day aggregate
    (rows ∝ days); the spine is generated from that aggregate's
    min/max via ``sequence`` + ``explode`` (driver never sees the
    data); the left join of spine←daily broadcasts — both sides are
    day-cardinality, a few thousand rows even over decades. At 100 TB
    the cost is the one fact scan; everything after is negligible.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )
    spine = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(F.explode(F.sequence("d0", "d1")).alias("day"))
    return spine.join(F.broadcast(daily), "day", "left").select(
        F.col("day").cast("timestamp").alias("day"),
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
    )
