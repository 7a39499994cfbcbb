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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.operators.graph import (
    oriented_edges_adaptive,
)
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

    Scale bound: the n·Σx² product stays exact while it fits 2^63 —
    safe to ~10^14 rows per group at these value magnitudes; beyond
    that, cast the sums to DECIMAL(38,0) before the products (both
    engines carry exact 128-bit decimals) and only the final division
    drops to double.
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


@query(
    "rolling_7day_revenue",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             round(sum(o_totalprice), 2) AS rev
      FROM orders GROUP BY day
    )
    SELECT CAST(day AS TIMESTAMP) AS day,
           round(sum(rev) OVER (
             ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) * 100) / 100 AS rolling_rev
    FROM daily
    """,
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day revenue: a RANGE-frame window over event time —
    the frame is bounded by a TIME interval, not a row count, so days
    missing from the data shorten the window (the semantic difference
    vs rowsBetween).

    Plan: the 100 TB fact is reduced to a per-day aggregate first
    (distributed scan + one shuffle), then the range window runs over
    the day-cardinality series — a single partition holding a few
    thousand rows, which is the CORRECT plan: windowing the raw fact
    would sort terabytes to produce the same series. Spark's range
    frame needs a numeric ordering key, so days are ordered on epoch
    seconds with a ±6-day second range; sums are rounded with the
    scale-then-round guard on both engines (7-value float sums can sit
    on representable half-boundaries).
    """
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    epoch = F.col("day").cast("timestamp").cast("long")
    w = Window.orderBy(epoch).rangeBetween(-6 * 86400, 0)
    return daily.select(
        F.col("day").cast("timestamp").alias("day"),
        (F.round(F.sum("rev").over(w) * 100) / 100).alias("rolling_rev"),
    )


@query(
    "histogram_order_totalprice",
    oracle="""
    SELECT CAST(least(floor(o_totalprice / 25000), 19) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY bucket
    """,
)
def histogram_order_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order value (25k buckets, top-capped):
    the profiling primitive behind every data-quality dashboard.

    Plan: pure per-row arithmetic + one low-cardinality hash aggregate
    (≤20 groups) — map-side combine reduces each partition to ≤20
    rows before the shuffle, so the aggregate costs one scan
    regardless of input size. Fixed literal bounds keep it one-pass
    (a min/max-derived binning would need a second scan; when bounds
    are unknown, compute them once and cache, or use approx_percentile
    clipping). Bucket arithmetic is a constant division on identical
    inputs — floor is deterministic on both engines.
    """
    bucket = F.least(F.floor(F.col("o_totalprice") / 25000), F.lit(19))
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(bucket.cast("bigint").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )


@query(
    "fuzzy_part_name_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    blocked AS (
      SELECT p_name, split_part(p_name, ' ', 2) AS block FROM names
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
    FROM blocked a JOIN blocked b
      ON a.block = b.block AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: near-identical name pairs by edit
    distance, BLOCKED so the quadratic comparison never touches the
    full cross product — the entity-resolution primitive.

    Plan: dedupe to the distinct-name domain first (the 100 TB fact
    collapses to its vocabulary), block on the name's head noun (an
    equi-join key), compare only within blocks, and keep pairs with
    levenshtein ≤ 4. Comparisons per block are |block|², so blocking
    quality — not corpus size — bounds the cost; a skewed block would
    get the salted-join treatment. levenshtein is the same classic
    edit distance in Spark and DuckDB — integer, no parity risk.
    """
    names = (
        load_table(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block", F.split(F.col("p_name"), " ").getItem(1))
    )
    b = names.select(F.col("p_name").alias("name_b"), F.col("block").alias("block_b"))
    return (
        names.join(
            b,
            (F.col("block") == F.col("block_b")) & (F.col("p_name") < F.col("name_b")),
        )
        .filter(F.levenshtein("p_name", "name_b") <= 4)
        .select(
            F.col("p_name").alias("name_a"),
            "name_b",
            F.levenshtein("p_name", "name_b").cast("bigint").alias("edit_dist"),
        )
    )


@query(
    "salted_join_event_segment_value",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
)
def salted_join_event_segment_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event value by customer segment through an EXPLICITLY SALTED
    join (operators/skew.py:salted_join): the fact side is spread over
    8 sub-keys, the dim side replicated ×8, the join runs on
    (key, salt). The oracle is the PLAIN join — salting must be
    invisible in the result, which is exactly what the driver check
    proves. Use when one key dominates the fact and the dim is too big
    to broadcast; AQE skew-splitting is the implicit alternative.
    """
    from etl_pipeline_orchestration_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(ev, cust, "user_id", "c_custkey", salt_factor=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@query(
    "revenue_share_by_nation",
    oracle="""
    WITH nat_rev AS (
      SELECT n_name,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, revenue,
           CAST(round(revenue * 10000 / sum(revenue) OVER ()) AS BIGINT)
             AS share_bp
    FROM nat_rev
    """,
)
def revenue_share_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total: each nation's share of global revenue — the
    ratio-to-report window shape (an aggregate window over an empty
    partition spec).

    Plan: the expensive part is the star aggregate (facts shuffle on
    their join keys, 25-row nation broadcasts); the unpartitioned
    window then runs over the 25-row AGGREGATE — windowing a
    pre-aggregated frame is what makes a global-total window safe at
    any scale. Share emitted as integer basis points (division +
    fractional rounding is the classic cross-engine half-boundary
    trap).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    from pyspark.sql import Window

    nat_rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    total = F.sum("revenue").over(Window.partitionBy())
    return nat_rev.select(
        "n_name",
        "revenue",
        F.round(F.col("revenue") * 10000 / total).cast("bigint").alias("share_bp"),
    )


@query(
    "order_lineitems_collected",
    oracle="""
    SELECT l_orderkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           array_to_string(list(l_linenumber ORDER BY l_linenumber), ',')
             AS line_numbers
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    GROUP BY l_orderkey
    """,
)
def order_lineitems_collected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-to-array collection: each order's line numbers as one
    ordered, serialized value — the denormalization step before
    feeding nested records to a document store or a feature pipeline.

    Plan: ``collect_list`` inside the hash aggregate (one shuffle);
    ``sort_array`` pins the intra-group order (collection order is
    partition-dependent, so an unsorted list is nondeterministic —
    the same trap as any order-sensitive aggregate), and the array is
    SERIALIZED with concat_ws because array cells are unhashable for
    the driver's canonicalizer. The %100 predicate keeps the sample
    deterministic and scan-prunable.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    )
    return li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.concat_ws(",", F.sort_array(F.collect_list("l_linenumber"))).alias(
            "line_numbers"
        ),
    )


@query(
    "data_quality_report",
    oracle="""
    SELECT 'o_totalprice_nonpositive' AS rule,
           CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'o_orderdate_null',
           CAST(count(CASE WHEN o_orderdate IS NULL THEN 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate_future',
           CAST(count(CASE WHEN o_orderdate >= TIMESTAMP '2002-01-01'
                      THEN 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_orphan_custkey',
           CAST(count(*) AS BIGINT)
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    """,
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation checking: a (rule, violation-count) report over
    range, null, freshness, and referential-integrity rules — the
    validation gate an ETL runs before publishing a load.

    Plan: all single-table rules evaluate in ONE scan (conditional
    counts in a single aggregate, then unpivoted to rows); the FK rule
    is a left-anti join against the parent keys (shuffle on custkey;
    broadcast when the parent is dim-sized, as here). Violation counts
    rather than violating rows: at 100 TB you page the report, then
    drill into a specific rule with a filter — you never collect the
    violations themselves.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust_keys = load_table(spark, sf_dir, "customer").select("c_custkey")
    single = orders.agg(
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).cast("bigint").alias(
            "o_totalprice_nonpositive"
        ),
        F.count(F.when(F.col("o_orderdate").isNull(), 1)).cast("bigint").alias(
            "o_orderdate_null"
        ),
        F.count(
            F.when(
                F.col("o_orderdate") >= F.lit("2002-01-01").cast("timestamp"), 1
            )
        ).cast("bigint").alias("o_orderdate_future"),
    )
    melted = single.unpivot([], single.columns, "rule", "n_violations")
    orphans = (
        orders.join(
            F.broadcast(cust_keys),
            orders.o_custkey == cust_keys.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
        .select(F.lit("orders_orphan_custkey").alias("rule"), "n_violations")
    )
    return melted.unionAll(orphans)


@query(
    "consistent_sample_orders_lineitems",
    oracle="""
    WITH sampled AS (
      SELECT o_orderkey FROM orders
      WHERE (((o_orderkey % 2147483648) * 2654435761) % 4294967296) % 1000 < 50
    )
    SELECT l_orderkey,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l_extendedprice), 2) AS total_price
    FROM lineitem JOIN sampled ON l_orderkey = o_orderkey
    GROUP BY l_orderkey
    """,
)
def consistent_sample_orders_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referentially-consistent subsetting: a deterministic 5% sample
    of PARENT orders, with each sampled order's COMPLETE lineitem set
    — how you build a dev-sized copy of a warehouse that still joins
    correctly (sampling each table independently would orphan ~95% of
    child rows).

    Plan: the parent sample is a scan-level Knuth-bucket filter; the
    child table is restricted by a left-semi join on the parent key —
    one shuffle (or broadcast while the sampled key set fits, as at
    test SF). Child completeness is structural: membership is decided
    only by the parent key.
    """
    from etl_pipeline_orchestration_spark.operators.sampling import bucket_of

    sampled = (
        load_table(spark, sf_dir, "orders")
        .filter(bucket_of(F.col("o_orderkey")) < 50)
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(sampled), li.l_orderkey == sampled.o_orderkey, "left_semi"
        )
        .groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(t_view) AS BIGINT) AS n_viewed,
           CAST(count(CASE WHEN t_click > t_view THEN 1 END) AS BIGINT)
             AS n_clicked_after_view,
           CAST(count(CASE WHEN t_purchase > t_click AND t_click > t_view
                      THEN 1 END) AS BIGINT) AS n_full_funnel
    FROM firsts
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: users whose FIRST view precedes their
    first click precedes their first purchase — the product-analytics
    staple.

    Plan: one shuffle on user_id computing three conditional
    first-touch timestamps in a single aggregate (no per-stage scans,
    no self-joins — the naive 3-way self-join on a 100 TB event log is
    the classic anti-pattern this replaces), then a 1-row conditional
    count over the per-user frame. Timestamp comparisons are exact —
    no float discipline needed.
    """
    ev = load_table(spark, sf_dir, "events")

    def first_of(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    firsts = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    after = F.col("t_click") > F.col("t_view")
    full = (F.col("t_purchase") > F.col("t_click")) & after
    return firsts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count("t_view").cast("bigint").alias("n_viewed"),
        F.count(F.when(after, 1)).cast("bigint").alias("n_clicked_after_view"),
        F.count(F.when(full, 1)).cast("bigint").alias("n_full_funnel"),
    )


@query(
    "weekly_cohort_retention",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, c.cohort_week,
             date_diff('day', c.cohort_week,
                       date_trunc('week', e.ts)) // 7 AS week_offset
      FROM events e JOIN cohorts c ON e.user_id = c.user_id
    )
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted in
    each later week they were active — the retention-curve input.

    Plan: two shuffles on user_id (cohort assignment, then the
    activity join — co-partitioned, so AQE keeps them on one
    exchange where sizes allow) and a distinct + count on the
    (cohort, offset) pair. Weeks via date_trunc on BOTH engines
    (both truncate to Monday); the offset is integer day arithmetic —
    exact everywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    cohorts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week"))
                / 7
            ).alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active_users")
    ).select(
        F.col("cohort_week").cast("timestamp").alias("cohort_week"),
        F.col("week_offset").cast("bigint").alias("week_offset"),
        "n_active_users",
    )


@query(
    "robust_stats_quantity",
    oracle="""
    WITH med AS (
      SELECT l_returnflag, median(l_quantity) AS med_qty
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag, m.med_qty,
           median(abs(l.l_quantity - m.med_qty)) AS mad_qty
    FROM lineitem l JOIN med m ON l.l_returnflag = m.l_returnflag
    GROUP BY l.l_returnflag, m.med_qty
    """,
)
def robust_stats_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust statistics: per-group median and median absolute
    deviation — the outlier-resistant center/spread pair used for
    anomaly thresholds where mean/stddev would chase the outliers.

    Two grouped exact percentiles (median, then median of absolute
    deviations from it) — cross-engine exact HERE because l_quantity
    is integral: medians land on integers or exact halves, where
    Spark's weighted-average interpolation and DuckDB's lerp agree to
    the bit. At 100 TB swap ``percentile`` for ``approx_percentile``
    (the exact grouped percentile buffers each group in one
    aggregation buffer — the same scale cliff the P6 quantile flag
    documents).
    """
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy(F.col("l_returnflag").alias("mf")).agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med_qty")
    )
    return (
        li.join(F.broadcast(med), li.l_returnflag == med.mf)
        .groupBy("l_returnflag", "med_qty")
        .agg(
            F.expr("percentile(abs(l_quantity - med_qty), 0.5)").alias("mad_qty")
        )
        .select("l_returnflag", "med_qty", "mad_qty")
    )


@query(
    "scd2_user_event_intervals",
    oracle="""
    SELECT user_id,
           event_type,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) IS NULL
                THEN TRUE ELSE FALSE END AS is_current
    FROM events
    WHERE user_id % 50 = 0
    """,
)
def scd2_user_event_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 interval construction: each state row gets
    [valid_from, valid_to) from its own and its successor's timestamp,
    open-ended (is_current) on the latest — how a mutable dimension
    becomes a full-history table you can as-of join against.

    Plan: one window shuffle on the dimension's natural key; ``lead``
    with an (ts, event_id) tiebreak so duplicate timestamps can't flip
    interval boundaries between runs (the same determinism rule as
    sessionization). The %50 predicate keeps the driver-compared
    sample small; semantics are per-key, so it changes nothing else.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return ev.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "monthly_revenue_growth",
    oracle="""
    WITH monthly AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY month
    )
    SELECT month, revenue,
           CAST(round(
             (revenue - lag(revenue) OVER (ORDER BY month)) * 10000
             / lag(revenue) OVER (ORDER BY month)
           ) AS BIGINT) AS growth_bp
    FROM monthly
    """,
)
def monthly_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period: month-over-month revenue growth in basis
    points — the lag-ratio shape behind every trend dashboard.

    Plan: the fact reduces to a month-cardinality aggregate first; the
    unpartitioned lag window then runs over dozens of rows (windowing
    the pre-aggregate, same scale rule as the rolling and
    ratio-to-report entries). First month's growth is NULL (lag over
    nothing) on both engines; the ratio is emitted as integer basis
    points.
    """
    from pyspark.sql import Window

    monthly = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    prev = F.lag("revenue").over(Window.orderBy("month"))
    return monthly.select(
        "month",
        "revenue",
        F.round((F.col("revenue") - prev) * 10000 / prev)
        .cast("bigint")
        .alias("growth_bp"),
    )


@query(
    "daily_revenue_anomalies",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             round(sum(o_totalprice), 2) AS revenue
      FROM orders GROUP BY day
    ),
    stats AS (
      SELECT median(revenue) AS med FROM daily
    ),
    dev AS (
      SELECT d.day, d.revenue, s.med,
             median(abs(d.revenue - s.med)) OVER () AS mad
      FROM daily d, stats s
    )
    SELECT CAST(day AS TIMESTAMP) AS day, revenue,
           round(med * 100) / 100 AS med_revenue
    FROM dev
    WHERE abs(revenue - med) > 5 * mad
    """,
)
def daily_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: days whose revenue deviates from the
    median by more than 5 median-absolute-deviations — the
    outlier-resistant alert rule (mean/stddev thresholds move with the
    very outliers they should flag).

    Plan: composition of the gap-fill aggregate and the robust-stats
    pattern — the fact reduces to day cardinality first; median and
    MAD are computed over that small frame (exact percentile is fine
    at day scale; it is the 100 TB raw fact where you'd switch to
    approx_percentile). The 5·MAD comparison runs on identical floats
    both sides — medians select/average existing 2dp values, so no
    rounding discipline is needed on the threshold itself.
    """
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    med = daily.agg(F.expr("percentile(revenue, 0.5)").alias("med"))
    dev = daily.join(F.broadcast(med))
    mad = dev.agg(
        F.expr("percentile(abs(revenue - med), 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad))
        .filter(F.abs(F.col("revenue") - F.col("med")) > 5 * F.col("mad"))
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "revenue",
            (F.round(F.col("med") * 100) / 100).alias("med_revenue"),
        )
    )


_SQL_TOP_CUSTOMERS = """
    WITH cust_rev AS (
      SELECT c_custkey, c_name, c_mktsegment,
             round(sum(o_totalprice), 2) AS revenue,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM {orders} JOIN {customer} ON o_custkey = c_custkey
      GROUP BY c_custkey, c_name, c_mktsegment
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY c_mktsegment
               ORDER BY revenue DESC, c_custkey
             ) AS rk
      FROM cust_rev
    )
    SELECT c_mktsegment, CAST(rk AS BIGINT) AS rk, c_custkey, c_name,
           revenue, n_orders
    FROM ranked WHERE rk <= 3
"""


@query(
    "sql_cte_top_customers",
    oracle=_SQL_TOP_CUSTOMERS.format(orders="orders", customer="customer"),
)
def sql_cte_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by revenue per segment, written as ONE SQL
    string with CTEs and executed via ``spark.sql`` over temp views —
    the SQL-first authoring path. The oracle is the IDENTICAL text run
    on DuckDB: ANSI SQL is the portability layer, Catalyst compiles it
    to the same ranked-window plan the DataFrame API would produce
    (deterministic (revenue DESC, custkey) tiebreak, rank filter
    pushed into the window as a top-k)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        _SQL_TOP_CUSTOMERS.format(orders="orders_v", customer="customer_v")
    )


@query(
    "union_harmonized_flows",
    oracle="""
    SELECT flow, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(amount) AS BIGINT) AS n_with_amount,
           CAST(count(segment) AS BIGINT) AS n_with_segment
    FROM (
      SELECT 'orders' AS flow, o_totalprice AS amount,
             NULL::VARCHAR AS segment FROM orders
      UNION ALL BY NAME
      SELECT 'customers' AS flow, NULL::DOUBLE AS amount,
             c_mktsegment AS segment FROM customer
    )
    GROUP BY flow
    """,
)
def union_harmonized_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-harmonizing union: two flows with DIFFERENT columns
    stacked by NAME, absent columns null-filled
    (``unionByName(allowMissingColumns=True)``) — how heterogeneous
    source extracts merge into one conformed stream without positional
    accidents (plain UNION matches by position and silently pairs
    unrelated columns).

    Plan: narrow per-source projections + a zero-shuffle union; the
    count aggregate is the only exchange.
    """
    orders = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.lit("orders").alias("flow"),
            F.col("o_totalprice").alias("amount"),
        )
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(
            F.lit("customers").alias("flow"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    return (
        orders.unionByName(cust, allowMissingColumns=True)
        .groupBy("flow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("amount").cast("bigint").alias("n_with_amount"),
            F.count("segment").cast("bigint").alias("n_with_segment"),
        )
    )


@query(
    "hour_band_counts",
    oracle="""
    SELECT CAST(sum(CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END) AS BIGINT)
             AS night,
           CAST(sum(CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 1 ELSE 0 END)
                AS BIGINT) AS morning,
           CAST(sum(CASE WHEN hour(ts) BETWEEN 12 AND 17 THEN 1 ELSE 0 END)
                AS BIGINT) AS afternoon,
           CAST(sum(CASE WHEN hour(ts) >= 18 THEN 1 ELSE 0 END) AS BIGINT)
             AS evening,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    """,
)
def hour_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-band profiling in ONE scan: four time-of-day conditional
    counts plus a distinct-user count from a single pass over the
    events fact — the TPC-DS-Q88 shape. The naive form is one scan per
    band (4× the I/O at 100 TB); conditional aggregation folds them
    into one map-side-combined aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    h = F.hour("ts")

    def band(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    return ev.agg(
        band(h < 6).alias("night"),
        band(h.between(6, 11)).alias("morning"),
        band(h.between(12, 17)).alias("afternoon"),
        band(h >= 18).alias("evening"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


@query(
    "snapshot_timetravel_diff",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_added,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents_added
    FROM orders WHERE o_orderkey % 3 = 0
    GROUP BY o_orderstatus
    """,
)
def snapshot_timetravel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel diff through the VERSIONED warehouse itself
    (loader.SnapshotTable): publish version 0 (orders minus every
    third key — yesterday's table), publish version 1 (all orders —
    today's), then compute what today added by anti-joining the
    CURRENT read against the ``version=0`` read. The DuckDB oracle
    derives the same answer directly from the raw table, so a hash
    match proves the snapshot layer round-trips data faithfully AND
    that time travel returns the exact old version after the pointer
    has moved on — the storage feature is driver-grade verified, not
    just unit-tested. Money compares as integer cents (exact-2dp
    doubles round-trip parquet bit-exactly).

    Plan: two snapshot writes (scratch warehouse, same write path the
    streaming sinks use), one anti join on the key, one aggregate. The
    scratch dir cannot be removed before the returned plan is collected
    (it reads the snapshot files lazily), so cleanup registers at
    process exit — repeated invocations in one harness run reclaim
    everything when the session ends."""
    import atexit
    import shutil
    import tempfile

    from etl_pipeline_orchestration_spark.loader import (
        SnapshotTable,
        WarehouseLoader,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    scratch = tempfile.mkdtemp(prefix="etl_snaps_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    loader = WarehouseLoader(spark, scratch)
    snaps = SnapshotTable(loader, "orders")
    snaps.write(orders.filter(F.col("o_orderkey") % 3 != 0))
    snaps.write(orders)
    added = snaps.read().join(
        snaps.read(version=0).select("o_orderkey"), "o_orderkey", "left_anti"
    )
    return added.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_added"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents_added"),
    )


@query(
    "upsert_timetravel_diff",
    oracle="""
    WITH final AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS price,
             CASE WHEN o_orderkey % 2 = 0 THEN
                    (CASE WHEN o_orderkey % 3 = 0 THEN 'added'
                          ELSE 'changed' END)
                  ELSE 'unchanged' END AS change_type
      FROM orders
      WHERE o_orderkey % 3 <> 0 OR o_orderkey % 2 = 0
    )
    SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(price * 100) AS BIGINT)) AS BIGINT)
             AS cents_total
    FROM final GROUP BY change_type
    """,
)
def upsert_timetravel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merged THROUGH the snapshot-versioned streaming upsert, then
    audited by time travel: batch 0 (orders minus every third key,
    seq 1) and batch 1 (every even key with a price bump, seq 2) run
    through upsert_batch_versioned — the exact function the streaming
    sink invokes per micro-batch — publishing one snapshot version
    each. The result classifies every CURRENT row as added / changed /
    unchanged by diffing against the version-0 read, FROM THE STORED
    DATA (no replay of the derivation). The DuckDB oracle derives the
    same classification from raw orders, so a hash match proves the
    sequence-aware merge semantics AND that version 0 is still exactly
    readable after the pointer advanced — streamed CDC now gets the
    same time-travel audit the batch snapshot query pins.

    Plan: two versioned merges (dedup window + full-outer join each,
    both key-partitioned), one left join v1⋈v0, one 3-group aggregate.
    Scratch snapshots clean up at process exit (same discipline as
    snapshot_timetravel_diff)."""
    import atexit
    import shutil
    import tempfile

    from etl_pipeline_orchestration_spark.loader import (
        SnapshotTable,
        WarehouseLoader,
    )
    from etl_pipeline_orchestration_spark.streaming.upsert import (
        upsert_batch_versioned,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    scratch = tempfile.mkdtemp(prefix="etl_upsert_snaps_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    loader = WarehouseLoader(spark, scratch)
    snaps = SnapshotTable(loader, "orders_cdc")
    b0 = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", F.lit(1).alias("seq"), "o_totalprice"
    )
    b1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        F.lit(2).alias("seq"),
        (F.col("o_totalprice") + 1.0).alias("o_totalprice"),
    )
    app = scratch  # checkpoint identity for the watermark
    upsert_batch_versioned(snaps, "o_orderkey", b0, "seq", 0, app)
    upsert_batch_versioned(snaps, "o_orderkey", b1, "seq", 1, app)
    v0 = snaps.read(version=snaps.versions()[0]).select(
        "o_orderkey", F.col("o_totalprice").alias("old_price")
    )
    j = snaps.read().join(v0, "o_orderkey", "left")
    change_type = (
        F.when(F.col("old_price").isNull(), F.lit("added"))
        .when(F.col("o_totalprice") != F.col("old_price"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.groupBy(change_type.alias("change_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents_total"),
    )


@query(
    "snapshot_diff_orders",
    oracle="""
    WITH snap_b AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice,
             o_orderstatus
      FROM orders WHERE o_orderkey % 97 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 101 = 0
    ),
    diff AS (
      SELECT coalesce(a.o_orderkey, b.o_orderkey) AS key,
             CASE
               WHEN a.o_orderkey IS NULL THEN 'added'
               WHEN b.o_orderkey IS NULL THEN 'removed'
               WHEN a.o_totalprice <> b.o_totalprice
                 OR a.o_orderstatus <> b.o_orderstatus THEN 'changed'
               ELSE 'unchanged'
             END AS change_type
      FROM orders a FULL OUTER JOIN snap_b b ON a.o_orderkey = b.o_orderkey
    )
    SELECT change_type, CAST(count(*) AS BIGINT) AS n_rows
    FROM diff GROUP BY change_type
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff: classify every key as added / removed / changed /
    unchanged between two table versions — the data-versioning
    primitive behind reconciliation, CDC validation, and "what did
    this backfill actually touch" audits. (Version B is derived
    deterministically here: some prices bumped, some keys deleted —
    both engines construct the identical snapshot.)

    Plan: ONE full-outer shuffle join on the key (same single-shuffle
    discipline as the CDC merge), change classification as a per-row
    CASE, then a 4-group aggregate. At 100 TB both sides shuffle once
    on the key; nothing driver-side.
    """
    a = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 100 == 0, F.col("o_totalprice") + 1.0
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionAll(
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") % 101 == 0)
            .select(
                (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    a2 = a.select(
        F.col("o_orderkey").alias("ka"),
        F.col("o_totalprice").alias("pa"),
        F.col("o_orderstatus").alias("sa"),
    )
    b2 = b.select(
        F.col("o_orderkey").alias("kb"),
        F.col("o_totalprice").alias("pb"),
        F.col("o_orderstatus").alias("sb"),
    )
    change = (
        F.when(F.col("ka").isNull(), "added")
        .when(F.col("kb").isNull(), "removed")
        .when(
            (F.col("pa") != F.col("pb")) | (F.col("sa") != F.col("sb")), "changed"
        )
        .otherwise("unchanged")
    )
    return (
        a2.join(b2, a2.ka == b2.kb, "full_outer")
        .select(change.alias("change_type"))
        .groupBy("change_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )


@query(
    "variant_props_stats",
    oracle="""
    SELECT CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS min_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS max_k,
           CAST(count(CASE WHEN CAST(json_extract_string(props, '$.k')
                                     AS BIGINT) > 50 THEN 1 END)
                AS BIGINT) AS n_high
    FROM events
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured processing through the VARIANT type (Spark 4):
    ``parse_json`` once into a binary variant, then typed
    ``variant_get`` extractions — the modern replacement for repeated
    ``get_json_object`` string re-parsing (variant decodes the JSON
    ONCE per row into a traversable binary, so N extractions cost one
    parse, and the column can be stored parsed in parquet).

    The oracle extracts the same field with DuckDB's JSON functions —
    same values, engine-appropriate mechanism on each side.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return ev.agg(
        F.min(k).cast("bigint").alias("min_k"),
        F.max(k).cast("bigint").alias("max_k"),
        F.count(F.when(k > 50, 1)).cast("bigint").alias("n_high"),
    )


_LATERAL_SQL = """
    SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
    FROM {customer} c,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM {orders} o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 1
    ) t
    WHERE c.c_custkey % 200 = 0
"""


@query(
    "lateral_top_order_per_customer",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders"),
)
def lateral_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's single largest
    order via a per-row derived table — the SQL-standard spelling of
    top-1-per-group (identical text runs on both engines; Catalyst
    decorrelates it to the same ranked-window/aggregate plan the
    DataFrame API produces, NOT a per-row re-execution). Deterministic
    inner ordering (price DESC, orderkey) so ties can't flip the
    selected row.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lv")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lv")
    return spark.sql(
        _LATERAL_SQL.format(customer="customer_lv", orders="orders_lv")
    )


@query(
    "interval_overlap_join",
    oracle="""
    WITH act AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             min(ts) AS s, max(ts) AS e
      FROM events GROUP BY 1, 2
    ), win AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS wday,
             min(ts) AS ws, min(ts) + INTERVAL 2 HOUR AS we
      FROM events WHERE event_type = 'error' GROUP BY 1
    )
    SELECT a.user_id, a.day, w.wday,
           epoch_us(least(a.e, w.we)) - epoch_us(greatest(a.s, w.ws))
             AS overlap_us
    FROM act a JOIN win w ON a.s < w.we AND w.ws < a.e
    """,
)
def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (two interval sets, overlap predicate) via
    BIN BUCKETING — the scale pattern behind range-join optimization:
    a bare ``a.s < b.e AND b.s < a.e`` join has no equi-key, so Spark
    plans broadcast-nested-loop (O(n·m) compares). Instead each interval
    explodes into the fixed-width time bins it spans (here 1 h; pick
    ~median interval width at scale), the join becomes an EQUI-join on
    bin id, `distinct` collapses multi-bin matches, and the exact
    predicate runs as a residual filter. Cost: |rows| × avg-bins-spanned
    shuffled hash-join rows instead of a quadratic loop; at 100 TB the
    bin join shuffles on uniformly distributed bin ids.

    Demo intervals: per-user-per-day activity spans [first,last event]
    vs per-day incident windows [first error, +2 h]. overlap_us is an
    exact integer (microsecond epochs) — no float parity risk.
    """
    ev = load_table(spark, sf_dir, "events")
    act = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    win = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("day", "ts").alias("wday"))
        .agg(F.min("ts").alias("ws"))
        .withColumn("we", F.col("ws") + F.expr("INTERVAL 2 HOURS"))
    )
    hour_us = 3_600_000_000
    act_b = act.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros("s") / hour_us),
                F.floor(F.unix_micros("e") / hour_us),
            )
        ),
    )
    win_b = win.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros("ws") / hour_us),
                F.floor(F.unix_micros("we") / hour_us),
            )
        ),
    )
    return (
        act_b.join(win_b, "bkt")
        .filter((F.col("s") < F.col("we")) & (F.col("ws") < F.col("e")))
        .select("user_id", "day", "wday", "s", "e", "ws", "we")
        .distinct()
        .select(
            "user_id",
            "day",
            "wday",
            (
                F.unix_micros(F.least("e", "we"))
                - F.unix_micros(F.greatest("s", "ws"))
            ).alias("overlap_us"),
        )
    )


@query(
    "interpolate_missing_daily_counts",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             count(*) AS n
      FROM orders GROUP BY 1
    ), masked AS (
      SELECT day,
             CASE WHEN date_part('day', day) % 5 <> 0 THEN n END AS n_obs
      FROM daily
    ), w AS (
      SELECT day, n_obs,
        last_value(n_obs IGNORE NULLS) OVER
          (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS prev,
        last_value(CASE WHEN n_obs IS NOT NULL THEN day END IGNORE NULLS)
          OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS prev_day,
        first_value(n_obs IGNORE NULLS) OVER
          (ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
          AS nxt,
        first_value(CASE WHEN n_obs IS NOT NULL THEN day END IGNORE NULLS)
          OVER (ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
          AS nxt_day
      FROM masked
    )
    SELECT day, CAST(n_obs AS BIGINT) AS n_obs,
      CASE WHEN n_obs IS NOT NULL THEN CAST(n_obs AS DOUBLE)
           WHEN prev IS NULL THEN CAST(nxt AS DOUBLE)
           WHEN nxt IS NULL THEN CAST(prev AS DOUBLE)
           ELSE CAST(prev AS DOUBLE)
                + (CAST(nxt AS DOUBLE) - CAST(prev AS DOUBLE))
                  * (CAST(date_diff('day', prev_day, day) AS DOUBLE)
                     / CAST(date_diff('day', prev_day, nxt_day) AS DOUBLE))
      END AS n_filled
    FROM w
    """,
)
def interpolate_missing_daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear time-series imputation: daily order counts with a
    deterministic mask (every 5th day-of-month nulled), missing points
    reconstructed by linear interpolation between the nearest observed
    neighbors (``last/first ignorenulls`` windows); series edges fall
    back to nearest-neighbor.

    Scale shape: the windows run over the DAILY AGGREGATE (rows ∝ days,
    not input rows), so the unpartitioned global sort is over thousands
    of rows even at 100 TB of raw orders — aggregate first, window
    second. Interpolated values derive from exact integer counts and
    day offsets with the identical expression tree on both engines, so
    the doubles are bit-identical without rounding.
    """
    from pyspark.sql import Window

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    masked = daily.select(
        "day",
        F.when(F.dayofmonth("day") % 5 != 0, F.col("n")).alias("n_obs"),
    )
    w_prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.orderBy("day").rowsBetween(0, Window.unboundedFollowing)
    obs_day = F.when(F.col("n_obs").isNotNull(), F.col("day"))
    w = masked.select(
        "day",
        "n_obs",
        F.last("n_obs", ignorenulls=True).over(w_prev).alias("prev"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("prev_day"),
        F.first("n_obs", ignorenulls=True).over(w_next).alias("nxt"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("nxt_day"),
    )
    frac = F.datediff("day", "prev_day").cast("double") / F.datediff(
        "nxt_day", "prev_day"
    ).cast("double")
    filled = (
        F.when(F.col("n_obs").isNotNull(), F.col("n_obs").cast("double"))
        .when(F.col("prev").isNull(), F.col("nxt").cast("double"))
        .when(F.col("nxt").isNull(), F.col("prev").cast("double"))
        .otherwise(
            F.col("prev").cast("double")
            + (F.col("nxt").cast("double") - F.col("prev").cast("double")) * frac
        )
    )
    return w.select("day", "n_obs", filled.alias("n_filled"))


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY prev_type)
                                    AS DOUBLE) AS prob
    FROM pairs
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | previous event type). One lag window
    partitioned by user (single shuffle on user_id, arbitrarily
    parallel), then a hash aggregate down to |types|² rows; the
    normalizing row-sum window runs on that tiny aggregate, not the
    fact table. Deterministic ordering via the (ts, event_id) tiebreak
    — duplicate timestamps must not flake the hash compare. prob is an
    exact-int division, bit-identical cross-engine.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w_tot).cast("double")).alias(
            "prob"
        ),
    )


@query(
    "winsorized_price_stats",
    oracle="""
    WITH s AS (
      SELECT l_extendedprice AS v,
             row_number() OVER (ORDER BY l_extendedprice) - 1 AS rn,
             count(*) OVER () AS n
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ), b AS (
      SELECT
        max(CASE WHEN rn = CAST(floor((n-1)*CAST(0.05 AS DOUBLE)) AS BIGINT) THEN v END)
          AS lo0,
        max(CASE WHEN rn = CAST(ceil((n-1)*CAST(0.05 AS DOUBLE)) AS BIGINT) THEN v END)
          AS lo1,
        max(CASE WHEN rn = CAST(floor((n-1)*CAST(0.95 AS DOUBLE)) AS BIGINT) THEN v END)
          AS hi0,
        max(CASE WHEN rn = CAST(ceil((n-1)*CAST(0.95 AS DOUBLE)) AS BIGINT) THEN v END)
          AS hi1,
        any_value(n) AS n
      FROM s
    ), bounds AS (
      SELECT
        CASE WHEN floor((n-1)*CAST(0.05 AS DOUBLE)) = ceil((n-1)*CAST(0.05 AS DOUBLE)) THEN lo0
             ELSE (ceil((n-1)*CAST(0.05 AS DOUBLE)) - (n-1)*CAST(0.05 AS DOUBLE)) * lo0
                  + ((n-1)*CAST(0.05 AS DOUBLE) - floor((n-1)*CAST(0.05 AS DOUBLE))) * lo1 END AS p05,
        CASE WHEN floor((n-1)*CAST(0.95 AS DOUBLE)) = ceil((n-1)*CAST(0.95 AS DOUBLE)) THEN hi0
             ELSE (ceil((n-1)*CAST(0.95 AS DOUBLE)) - (n-1)*CAST(0.95 AS DOUBLE)) * hi0
                  + ((n-1)*CAST(0.95 AS DOUBLE) - floor((n-1)*CAST(0.95 AS DOUBLE))) * hi1 END AS p95
      FROM b
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN l_extendedprice < p05 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_low,
           CAST(sum(CASE WHEN l_extendedprice > p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped_high,
           min(least(greatest(l_extendedprice, p05), p95)) AS min_w,
           max(least(greatest(l_extendedprice, p05), p95)) AS max_w,
           round(sum(least(greatest(l_extendedprice, p05), p95)) * 100)
             / 100 AS sum_w_2dp
    FROM lineitem, bounds
    GROUP BY l_returnflag, p05, p95
    """,
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization (percentile clamping, the standard outlier-robust
    feature-engineering step): clamp l_extendedprice to its global
    [p05, p95], then per-flag stats on the clamped values.

    Scale path: the two bounds come from
    ``scalar.exact_quantile_distributed`` — bounded memory at any n
    (GK-sketch bracket + in-bracket candidates; never the builtin
    ``percentile`` whose single buffer OOMs at 100 TB) — and enter the
    plan as LITERALS, so the stats pass is one codegen'd scan + hash
    aggregate. The oracle reproduces Spark's weighted-average
    interpolation form ``(k1-r)*x0 + (r-k0)*x1`` explicitly (DuckDB's
    quantile_cont lerps — differs in the last ulp, and the bound itself
    appears in min_w/max_w, so the form must match bit-for-bit).
    """
    from etl_pipeline_orchestration_spark.functions.scalar import (
        exact_quantile_distributed,
    )

    li = load_table(spark, sf_dir, "lineitem")
    p05 = exact_quantile_distributed(li, "l_extendedprice", 0.05)
    p95 = exact_quantile_distributed(li, "l_extendedprice", 0.95)
    c = F.col("l_extendedprice")
    w = F.least(F.greatest(c, F.lit(p05)), F.lit(p95))
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(c < p05, 1).otherwise(0)).cast("bigint").alias(
            "n_clamped_low"
        ),
        F.sum(F.when(c > p95, 1).otherwise(0)).cast("bigint").alias(
            "n_clamped_high"
        ),
        F.min(w).alias("min_w"),
        F.max(w).alias("max_w"),
        (F.round(F.sum(w) * 100) / 100).alias("sum_w_2dp"),
    )


@query(
    "entity_resolution_parts",
    oracle="""
    WITH RECURSIVE names AS (
      SELECT p_name, min(p_partkey) AS nid, count(*) AS n_parts
      FROM part GROUP BY p_name
    ), blocked AS (
      SELECT p_name, nid, n_parts, split_part(p_name, ' ', 2) AS block
      FROM names
    ), pairs AS (
      SELECT a.nid AS s, b.nid AS d
      FROM blocked a JOIN blocked b
        ON a.block = b.block AND a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 4
    ), edges AS (SELECT s, d FROM pairs UNION SELECT d, s FROM pairs),
    nodes AS (SELECT DISTINCT s AS n FROM edges),
    reach(n, r) AS (
      SELECT n, n FROM nodes
      UNION
      SELECT e.s, r.r FROM edges e JOIN reach r ON e.d = r.n
    ), comp AS (
      SELECT n AS nid, min(r) AS component FROM reach GROUP BY n
    ), labeled AS (
      SELECT b.p_name, b.nid, b.n_parts,
             coalesce(c.component, b.nid) AS component
      FROM blocked b LEFT JOIN comp c ON b.nid = c.nid
    )
    SELECT CAST(component AS BIGINT) AS cluster_id,
           min_by(p_name, nid) AS canonical_name,
           CAST(count(*) AS BIGINT) AS n_names,
           CAST(sum(n_parts) AS BIGINT) AS n_parts
    FROM labeled GROUP BY component
    """,
)
def entity_resolution_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: blocking → pairwise similarity →
    transitive clustering → survivorship, in one plan.

    1. Collapse the fact to its entity domain (distinct p_name, with a
       deterministic numeric id = min p_partkey and a part count).
    2. Blocked fuzzy match (head-noun block, levenshtein ≤ 4) — the
       quadratic compare is bounded per block, never corpus-wide.
    3. Transitive closure via connected components
       (operators/graph.py: pointer-jumping min-label, driver
       union-find below the edge threshold) — fuzzy matching is not
       transitive, so clusters need a real CC, not a groupBy.
    4. Survivorship: canonical record per cluster = min_by(name, id) —
       a selection, not a sum, so cross-engine exact.

    The oracle states the same closure declaratively (recursive CTE).
    Scale: entity domain ∝ vocabulary, not corpus; CC runs on the
    match edges only; singleton entities never enter the closure.
    """
    from etl_pipeline_orchestration_spark.operators.graph import (
        connected_components,
    )

    names = (
        load_table(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(
            F.min("p_partkey").alias("nid"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .withColumn("block", F.split(F.col("p_name"), " ").getItem(1))
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("nid").alias("nid_b"),
        F.col("block").alias("block_b"),
    )
    edges = (
        names.join(
            b,
            (F.col("block") == F.col("block_b"))
            & (F.col("p_name") < F.col("name_b")),
        )
        .filter(F.levenshtein("p_name", "name_b") <= 4)
        .select(F.col("nid").alias("s"), F.col("nid_b").alias("d"))
    )
    cc = connected_components(edges, "s", "d")
    labeled = names.join(
        cc.withColumnRenamed("node", "nid"), "nid", "left"
    ).withColumn("component", F.coalesce("component", "nid"))
    return labeled.groupBy(
        F.col("component").cast("bigint").alias("cluster_id")
    ).agg(
        F.min_by("p_name", "nid").alias("canonical_name"),
        F.count(F.lit(1)).alias("n_names"),
        F.sum("n_parts").cast("bigint").alias("n_parts"),
    )


def _pagerank_oracle(iters: int = 10, off: int = 1_000_000_000) -> str:
    """Unrolled power iteration as chained CTEs (DuckDB disallows
    aggregates in a recursive CTE term, so a fixed iteration budget
    unrolls instead — 10 chained per-iteration CTEs, same shape the
    Spark loop executes). Every node in the symmetrized bipartite graph
    has out-edges, so the dangling term is exactly 0.0 on both engines;
    the damping constants mirror the Python arithmetic ORDER
    ((1.0 - 0.85) evaluates to 0.15000000000000002, one ulp off the
    0.15 literal — CAST literals per the cross-engine float rules)."""
    steps = []
    for k in range(iters):
        steps.append(
            f"""pr{k + 1} AS (
      SELECT nd.node,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
               + CAST(0.85 AS DOUBLE)
                 * coalesce(c.inflow, CAST(0.0 AS DOUBLE)) AS rank
      FROM nodes nd CROSS JOIN nn
      LEFT JOIN (
        SELECT e.d AS node, sum(p.rank / dg.out_deg) AS inflow
        FROM e JOIN pr{k} p ON e.s = p.node JOIN dg ON dg.s = e.s
        GROUP BY e.d
      ) c ON c.node = nd.node
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH e AS (
      SELECT DISTINCT l_partkey AS s, l_suppkey + {off} AS d FROM lineitem
      UNION
      SELECT DISTINCT l_suppkey + {off} AS s, l_partkey AS d FROM lineitem
    ),
    nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
    nn AS (SELECT count(*) AS n FROM nodes),
    dg AS (SELECT s, count(*) AS out_deg FROM e GROUP BY s),
    pr0 AS (
      SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS rank
      FROM nodes CROSS JOIN nn
    ),
    {chain}
    SELECT CASE WHEN node >= {off} THEN 'supplier' ELSE 'part' END
             AS node_type,
           CAST(CASE WHEN node >= {off} THEN node - {off} ELSE node END
                AS BIGINT) AS entity_id,
           CAST(round(rank * 1e9) AS BIGINT) AS rank_x1e9
    FROM pr{iters}
    ORDER BY rank_x1e9 DESC, node_type, entity_id LIMIT 25
    """


@query("graph_pagerank_part_supplier", oracle=_pagerank_oracle())
def graph_pagerank_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part↔supplier bipartite graph (distinct
    lineitem (part, supplier) edges, both directions so the walk
    mixes): the standard importance score for catalog/link analysis.
    Power iteration with dangling-mass redistribution
    (operators/graph.py:pagerank) — one shuffle per iteration,
    lineage checkpointed. Fixed damping (0.85) + fixed iteration
    budget (10) makes the result deterministic up to summation-order
    ulps, so the relation IS oracle-checkable against an unrolled
    DuckDB power iteration: ranks are emitted as round(rank * 1e9)
    integers (measured cross-engine drift ~1e-13 relative; margins to
    rounding half-boundaries checked in tests/test_graph.py), ordered
    by the ROUNDED rank with full (node_type, entity_id) tiebreaks so
    top-25 selection is engine-deterministic. Independent ground truth
    (not just parity): tests/test_graph.py pins the operator against a
    dense numpy power iteration. Returns the top-25 nodes (node_type
    disambiguates the id spaces)."""
    from etl_pipeline_orchestration_spark.operators.graph import pagerank

    off = 1_000_000_000
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", (F.col("l_suppkey") + off).alias("supp_node")
    )
    # dedup the forward direction only (half the rows), then mirror —
    # reversal is a bijection and the id offset rules out overlap, so
    # the union is distinct by construction (pre_deduped contract);
    # both directions present ⇒ no dangling nodes (symmetric contract)
    fwd = li.select(
        F.col("l_partkey").alias("src"), F.col("supp_node").alias("dst")
    ).distinct()
    edges = fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(
        edges, max_iter=10, tol=0.0, pre_deduped=True, symmetric=True
    )  # fixed budget: skip delta jobs
    return (
        ranks.select(
            F.when(F.col("node") >= off, F.lit("supplier"))
            .otherwise(F.lit("part"))
            .alias("node_type"),
            F.when(F.col("node") >= off, F.col("node") - off)
            .otherwise(F.col("node"))
            .cast("bigint")
            .alias("entity_id"),
            F.round(F.col("rank") * 1e9).cast("bigint").alias("rank_x1e9"),
        )
        .orderBy(F.desc("rank_x1e9"), "node_type", "entity_id")
        .limit(25)
    )


def _ppr_oracle(iters: int = 10, off: int = 1_000_000_000) -> str:
    """Unrolled personalized-PageRank power iteration (the
    _pagerank_oracle discipline): dense per-iteration CTEs, teleport
    mass to the dynamic seed (min l_partkey), CAST literals so the
    damping constants evaluate in the same float ORDER as the Python
    side. Zero-rank sources add exact +0.0 terms to the inflow sum, so
    the dense oracle equals the Spark side's sparse inner join."""
    steps = []
    for k in range(iters):
        steps.append(
            f"""pr{k + 1} AS (
      SELECT nd.node,
             (CASE WHEN nd.node = sd.seed
                   THEN CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)
                   ELSE CAST(0.0 AS DOUBLE) END)
               + CAST(0.85 AS DOUBLE)
                 * coalesce(c.inflow, CAST(0.0 AS DOUBLE)) AS rank
      FROM nodes nd CROSS JOIN sd
      LEFT JOIN (
        SELECT e.d AS node, sum(p.rank / dg.out_deg) AS inflow
        FROM e JOIN pr{k} p ON e.s = p.node JOIN dg ON dg.s = e.s
        GROUP BY e.d
      ) c ON c.node = nd.node
    )"""
        )
    chain = ",\n    ".join(steps)
    return f"""
    WITH e AS (
      SELECT DISTINCT l_partkey AS s, l_suppkey + {off} AS d FROM lineitem
      UNION
      SELECT DISTINCT l_suppkey + {off} AS s, l_partkey AS d FROM lineitem
    ),
    nodes AS (SELECT s AS node FROM e UNION SELECT d FROM e),
    sd AS (SELECT min(l_partkey) AS seed FROM lineitem),
    dg AS (SELECT s, count(*) AS out_deg FROM e GROUP BY s),
    pr0 AS (
      SELECT nd.node,
             CASE WHEN nd.node = sd.seed THEN CAST(1.0 AS DOUBLE)
                  ELSE CAST(0.0 AS DOUBLE) END AS rank
      FROM nodes nd CROSS JOIN sd
    ),
    {chain}
    SELECT CASE WHEN node >= {off} THEN 'supplier' ELSE 'part' END
             AS node_type,
           CAST(CASE WHEN node >= {off} THEN node - {off} ELSE node END
                AS BIGINT) AS entity_id,
           CAST(round(rank * 1e9) AS BIGINT) AS rank_x1e9
    FROM pr{iters}
    ORDER BY rank_x1e9 DESC, node_type, entity_id LIMIT 25
    """


@query("graph_ppr_part_neighborhood", oracle=_ppr_oracle())
def graph_ppr_part_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from the lowest part node over the
    part↔supplier bipartite graph — the random-walk neighborhood score
    behind item-item recommendation ("parts co-supplied with this
    part") and local similarity search, and the personalized sibling
    of graph_pagerank_part_supplier (operators/graph.py:
    personalized_pagerank — teleport to the seed, dangling→seed,
    sparse-support rank state whose inner edge join touches only the
    frontier's edges in early iterations). Fixed 10-iteration budget;
    ranks emitted as round(rank*1e9) integers with full tiebreaks, so
    the top-25 is engine-deterministic against the unrolled oracle."""
    from etl_pipeline_orchestration_spark.operators.graph import (
        personalized_pagerank,
    )

    off = 1_000_000_000
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", (F.col("l_suppkey") + off).alias("supp_node")
    )
    seed = li.agg(F.min("l_partkey")).head()[0]
    fwd = li.select(
        F.col("l_partkey").alias("src"), F.col("supp_node").alias("dst")
    ).distinct()
    edges = fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = personalized_pagerank(
        edges, int(seed), max_iter=10, pre_deduped=True, symmetric=True
    )
    return (
        ranks.select(
            F.when(F.col("node") >= off, F.lit("supplier"))
            .otherwise(F.lit("part"))
            .alias("node_type"),
            F.when(F.col("node") >= off, F.col("node") - off)
            .otherwise(F.col("node"))
            .cast("bigint")
            .alias("entity_id"),
            F.round(F.col("rank") * 1e9).cast("bigint").alias("rank_x1e9"),
        )
        .orderBy(F.desc("rank_x1e9"), "node_type", "entity_id")
        .limit(25)
    )


@query(
    "null_safe_join_cohorts",
    oracle="""
    WITH base AS (
      SELECT nullif(CAST(json_extract_string(props, '$.k') AS BIGINT) % 10,
                    0) AS cohort,
             event_type
      FROM events
    ), clicks AS (
      SELECT cohort, count(*) AS n_clicks FROM base
      WHERE event_type = 'click' GROUP BY cohort
    ), purchases AS (
      SELECT cohort, count(*) AS n_purchases FROM base
      WHERE event_type = 'purchase' GROUP BY cohort
    )
    SELECT coalesce(c.cohort, p.cohort) AS cohort,
           CAST(coalesce(c.n_clicks, 0) AS BIGINT) AS n_clicks,
           CAST(coalesce(p.n_purchases, 0) AS BIGINT) AS n_purchases
    FROM clicks c FULL JOIN purchases p
      ON c.cohort IS NOT DISTINCT FROM p.cohort
    """,
)
def null_safe_join_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): cohort
    keys parsed from semi-structured props, with one cohort mapped to
    NULL (unknown). A plain equi-join silently DROPS the unknown cohort
    from both sides (NULL = NULL is never true); the null-safe operator
    aligns them — the correct semantics for joining on nullable
    dimension keys. Planned as a regular hash join (null-safe equality
    is still an equi-key: NULL hashes to a regular bucket), so the
    scale profile matches any other shuffle join — no nested-loop
    penalty for the nullable key.
    """
    base = load_table(spark, sf_dir, "events").select(
        F.nullif(
            F.get_json_object("props", "$.k").cast("bigint") % 10, F.lit(0)
        ).alias("cohort"),
        "event_type",
    )
    clicks = (
        base.filter(F.col("event_type") == "click")
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
    )
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
    c, p = clicks.alias("c"), purchases.alias("p")
    return c.join(
        p, F.col("c.cohort").eqNullSafe(F.col("p.cohort")), "full_outer"
    ).select(
        F.coalesce("c.cohort", "p.cohort").alias("cohort"),
        F.coalesce("c.n_clicks", F.lit(0)).cast("bigint").alias("n_clicks"),
        F.coalesce("p.n_purchases", F.lit(0)).cast("bigint").alias("n_purchases"),
    )


@query(
    "decimal_exact_revenue_by_year",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2))
             AS revenue_dec,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_year
    """,
)
def decimal_exact_revenue_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-decimal money aggregation: cast once at the scan, sum in
    DECIMAL. Unlike double sums, decimal addition is associative — the
    result is IDENTICAL for any partial-aggregation order, so there is
    no rounding guard, no ulp drift between 32 partitions and 32,000.
    This is the correct type discipline for financial columns at scale;
    the float-parity gymnastics elsewhere in this repo exist only
    because the source parquet stores money as double. Spark widens
    sum(DECIMAL(18,2)) to DECIMAL(28,2); the oracle casts to match.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "revenue_dec"
            ),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "event_trigram_paths",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             lag(event_type, 2) OVER w AS p1,
             lag(event_type, 1) OVER w AS p2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p1 || '>' || p2 || '>' || event_type AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE p1 IS NOT NULL
    GROUP BY path ORDER BY n DESC, path LIMIT 10
    """,
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event paths (behavioral 3-grams): the sequence-mining
    counterpart of the transition matrix. One lag window per user
    (single shuffle), hash aggregate over |types|³ paths, then a
    deterministic top-10 (count desc, path tiebreak) planned as
    TakeOrderedAndProject — no global sort of the aggregate.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.lag("event_type", 2).over(w).alias("p1"),
        F.lag("event_type", 1).over(w).alias("p2"),
    )
    return (
        seq.filter(F.col("p1").isNotNull())
        .select(
            F.concat_ws(">", "p1", "p2", "event_type").alias("path"),
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(10)
    )


@query(
    "scd2_point_in_time_lookup",
    oracle="""
    WITH dim AS (
      SELECT user_id, ts, event_id, event_type AS state FROM events
      WHERE user_id % 50 = 0 AND event_type <> 'purchase'
    ), iv AS (
      SELECT user_id, state, ts AS vfrom,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS vto
      FROM dim
    ), fact AS (
      SELECT user_id, event_id, ts FROM events
      WHERE user_id % 50 = 0 AND event_type = 'purchase'
    )
    SELECT f.user_id, f.event_id, f.ts, i.state
    FROM fact f LEFT JOIN iv i
      ON f.user_id = i.user_id AND f.ts >= i.vfrom
         AND (i.vto IS NULL OR f.ts < i.vto)
    """,
)
def scd2_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) dimension lookup: each fact row joined
    to the SCD2 state valid AT its timestamp — the query every
    full-history warehouse runs constantly.

    Scale plan: NOT a range join (per-fact interval probing shuffles
    and compares quadratically within hot keys). Because SCD2 intervals
    per key are non-overlapping and contiguous, the lookup is an AS-OF
    problem: union state-change rows and fact rows, one window sorted
    on (ts, is_fact, change_id) per key, ``last(state, ignorenulls)``
    — each fact picks up the latest state at-or-before it in a single
    shuffle, ties resolved state-first so a change at exactly fact-time
    wins (matching interval semantics [from, to)). The oracle spells
    the same thing as an explicit interval BETWEEN join.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 50 == 0)
    dim = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type").alias("state"),
        F.lit(0).alias("is_fact"),
    )
    fact = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("string").alias("state"),
        F.lit(1).alias("is_fact"),
    )
    u = dim.unionByName(fact)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_fact", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("cur_state", F.last("state", ignorenulls=True).over(w))
        .filter(F.col("is_fact") == 1)
        .select("user_id", "event_id", "ts", F.col("cur_state").alias("state"))
    )


@query(
    "k_anonymity_risk_report",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(floor(c_acctbal / 500) AS BIGINT) AS bal_band,
           CAST(count(*) AS BIGINT) AS n
    FROM customer
    GROUP BY c_nationkey, c_mktsegment, bal_band
    HAVING count(*) < 5
    """,
)
def k_anonymity_risk_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-governance k-anonymity audit: quasi-identifier groups
    (nation × segment × balance band) with fewer than k=5 members —
    the rows a privacy-preserving release must suppress or generalize.
    One hash aggregate over the quasi-identifier tuple (map-side
    partial combine), HAVING filter on the aggregate; at 100 TB the
    report size ∝ distinct quasi-id tuples, not input rows. The band
    uses floor(x/500) on exact-2dp doubles — identical on both
    engines, no half-boundary rounding involved.
    """
    cu = load_table(spark, sf_dir, "customer")
    return (
        cu.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 500).cast("bigint").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < 5)
    )


@query(
    "market_basket_part_pairs",
    oracle="""
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
    JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY part_a, part_b
    ORDER BY n_orders DESC, part_a, part_b LIMIT 20
    """,
)
def market_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: the top part pairs bought
    together, from a within-order self-join.

    Scale shape: ONE shuffle groups each order's distinct parts into a
    sorted array (collect_set dedupes multi-line repeats in the partial
    aggregate), then pairs are generated IN-PLACE with higher-order
    functions — no order-key self-join shuffle at all (measured 4× over
    the join form at sf0.1). Pair volume is still Σ|basket|²/2, bounded
    by basket size; a pathological mega-basket would get the same
    cap-or-salt treatment as LSH mega-buckets (F.slice caps are one
    filter away). The pair aggregate shuffles on the uniform pair key
    and the deterministic top-20 plans as TakeOrderedAndProject.
    """
    sets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "parts",
                    lambda x, i: F.transform(
                        F.slice("parts", i + 2, F.size("parts")),
                        lambda y: F.struct(
                            x.alias("part_a"), y.alias("part_b")
                        ),
                    ),
                )
            )
        ).alias("p")
    ).select("p.part_a", "p.part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


@query(
    "activity_islands_per_user",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
               AS day
      FROM events
    ), numbered AS (
      SELECT user_id, day,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM days
    ), islands AS (
      SELECT user_id, day,
             day - to_days(CAST(rn AS INTEGER)) AS grp
      FROM numbered
    ), runs AS (
      SELECT user_id, grp, count(*) AS run_len
      FROM islands GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(run_len) AS BIGINT) AS longest_streak,
           CAST(sum(run_len) AS BIGINT) AS n_active_days
    FROM runs GROUP BY user_id
    """,
)
def activity_islands_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user activity streaks. The classic trick —
    for consecutive days, (day − row_number) is constant, so runs fall
    out of one GROUP BY instead of a self-join chain. Two window/agg
    shuffles on user_id total; per-user day counts are small even at
    100 TB (bounded by calendar days), so no skew risk. All outputs are
    integer counts — zero float parity surface.
    """
    from pyspark.sql import Window

    days = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "grp", F.date_sub(F.col("day").cast("date"), F.row_number().over(w))
    )
    runs = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return runs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("run_len").cast("bigint").alias("longest_streak"),
        F.sum("run_len").cast("bigint").alias("n_active_days"),
    )


@query(
    "join_key_skew_report",
    oracle="""
    WITH ev AS (
      SELECT count(*) AS c FROM events GROUP BY user_id
    ), li AS (
      SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey
    )
    SELECT 'events.user_id' AS key_source,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(c) AS BIGINT) AS total_rows,
           CAST(max(c) AS BIGINT) AS max_count,
           CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS max_share,
           quantile_cont(c, 0.5) AS median_count
    FROM ev
    UNION ALL
    SELECT 'lineitem.l_orderkey',
           CAST(count(*) AS BIGINT),
           CAST(sum(c) AS BIGINT),
           CAST(max(c) AS BIGINT),
           CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE),
           quantile_cont(c, 0.5)
    FROM li
    """,
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the report you run BEFORE deciding
    between a plain shuffle join, a broadcast, or the salted-join path:
    per candidate key, its cardinality, hottest-key share, and median
    rows-per-key. Two hash aggregates (key → count, then count →
    stats). The median comes from the bounded-memory distributed
    exact quantile, NOT the buffering builtin — the key domain itself
    can be billions of rows at 100 TB, which is precisely the situation
    this report diagnoses. On integer counts the weighted-average
    interpolation equals lerp exactly (halves of ints are
    representable), so the cross-engine compare stays exact;
    max_share is one int/int division.
    """
    from etl_pipeline_orchestration_spark.functions.scalar import (
        exact_quantile_distributed,
    )

    def profile(df, key, label):
        per_key = df.groupBy(key).agg(F.count(F.lit(1)).alias("c"))
        med = exact_quantile_distributed(per_key, "c", 0.5)
        return per_key.agg(
            F.lit(label).alias("key_source"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").cast("bigint").alias("total_rows"),
            F.max("c").cast("bigint").alias("max_count"),
            (
                F.max("c").cast("double") / F.sum("c").cast("double")
            ).alias("max_share"),
            F.lit(med).cast("double").alias("median_count"),
        )

    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    return profile(ev, "user_id", "events.user_id").unionAll(
        profile(li, "l_orderkey", "lineitem.l_orderkey")
    )


@query(
    "rfm_customer_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             date_diff('day', max(o_orderdate),
                       (SELECT max(o_orderdate) FROM orders)) AS r_days,
             count(*) AS f_orders,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS m_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey AS c_custkey,
           CAST(r_days AS BIGINT) AS r_days,
           CAST(f_orders AS BIGINT) AS f_orders,
           m_cents,
           CAST(ntile(4) OVER (ORDER BY r_days, o_custkey) AS BIGINT)
             AS r_quartile,
           CAST(ntile(4) OVER (ORDER BY f_orders DESC, o_custkey) AS BIGINT)
             AS f_quartile,
           CAST(ntile(4) OVER (ORDER BY m_cents DESC, o_custkey) AS BIGINT)
             AS m_quartile
    FROM per_cust
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (recency / frequency / monetary quartiles) —
    the marketer's workhorse. Heavy lifting is ONE hash aggregate over
    orders; the three quartile rankings run on the per-customer
    aggregate (rows ∝ customers), which at 10⁹ customers is still far
    too big for an unpartitioned ntile window — so each dimension uses
    the DISTRIBUTED exact-rank operator (operators/ranking.py:
    cutpoint bucketing → parallel local row_number → literal offsets)
    and the exact ntile formula on the global row number; the plan
    chains the three bucketed windows — no joins, no SinglePartition
    exchange. Every ranking ORDER BY is exact-integer with a custkey
    tiebreak: monetary uses integer CENTS (round(x*100) on exact-2dp
    doubles), because ordering by a float SUM would let a last-ulp
    summation difference flip a quartile boundary — ints can't.
    """
    from etl_pipeline_orchestration_spark.operators import ranking

    od = load_table(spark, sf_dir, "orders")
    # Aggregate on last_order_day, not r_days: r_days = ref - last_day
    # is strictly monotone in last_day, so ranking needs no reference
    # date — and the reference (max over customer maxes) then comes out
    # of the cutpoints job below instead of costing its own full scan.
    per_cust = (
        od.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("last_day"),
            F.count(F.lit(1)).alias("f_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("m_cents"),
        )
        # localCheckpoint, not persist(): the two eager jobs below and
        # the returned plan all read the materialized blocks, and the
        # ContextCleaner frees them once the result is dropped — an
        # unmatched persist() would pin the cache for the whole session.
        .localCheckpoint(eager=True)
    )

    # Three rank dimensions, but only TWO eager jobs on the cached
    # aggregate: one agg computes all three cutpoint sketches at once
    # (mergeable GK sketches batch into a single pass) PLUS the
    # reference date, and one grouping-sets pass yields all three
    # per-bucket count maps.
    dims = [
        ("r", -F.unix_date(F.col("last_day").cast("date")), False),
        ("f", F.col("f_orders"), True),
        ("m", F.col("m_cents"), True),
    ]
    cuts_row = per_cust.agg(
        F.max("last_day").alias("ref"),
        *[
            ranking.cutpoint_agg(
                (-key if desc else key).cast("double"), 64
            ).alias(f"cuts_{tag}")
            for tag, key, desc in dims
        ],
    ).head()
    ref = cuts_row["ref"]
    cuts = {tag: sorted(set(cuts_row[f"cuts_{tag}"] or [])) for tag, *_ in dims}
    r_days = F.datediff(F.lit(ref), F.col("last_day")).cast("bigint")
    order_by = {
        "r": [r_days, F.col("c_custkey")],
        "f": [F.col("f_orders").desc(), F.col("c_custkey")],
        "m": [F.col("m_cents").desc(), F.col("c_custkey")],
    }

    b = per_cust.select(
        "*",
        *[
            (-key if desc else key).cast("double").alias(f"gk_{tag}")
            for tag, key, desc in dims
        ],
    ).select(
        "*",
        *[
            ranking.bucket_expr(f"gk_{tag}", cuts[tag]).alias(f"bkt_{tag}")
            for tag, *_ in dims
        ],
    )
    bcols = [f"bkt_{tag}" for tag, *_ in dims]
    counts = {tag: {} for tag, *_ in dims}
    gs = b.groupingSets(
        [[c] for c in bcols], *[F.col(c) for c in bcols]
    ).agg(F.count(F.lit(1)).alias("cnt"))
    for r in gs.collect():
        for tag, c in zip(counts, bcols):
            if r[c] is not None:
                counts[tag][r[c]] = r["cnt"]

    out = b
    for tag, *_ in dims:
        out, n = ranking.ranked_from_buckets(
            out, f"bkt_{tag}", counts[tag], order_by[tag], out_col=f"rn_{tag}"
        )
        out = out.withColumn(
            f"{tag}_quartile",
            ranking.ntile_from_row_number(F.col(f"rn_{tag}"), n, 4).cast(
                "bigint"
            ),
        )
    return out.select(
        "c_custkey", r_days.alias("r_days"), "f_orders", "m_cents",
        "r_quartile", "f_quartile", "m_quartile",
    )


@query(
    "grouped_exact_percentiles",
    oracle="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) - 1 AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events WHERE value IS NOT NULL
    ), marked AS (
      SELECT event_type, value, rn, n,
             (n - 1) * CAST(0.5 AS DOUBLE) AS r50,
             (n - 1) * CAST(0.95 AS DOUBLE) AS r95
      FROM ranked
    )
    SELECT event_type,
           CAST(any_value(n) AS BIGINT) AS n_rows,
           max(CASE WHEN rn = CAST(floor(r50) AS BIGINT) THEN
                 CASE WHEN ceil(r50) = floor(r50) THEN value
                      ELSE (ceil(r50) - r50) * value END END)
             + coalesce(max(CASE WHEN rn = CAST(ceil(r50) AS BIGINT)
                            AND ceil(r50) <> floor(r50) THEN
                 (r50 - floor(r50)) * value END), 0.0) AS p50,
           max(CASE WHEN rn = CAST(floor(r95) AS BIGINT) THEN
                 CASE WHEN ceil(r95) = floor(r95) THEN value
                      ELSE (ceil(r95) - r95) * value END END)
             + coalesce(max(CASE WHEN rn = CAST(ceil(r95) AS BIGINT)
                            AND ceil(r95) <> floor(r95) THEN
                 (r95 - floor(r95)) * value END), 0.0) AS p95
    FROM marked GROUP BY event_type
    """,
)
def grouped_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PER-GROUP exact percentiles WITHOUT the buffering builtin: sort
    within group, rank, select the two bracketing order statistics,
    interpolate in the aggregate. Spark's ``percentile`` holds every
    group value in one aggregation buffer — a skewed group OOMs an
    executor at 100 TB; this plan's state per task is one row, the
    sort is the standard spillable shuffle sort, and the final
    aggregate reduces 2 rows per (group, percentile).

    Interpolation parity: when r lands between ranks, the value is
    (k1-r)*x0 + (r-k0)*x1 — Spark's weighted-average form, expressed
    identically in the oracle (with quantile literals cast to DOUBLE;
    DuckDB parses bare 0.95 as DECIMAL and the rank arithmetic would
    diverge). When r is integral the second term is absent on both
    sides. Two integral-rank traps, pinned by the test comparing this
    against Spark's buffering builtin: with k0=k1 the weighted form
    (k1-r)*x0 + (r-k0)*x1 evaluates to ZERO (both weights vanish), so
    the exact-hit case must return x0 directly — and an unguarded
    second term would double-count it. A naive "mirror the formula in
    the oracle" hides exactly this class of bug: both engines agree
    and both are wrong; only the independent builtin reference
    catches it.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = ev.select(
        "event_type",
        "value",
        (F.row_number().over(w) - 1).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )

    def pct(q: float, out: str):
        r = (F.col("n") - 1) * F.lit(q).cast("double")
        k0, k1 = F.floor(r), F.ceil(r)
        lo = F.max(
            F.when(
                F.col("rn") == k0.cast("bigint"),
                F.when(k1 == k0, F.col("value")).otherwise(
                    (k1 - r) * F.col("value")
                ),
            )
        )
        hi = F.max(
            F.when(
                (F.col("rn") == k1.cast("bigint")) & (k1 != k0),
                (r - k0) * F.col("value"),
            )
        )
        return (lo + F.coalesce(hi, F.lit(0.0))).alias(out)

    return ranked.groupBy("event_type").agg(
        F.any_value(F.col("n")).cast("bigint").alias("n_rows"),
        pct(0.5, "p50"),
        pct(0.95, "p95"),
    )


@query(
    "association_rules_parts",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), totals AS (
      SELECT count(DISTINCT l_orderkey) AS n_orders FROM op
    ), item AS (
      SELECT l_partkey, count(*) AS n_item FROM op GROUP BY l_partkey
    ), pair AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_pair
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b
      HAVING count(*) >= 3
    )
    SELECT p.part_a, p.part_b,
           CAST(p.n_pair AS BIGINT) AS n_pair,
           CAST(p.n_pair AS DOUBLE) / ia.n_item AS confidence_a_to_b,
           CAST(p.n_pair AS DOUBLE) * t.n_orders
             / (CAST(ia.n_item AS DOUBLE) * ib.n_item) AS lift
    FROM pair p
    JOIN item ia ON p.part_a = ia.l_partkey
    JOIN item ib ON p.part_b = ib.l_partkey
    CROSS JOIN totals t
    ORDER BY lift DESC, part_a, part_b LIMIT 25
    """,
)
def association_rules_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over co-purchase pairs: support, confidence
    P(b|a), and lift P(ab)/(P(a)P(b)) — basket mining's second stage.
    Pair counts come from the same shuffle-free in-place pair
    generation as market_basket_part_pairs (grouped sorted basket
    array → higher-order-function combinations — no order-key
    self-join); item counts ride the same grouped relation. The
    support floor (>= 3) prunes the pair tail BEFORE the stats joins,
    and item counts / the order total are model-sized (broadcast).
    Confidence and lift are pure integer ratios (products < 2^52), so
    the doubles are bit-identical cross-engine with no rounding step.
    Deterministic top-25 by (lift, pair) plans as
    TakeOrderedAndProject.
    """
    sets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    n_orders = sets.count()
    item = sets.select(
        F.explode("parts").alias("l_partkey")
    ).groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    pair = (
        sets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        "parts",
                        lambda x, i: F.transform(
                            F.slice("parts", i + 2, F.size("parts")),
                            lambda y: F.struct(
                                x.alias("part_a"), y.alias("part_b")
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 3)
    )
    ia = F.broadcast(
        item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    )
    ib = F.broadcast(
        item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    )
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .select(
            "part_a",
            "part_b",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            (F.col("n_pair").cast("double") / F.col("n_a")).alias(
                "confidence_a_to_b"
            ),
            (
                F.col("n_pair").cast("double")
                * F.lit(n_orders)
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(25)
    )


@query(
    "feature_drift_psi",
    oracle="""
    WITH binned AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
             least(CAST(floor(o_totalprice
                              / CAST(60000.0 AS DOUBLE) * 10)
                        AS BIGINT), 9) AS bin
      FROM orders WHERE year(o_orderdate) IN (1995, 1996)
    ), counts AS (
      SELECT bin,
             sum(CASE WHEN yr = 1995 THEN 1 ELSE 0 END) AS n_base,
             sum(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS n_cur
      FROM binned GROUP BY bin
    ), tot AS (
      SELECT sum(n_base) AS tb, sum(n_cur) AS tc FROM counts
    )
    SELECT bin,
           CAST(n_base AS BIGINT) AS n_base,
           CAST(n_cur AS BIGINT) AS n_cur,
           CAST(n_base AS DOUBLE) / tb AS p_base,
           CAST(n_cur AS DOUBLE) / tc AS p_cur,
           round((CAST(n_cur AS DOUBLE) / tc
                  - CAST(n_base AS DOUBLE) / tb)
                 * ln((CAST(n_cur AS DOUBLE) / tc)
                      / (CAST(n_base AS DOUBLE) / tb)) * 1e6) / 1e6
             AS psi_term
    FROM counts, tot
    """,
)
def feature_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitoring: Population Stability Index terms
    for order value, 1995 baseline vs 1996 — the standard pre-deploy /
    pipeline-health check for feature shift. One conditional-aggregate
    scan produces both periods' binned counts (no second pass), the
    total row broadcasts, and PSI terms are computed per bin
    (report size = bin count). Shares are exact int ratios; the ln
    term is rounded at 1e-6 on both engines since libm/JVM log aren't
    guaranteed bit-identical. Sparse-bin guard: terms are NULL when a
    bin is empty on either side (ln(0) / division by zero), surfacing
    exactly the bins a monitoring system must alert on rather than
    hiding them in an infinity.
    """
    od = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    binned = od.select(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.least(
            F.floor(
                F.col("o_totalprice") / F.lit(60000.0).cast("double") * 10
            ).cast("bigint"),
            F.lit(9).cast("bigint"),
        ).alias("bin"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("yr") == 1995, 1).otherwise(0)).alias("n_base"),
        F.sum(F.when(F.col("yr") == 1996, 1).otherwise(0)).alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_base").alias("tb"), F.sum("n_cur").alias("tc")
    )
    p_base = F.col("n_base").cast("double") / F.col("tb")
    p_cur = F.col("n_cur").cast("double") / F.col("tc")
    psi = F.round((p_cur - p_base) * F.log(p_cur / p_base) * 1e6) / 1e6
    return counts.crossJoin(F.broadcast(tot)).select(
        "bin",
        F.col("n_base").cast("bigint").alias("n_base"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        p_base.alias("p_base"),
        p_cur.alias("p_cur"),
        psi.alias("psi_term"),
    )


@query(
    "benford_first_digit_audit",
    oracle="""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice > 0
    ), counts AS (
      SELECT digit, count(*) AS n FROM digits GROUP BY digit
    ), tot AS (SELECT sum(n) AS t FROM counts)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) / t AS share,
           round(log10(1 + 1.0 / digit) * 1e6) / 1e6 AS benford_expected,
           round((CAST(n AS DOUBLE) / t
                  - round(log10(1 + 1.0 / digit) * 1e6) / 1e6) * 1e6)
             / 1e6 AS deviation
    FROM counts, tot
    """,
)
def benford_first_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order amounts — the classic
    forensic-accounting screen for fabricated values. One scan, one
    9-row aggregate; the total broadcasts. Shares are exact int ratios;
    the log10 reference distribution and the deviation are rounded at
    1e-6 on both engines (libm vs JVM log10 aren't bit-contracted).
    A real monitor would alert on |deviation| thresholds or a chi²
    statistic — both derivable from these columns.
    """
    od = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digits = od.select(
        F.substring(F.floor("o_totalprice").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.agg(F.sum("n").alias("t"))
    share = F.col("n").cast("double") / F.col("t")
    expected = F.round(F.log10(1 + 1.0 / F.col("digit")) * 1e6) / 1e6
    return counts.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        share.alias("share"),
        expected.alias("benford_expected"),
        (F.round((share - expected) * 1e6) / 1e6).alias("deviation"),
    )


@query(
    "triangle_count_copurchase",
    oracle="""
    WITH op AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), edges AS (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM edges e1
      JOIN edges e2 ON e1.b = e2.a
      JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles,
           CAST((SELECT count(*) FROM edges) AS BIGINT) AS n_edges
    FROM tri
    """,
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the co-purchase graph (edge = part pair
    bought together in >= 2 orders (chosen so the check is non-vacuous:
    61 triangles at sf0.01, 3258 at sf0.001)) — the clustering-coefficient
    building block, and the third graph algorithm family next to
    connected components and PageRank.

    Scale shape: the ORIENTED-edge method — every edge stored once
    under a total order; triangles found by joining wedge (u→v, v→w)
    against the closing edge (u→w), counting each triangle exactly
    once with no dedup pass. Orientation is ADAPTIVE
    (graph.oriented_edges_adaptive): one degree statistic decides
    whether raw ids are safe (max_deg² ≤ 16·m proves every wedge set
    is O(m) — the common case, zero extra joins) or whether a hub
    requires degree-(arboricity-bounded) orientation; a same-window
    A/B measured unconditional degree orientation ~30-40 % slower on
    this uniform co-purchase graph, so the skew guard now costs one
    tiny aggregate instead. Both joins shuffle on uniformly
    distributed vertex keys. Edge construction reuses the in-place
    basket-pair generation — no order-key self-join.
    """
    sets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("parts"))
    )
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "parts",
                    lambda x, i: F.transform(
                        F.slice("parts", i + 2, F.size("parts")),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.a", "p.b")
    # four consumers (three join roles + the count) of one aggregate:
    # materialize the model-sized edge list once instead of rebuilding
    # the basket-explode pipeline per alias
    edges = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    # No checkpoint on the oriented view: in the common id-oriented
    # case it is a pure projection of the checkpointed edges, and in
    # the degree case ReusedExchange dedups the join shuffles across
    # the three aliases (eager checkpointing a multi-consumer subplan
    # measured ~2x slower — see verify notes). The statistics job also
    # supplies the edge count — no separate count() job.
    oriented, n_edges, _ = oriented_edges_adaptive(edges)
    e1 = oriented.alias("e1")
    e2 = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    ).alias("e2")
    e3 = oriented.select(
        F.col("u").alias("u3"), F.col("v").alias("w3")
    ).alias("e3")
    tri = (
        e1.join(e2, "v")
        .join(
            e3,
            (F.col("u") == F.col("u3")) & (F.col("w") == F.col("w3")),
        )
    )
    return tri.agg(
        F.count(F.lit(1)).alias("n_triangles"),
        F.lit(n_edges).cast("bigint").alias("n_edges"),
    )


@query(
    "funnel_conversion_latency",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             min(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id
    ), delays AS (
      SELECT epoch_us(first_purchase) / 1000000
               - epoch_us(first_view) / 1000000 AS delay_s
      FROM per_user
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase > first_view
    ), ranked AS (
      SELECT delay_s,
             row_number() OVER (ORDER BY delay_s) - 1 AS rn,
             count(*) OVER () AS n
      FROM delays
    ), marked AS (
      SELECT delay_s, rn, n,
             (n - 1) * CAST(0.5 AS DOUBLE) AS r50,
             (n - 1) * CAST(0.9 AS DOUBLE) AS r90
      FROM ranked
    )
    SELECT CAST(any_value(n) AS BIGINT) AS n_converted,
           max(CASE WHEN rn = CAST(floor(r50) AS BIGINT) THEN
                 CASE WHEN ceil(r50) = floor(r50) THEN CAST(delay_s AS DOUBLE)
                      ELSE (ceil(r50) - r50) * delay_s END END)
             + coalesce(max(CASE WHEN rn = CAST(ceil(r50) AS BIGINT)
                            AND ceil(r50) <> floor(r50) THEN
                 (r50 - floor(r50)) * delay_s END), 0.0) AS median_delay_s,
           max(CASE WHEN rn = CAST(floor(r90) AS BIGINT) THEN
                 CASE WHEN ceil(r90) = floor(r90) THEN CAST(delay_s AS DOUBLE)
                      ELSE (ceil(r90) - r90) * delay_s END END)
             + coalesce(max(CASE WHEN rn = CAST(ceil(r90) AS BIGINT)
                            AND ceil(r90) <> floor(r90) THEN
                 (r90 - floor(r90)) * delay_s END), 0.0) AS p90_delay_s
    FROM marked
    """,
)
def funnel_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency: seconds from first view to first purchase per
    converting user, summarized as exact median and p90 — the
    time-to-convert companion of the step-count funnel. One conditional
    aggregate collapses the fact table to per-user rows; delays derive
    from exact integer microsecond epochs through the IDENTICAL
    division expression on both engines (one rounding each — same
    doubles bit-for-bit), so the percentile interpolation compares
    exactly. The percentiles use the bounded-memory two-pass exact
    quantile (scalar.exact_quantile_distributed: GK bracket + in-bracket
    candidate selection) — the earlier global row_number window moved
    every converted user to ONE task, the single-task bottleneck ADVICE
    r2 flagged; the interpolation form (weighted average, integral-rank
    guard) is identical, so the oracle's declarative rank-selection SQL
    is unchanged.
    """
    from etl_pipeline_orchestration_spark.functions.scalar import (
        exact_quantile_distributed,
    )

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("first_purchase"),
    )
    delays = (
        per_user.filter(
            F.col("first_view").isNotNull()
            & F.col("first_purchase").isNotNull()
            & (F.col("first_purchase") > F.col("first_view"))
        )
        .select(
            (
                F.unix_micros("first_purchase") / 1_000_000
                - F.unix_micros("first_view") / 1_000_000
            ).alias("delay_s")
        )
        # four driver-side aggregation jobs follow (count + 2 passes per
        # quantile); materialize the per-user reduction once — separate
        # jobs can't share an exchange the way one plan's consumers do
        .localCheckpoint(eager=True)
    )
    n = delays.count()
    med = exact_quantile_distributed(delays, "delay_s", 0.5)
    p90 = exact_quantile_distributed(delays, "delay_s", 0.9)
    return spark.range(1).select(
        F.lit(n).cast("bigint").alias("n_converted"),
        F.lit(med).cast("double").alias("median_delay_s"),
        F.lit(p90).cast("double").alias("p90_delay_s"),
    )


@query(
    "cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort
      FROM events GROUP BY user_id
    ), purchases AS (
      SELECT e.user_id, f.cohort,
             date_diff('week', f.cohort,
                       CAST(date_trunc('week', e.ts) AS TIMESTAMP))
               AS week_offset,
             e.value
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
    ), per_offset AS (
      SELECT cohort, CAST(week_offset AS BIGINT) AS week_offset,
             CAST(count(*) AS BIGINT) AS n_purchases,
             sum(value) AS rev
      FROM purchases GROUP BY cohort, week_offset
    )
    SELECT cohort, week_offset, n_purchases,
           round(sum(rev) OVER (PARTITION BY cohort ORDER BY week_offset
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) * 100) / 100
             AS cum_revenue_2dp
    FROM per_offset
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: cumulative purchase revenue per
    (first-activity-week cohort, week offset) — the revenue
    companion to the retention matrix. The cohort assignment join
    shuffles on user_id once; the cumulative window runs over the
    (cohort × offset) AGGREGATE, rows ∝ weeks², not events. The
    running sum accumulates PRE-AGGREGATED per-offset revenue in a
    deterministic frame order, so cross-engine drift is confined to
    each offset's inner sum — guarded by the usual scale-then-round at
    cents.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort",
            (
                F.datediff(F.date_trunc("week", "ts"), F.col("cohort")) / 7
            )
            .cast("bigint")
            .alias("week_offset"),
            "value",
        )
    )
    per_offset = purchases.groupBy("cohort", "week_offset").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("value").alias("rev"),
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per_offset.select(
        "cohort",
        "week_offset",
        "n_purchases",
        (F.round(F.sum("rev").over(w) * 100) / 100).alias("cum_revenue_2dp"),
    )


@query(
    "zorder_values_orders",
    oracle="""
    WITH q AS (
      SELECT o_orderkey,
             (o_custkey % 65536) & 65535 AS a,
             (date_diff('day', DATE '1992-01-01', o_orderdate) % 65536)
               & 65535 AS b
      FROM orders
    ),
    s1 AS (SELECT o_orderkey, ((a | (a << 8)) & 16711935) AS a,
                  ((b | (b << 8)) & 16711935) AS b FROM q),
    s2 AS (SELECT o_orderkey, ((a | (a << 4)) & 252645135) AS a,
                  ((b | (b << 4)) & 252645135) AS b FROM s1),
    s3 AS (SELECT o_orderkey, ((a | (a << 2)) & 858993459) AS a,
                  ((b | (b << 2)) & 858993459) AS b FROM s2),
    s4 AS (SELECT o_orderkey, ((a | (a << 1)) & 1431655765) AS a,
                  ((b | (b << 1)) & 1431655765) AS b FROM s3)
    SELECT o_orderkey, CAST(a | (b << 1) AS BIGINT) AS z_value
    FROM s4
    """,
)
def zorder_values_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) keys over (customer, order-day) — the layout key
    behind two-column data skipping (loader.write_zorder_clustered;
    file-stat tightness pinned in tests/test_streaming_upsert.py). The
    oracle replays the magic-mask bit spreading step by step, so the
    encoding is hash-verified bit-for-bit. Pure codegen'd integer ops —
    computing layout keys for 10^11 rows is a narrow scan-speed pass."""
    from etl_pipeline_orchestration_spark.operators.partitioning import (
        zorder_value,
    )

    orders = load_table(spark, sf_dir, "orders")
    a = F.pmod(F.col("o_custkey"), F.lit(65536))
    b = F.pmod(
        F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1992-01-01"))),
        F.lit(65536),
    )
    return orders.select(
        "o_orderkey", zorder_value(a, b).cast("bigint").alias("z_value")
    )


@query(
    "recursive_cte_order_chain",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS pos,
           CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
    FROM orders
    """,
)
def recursive_cte_order_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order-chain walk written as a RECURSIVE CTE
    (Spark 4's WITH RECURSIVE — iterative plans in pure SQL): each
    customer's orders form a functional next-pointer graph (ordered by
    date then key), and the recursion walks every chain from its head
    assigning the hop index and an exact running spend in integer
    cents.

    The oracle is deliberately a DIFFERENT formulation — plain window
    functions (row_number + running sum) with no recursion — so the
    hash match certifies Spark's recursive execution (anchor, step
    join, termination) against independent semantics rather than a
    mirrored plan.

    100 TB shape: the recursion is over a FUNCTIONAL graph (out-degree
    1), so the working set never exceeds the number of live chains and
    each of the (max-chain-length, here ~25; cteRecursionLevelLimit
    100) iterations is one equi-join of the frontier against the
    next-pointer relation on its key — no fan-out, unlike BFS over a
    dense graph where UNION-ALL recursion would enumerate paths
    (Spark does not yet support UNION-distinct recursion; a dense
    traversal belongs to the pointer-jump machinery in
    operators/graph.py instead)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    wc = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    # Materialize the next-pointer relation ONCE: a plain CTE inside
    # the recursion would be re-derived (window + projection) on every
    # iteration, multiplying the pre-recursion cost by the chain depth.
    nxt = (
        orders.select(
            "o_custkey",
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
            F.row_number().over(wc).alias("rn"),
            F.lead("o_orderkey").over(wc).alias("next_key"),
        )
        .localCheckpoint()
    )
    nxt.createOrReplaceTempView("order_chain_nxt")
    return spark.sql(
        """
        WITH RECURSIVE
        chain(o_custkey, o_orderkey, pos, cum_cents, next_key) AS (
          SELECT o_custkey, o_orderkey, CAST(1 AS BIGINT), cents, next_key
          FROM order_chain_nxt WHERE rn = 1
          UNION ALL
          SELECT n.o_custkey, n.o_orderkey, c.pos + 1,
                 c.cum_cents + n.cents, n.next_key
          FROM chain c JOIN order_chain_nxt n ON n.o_orderkey = c.next_key
        )
        SELECT o_custkey, o_orderkey, pos, cum_cents FROM chain
        """
    )


@query(
    "sql_udf_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)) AS BIGINT) AS gross_cents,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                         AS BIGINT)
                    - CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)
                      * CAST(CAST(l_discount AS DECIMAL(18,2)) * 100
                             AS BIGINT) // 100) AS BIGINT) AS net_cents
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_udf_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary computed through SQL-language UDFs (Spark 4
    ``CREATE FUNCTION ... RETURN <expr>``) — reusable business logic
    declared once in SQL and inlined by Catalyst, so it optimizes like
    any expression (predicate pushdown and codegen intact, unlike
    opaque Python UDFs). ``cents`` freezes a price to exact integer
    cents; ``net_cents`` applies the discount in pure integer
    arithmetic (cents - cents*disc_pct // 100, truncated division with
    non-negative operands — floor == trunc on both engines).

    The oracle inlines the identical expressions textually: the hash
    match certifies Spark's SQL UDF resolution + inlining is
    semantics-preserving. 100 TB shape: narrow map + one
    map-side-combined 6-group aggregate; UDFs are plan-time
    rewrites, zero runtime dispatch."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION cents(p DOUBLE) "
        "RETURNS BIGINT RETURN CAST(CAST(p AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_cents(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN cents(p) - cents(p) * cents(d) div 100"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_sqludf"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(cents(l_extendedprice)) AS BIGINT) AS gross_cents,
               CAST(sum(net_cents(l_extendedprice, l_discount)) AS BIGINT)
                 AS net_cents
        FROM lineitem_sqludf
        GROUP BY l_returnflag, l_linestatus
        """
    )


@query(
    "sql_aggregate_surface_combo",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n,
           CAST(bit_and(o_custkey) AS BIGINT) AS band,
           CAST(bit_or(o_custkey) AS BIGINT) AS bor,
           CAST(bit_xor(o_custkey) AS BIGINT) AS bxor,
           bool_and(o_totalprice > 1000) AS all_above_1k,
           bool_or(o_totalprice > 400000) AS any_above_400k,
           CAST(count_if(o_totalprice > 150000) AS BIGINT) AS n_large,
           median(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS median_cents,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def sql_aggregate_surface_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One aggregate exercising the long tail of the SQL aggregate
    surface per order priority: bitwise AND/OR/XOR reductions,
    bool_and / bool_or predicates, count_if, exact interpolated
    median over integer cents, and an order-deterministic distinct
    string rollup (sorted collect_set + concat_ws == DuckDB's
    string_agg DISTINCT ... ORDER BY).

    Determinism notes: the string rollup sorts EXPLICITLY (an
    unordered collect would hash-diverge run to run); the median over
    int64 cents interpolates to exact halves, representable in double
    on both engines for values < 2^52. All bit/bool/count aggregates
    are exact. 100 TB shape: everything is map-side combinable except
    the exact median, which Spark evaluates per group at 5-group
    cardinality — at real scale swap to approx_percentile or the
    distributed exact-quantile operator (functions/scalar.py) if the
    group count explodes."""
    o = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("bit_and(o_custkey)").cast("bigint").alias("band"),
        F.expr("bit_or(o_custkey)").cast("bigint").alias("bor"),
        F.expr("bit_xor(o_custkey)").cast("bigint").alias("bxor"),
        F.expr("bool_and(o_totalprice > 1000)").alias("all_above_1k"),
        F.expr("bool_or(o_totalprice > 400000)").alias("any_above_400k"),
        F.expr("count_if(o_totalprice > 150000)")
        .cast("bigint")
        .alias("n_large"),
        F.median(cents).alias("median_cents"),
        F.concat_ws(
            ",", F.array_sort(F.collect_set("o_orderstatus"))
        ).alias("statuses"),
    )


# ---------------------------------------------------------------------------
# sequential pattern mining (GSP, greedy witnesses)
# ---------------------------------------------------------------------------


@query(
    "gsp_frequent_sequences",
    oracle="""
    WITH occ AS (
      SELECT user_id AS u, event_type AS e,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS p
      FROM events
    ),
    nu AS (
      SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_users,
             CAST((count(DISTINCT u) + 3) // 4 AS BIGINT) AS minsup
      FROM occ
    ),
    w1 AS (SELECT u, e AS e1, min(p) AS p1 FROM occ GROUP BY 1, 2),
    s1 AS (
      SELECT e1, CAST(count(*) AS BIGINT) AS sup FROM w1
      GROUP BY e1 HAVING count(*) >= (SELECT minsup FROM nu)
    ),
    w2 AS (
      SELECT w1.u, w1.e1, o.e AS e2, min(o.p) AS p2
      FROM w1 JOIN s1 USING (e1)
      JOIN occ o ON o.u = w1.u AND o.p > w1.p1
      GROUP BY 1, 2, 3
    ),
    s2 AS (
      SELECT e1, e2, CAST(count(*) AS BIGINT) AS sup FROM w2
      GROUP BY e1, e2 HAVING count(*) >= (SELECT minsup FROM nu)
    ),
    w3 AS (
      SELECT DISTINCT w2.u, w2.e1, w2.e2, o.e AS e3
      FROM w2 JOIN s2 USING (e1, e2)
      JOIN occ o ON o.u = w2.u AND o.p > w2.p2
    ),
    s3 AS (
      SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS sup FROM w3
      GROUP BY e1, e2, e3 HAVING count(*) >= (SELECT minsup FROM nu)
    )
    SELECT e1 AS pattern, CAST(1 AS INT) AS length, sup FROM s1
    UNION ALL
    SELECT e1 || '>' || e2, 2, sup FROM s2
    UNION ALL
    SELECT e1 || '>' || e2 || '>' || e3, 3, sup FROM s3
    """,
)
def gsp_frequent_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern mining (GSP, Srikant & Agrawal 1996, public
    method): event SUBSEQUENCES (ordered, gaps allowed) supported by
    >= 25% of users, up to length 3 — the sequence-mining family next
    to association rules (co-occurrence, no order) and the transition
    matrix (adjacent steps only). "view ... then click ... then
    purchase, other events in between" is exactly what neither
    sibling can express.

    Witness trick (the textbook greedy): a subsequence e1..ek occurs
    in a user's stream iff the EARLIEST-feasible positions work, so
    each level keeps one (user, prefix) row carrying min(p) — support
    counting never enumerates the C(n,k) occurrence combinations, and
    each level is ONE user-keyed join + aggregate, support-pruned by
    the previous level (the GSP anti-monotonicity cut). Identical
    relational form on both engines; all-integer.

    100 TB shape: occ is one window over events; level L joins the
    (users x surviving prefixes) witness relation — bounded by
    n_users x |frequent patterns|, not by event combinations; the
    alphabet-sized aggregates are map-side combined."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    occ = events.select(
        F.col("user_id").alias("u"),
        F.col("event_type").alias("e"),
        F.row_number().over(w).alias("p"),
    ).localCheckpoint()  # three levels + minsup consume it
    nu = occ.agg(
        F.expr("(count(DISTINCT u) + 3) div 4").cast("long").alias("minsup")
    )
    w1 = occ.groupBy("u", F.col("e").alias("e1")).agg(F.min("p").alias("p1"))
    s1 = (
        w1.groupBy("e1")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sup"))
        .join(F.broadcast(nu))
        .filter(F.col("sup") >= F.col("minsup"))
        .drop("minsup")
    )
    w2 = (
        w1.join(F.broadcast(s1.select("e1")), "e1")
        .join(occ, "u")
        .filter(F.col("p") > F.col("p1"))
        .groupBy("u", "e1", F.col("e").alias("e2"))
        .agg(F.min("p").alias("p2"))
    )
    s2 = (
        w2.groupBy("e1", "e2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sup"))
        .join(F.broadcast(nu))
        .filter(F.col("sup") >= F.col("minsup"))
        .drop("minsup")
    )
    w3 = (
        w2.join(F.broadcast(s2.select("e1", "e2")), ["e1", "e2"])
        .join(occ, "u")
        .filter(F.col("p") > F.col("p2"))
        .select("u", "e1", "e2", F.col("e").alias("e3"))
        .distinct()
    )
    s3 = (
        w3.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sup"))
        .join(F.broadcast(nu))
        .filter(F.col("sup") >= F.col("minsup"))
        .drop("minsup")
    )
    return (
        s1.select(
            F.col("e1").alias("pattern"), F.lit(1).cast("int").alias("length"), "sup"
        )
        .unionByName(
            s2.select(
                F.concat_ws(">", "e1", "e2").alias("pattern"),
                F.lit(2).cast("int").alias("length"),
                "sup",
            )
        )
        .unionByName(
            s3.select(
                F.concat_ws(">", "e1", "e2", "e3").alias("pattern"),
                F.lit(3).cast("int").alias("length"),
                "sup",
            )
        )
    )


# ---------------------------------------------------------------------------
# sequence-regex funnel (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------

# one char per event type — the alphabet of the sequence language
_SEQ_CHAR = {
    "view": "v", "click": "c", "purchase": "p", "signup": "s", "error": "e",
}
# (name, regex) — only portable constructs: literals, classes, *, +
_SEQ_PATTERNS = (
    ("clean_convert", "v[^e]*c[^e]*p"),   # funnel with NO error inside
    ("convert_any", "v.*c.*p"),           # funnel, errors tolerated
    ("error_then_recover", "e.*p"),       # bought despite an error
    ("immediate_bounce", "^ve"),          # first two events: view, error
    ("double_purchase", "p.*p"),          # repeat buyer
)


@query(
    "sequence_regex_funnel",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(CASE event_type
                          WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
                          WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
                          WHEN 'error' THEN 'e' END,
                        '' ORDER BY ts, event_id) AS s
      FROM events GROUP BY user_id
    ),
    pats AS (
      SELECT * FROM (VALUES
        ('clean_convert', 'v[^e]*c[^e]*p'),
        ('convert_any', 'v.*c.*p'),
        ('error_then_recover', 'e.*p'),
        ('immediate_bounce', '^ve'),
        ('double_purchase', 'p.*p')) v(pattern_name, rx)
    )
    SELECT p.pattern_name,
           CAST(count(*) FILTER (WHERE regexp_matches(s.s, p.rx))
                AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_total
    FROM seq s CROSS JOIN pats p
    GROUP BY p.pattern_name
    """,
)
def sequence_regex_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: each user's time-ordered event stream
    becomes a STRING over a one-char-per-type alphabet, and behavioral
    patterns become REGEXES evaluated by the JVM engine — expressing
    what neither the funnel queries (fixed stages) nor GSP (no
    exclusions) can: "converted with NO error in between"
    (v[^e]*c[^e]*p), "bounced immediately" (^ve), "repeat buyer"
    (p.*p). Only portable constructs (literals, classes, `.*`, `^`)
    so Java and DuckDB regex semantics agree — no lookaround, no lazy
    quantifiers.

    100 TB shape: ONE user-keyed sort-agg builds the sequence strings
    (bounded by events-per-user, the same bound sessionization already
    rides); each pattern is then a codegen'd rlike over user-count
    rows — adding a pattern costs one narrow column, not a scan. The
    string encoding is the point: it moves sequence matching from
    iterative joins into the regex engine."""
    events = load_table(spark, sf_dir, "events")
    mapping = F.create_map(
        *[F.lit(x) for kv in _SEQ_CHAR.items() for x in kv]
    )
    seq = (
        events.select(
            "user_id",
            F.struct("ts", "event_id").alias("o"),
            mapping[F.col("event_type")].alias("ch"),
        )
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                "", F.transform(F.array_sort(F.collect_list(F.struct("o", "ch"))), lambda x: x["ch"])
            ).alias("s")
        )
    )
    # ONE pass: every pattern is a conditional-sum column of the same
    # aggregate (the count-min boundary-sums discipline), then a stack
    # generator turns the 1-row result into per-pattern rows.
    agg = seq.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        *[
            F.sum(F.col("s").rlike(rx).cast("long")).cast("long").alias(f"m{i}")
            for i, (_, rx) in enumerate(_SEQ_PATTERNS)
        ],
    )
    stack = ", ".join(
        f"'{name}', m{i}" for i, (name, _) in enumerate(_SEQ_PATTERNS)
    )
    return agg.selectExpr(
        f"stack({len(_SEQ_PATTERNS)}, {stack}) AS (pattern_name, n_users)",
        "n_total",
    ).select("pattern_name", "n_users", "n_total")


@query(
    "window_analytics_extended",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS priority, o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_cents
      FROM orders
    )
    SELECT priority, o_orderkey, price_cents,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(nth_value(price_cents, 2) OVER (
                 PARTITION BY priority ORDER BY price_cents, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS second_lowest_cents,
           CAST(first_value(price_cents) OVER w AS BIGINT) AS min_cents,
           CAST(last_value(price_cents) OVER (
                 PARTITION BY priority ORDER BY price_cents, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS max_cents
    FROM base
    WINDOW w AS (PARTITION BY priority ORDER BY price_cents, o_orderkey)
    """,
)
def window_analytics_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic-window long tail the W1/W2 combos don't cover:
    ntile quartile binning, percent_rank, cume_dist, nth_value, and
    first/last_value with explicit full-partition frames — per order
    priority over exact integer cents.

    Determinism: ntile and nth_value depend on ROW ORDER, not rank, so
    the window orders by the TOTAL key (price_cents, o_orderkey) — ties
    broken identically on both engines (the one rule that makes these
    functions oracle-checkable at all). percent_rank/cume_dist emit one
    identical double division each.

    Scale note: a per-priority window is 5 coarse partitions — fine at
    calendar/order scale, but at 10^9 rows per priority the quartile
    bin should come from scale_primitives' approx-boundary histogram
    instead of a serial per-partition sort; this query records the
    exact-window surface, that one the scale path."""
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    base = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        cents.alias("price_cents"),
    )
    w = Window.partitionBy("priority").orderBy("price_cents", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return base.select(
        "priority",
        "o_orderkey",
        "price_cents",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("price_cents", 2).over(wfull).cast("bigint")
        .alias("second_lowest_cents"),
        F.first("price_cents").over(w).cast("bigint").alias("min_cents"),
        F.last("price_cents").over(wfull).cast("bigint").alias("max_cents"),
    )


@query(
    "retention_cohort_matrix",
    oracle="""
    WITH om AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                  AS BIGINT) AS m
      FROM orders
    ),
    first_m AS (
      SELECT o_custkey, min(m) AS cohort_m FROM om GROUP BY 1
    ),
    sizes AS (
      SELECT cohort_m, CAST(count(*) AS BIGINT) AS cohort_size
      FROM first_m GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT f.cohort_m, om.m - f.cohort_m AS k, om.o_custkey
      FROM om JOIN first_m f ON om.o_custkey = f.o_custkey
    ),
    cells AS (
      SELECT cohort_m, k, CAST(count(*) AS BIGINT) AS n_active
      FROM activity GROUP BY 1, 2
    )
    SELECT c.cohort_m, CAST(c.k AS BIGINT) AS k, c.n_active, s.cohort_size,
           CAST((1000000 * c.n_active) // s.cohort_size AS BIGINT)
             AS retention_ppm
    FROM cells c JOIN sizes s ON c.cohort_m = s.cohort_m
    """,
)
def retention_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention cohort matrix: customers cohorted by
    first-order month, each later month's surviving-active count and
    retention rate per cohort — the product-analytics staple behind
    every retention curve. Complements ``weekly_cohort_retention``
    (event-stream weekly actives) with the RATE-bearing matrix over the
    order history: cohort sizes ride along and retention is normalized
    per cohort, which the count-only weekly view doesn't provide.
    Months are INTEGER indices (year*12+month-1)
    so cohort age k is pure integer subtraction, and retention is
    integer ppm via truncating division — no float anywhere, no
    rounding half-boundary to straddle.

    Scale shape: orders collapse to (custkey, month) pairs at source
    (map-side distinct), the first-order aggregate and the activity
    join both key on custkey (one shuffle each), and everything after
    runs at (cohort x age) cardinality — a few hundred cells however
    big the order history."""
    om = customer_month_activity(load_table(spark, sf_dir, "orders"))
    return retention_matrix_of(om)


def customer_month_activity(orders: DataFrame) -> DataFrame:
    """(o_custkey, m): DISTINCT customer active months — the MERGEABLE
    sufficient statistic for the retention matrix (set union = distinct
    of unions, so micro-batch partials merge in any arrival order; the
    cohort assignment itself is NOT mergeable — a late-arriving earlier
    order re-cohorts the customer, which re-deriving from this relation
    handles for free). Split out so streaming/retention_stream.py can
    maintain it. Bounded by customers x months, not order count."""
    return orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("m"),
    ).distinct()


def retention_matrix_of(om: DataFrame) -> DataFrame:
    """Cohort matrix from the (custkey, month) activity relation.
    Shared by the batch query and the streaming publisher so
    stream==batch reduces to merge equality."""
    first_m = om.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    sizes = first_m.groupBy("cohort_m").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    activity = (
        om.join(first_m, "o_custkey")
        .select("cohort_m", (F.col("m") - F.col("cohort_m")).alias("k"), "o_custkey")
        .distinct()
    )
    cells = activity.groupBy("cohort_m", "k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active")
    )
    return cells.join(sizes, "cohort_m").select(
        "cohort_m",
        F.col("k").cast("bigint").alias("k"),
        "n_active",
        "cohort_size",
        F.expr("(1000000 * n_active) div cohort_size")
        .cast("bigint")
        .alias("retention_ppm"),
    )


@query(
    "l_diversity_risk_report",
    oracle="""
    WITH cell AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 500) AS BIGINT) AS bal_band,
             c_mktsegment,
             CAST(count(*) AS BIGINT) AS n_seg
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, bal_band,
           CAST(sum(n_seg) AS BIGINT) AS n,
           CAST(count(*) AS BIGINT) AS n_distinct_seg,
           CAST((1000000 * max(n_seg)) // sum(n_seg) AS BIGINT)
             AS top_seg_share_ppm
    FROM cell
    GROUP BY c_nationkey, bal_band
    HAVING count(*) < 3 OR (1000000 * max(n_seg)) // sum(n_seg) > 800000
    """,
)
def l_diversity_risk_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-governance l-diversity audit (Machanavajjhala et al. 2007
    — the attribute-disclosure complement to k_anonymity_risk_report):
    a quasi-identifier class can be large enough to pass k-anonymity
    yet still leak the SENSITIVE attribute if nearly all members share
    one value. Per (nation × balance band) class, the distinct count
    of the sensitive attribute (market segment) and the top value's
    share; flagged when distinct l < 3 (fails distinct-3-diversity) or
    one value holds > 80 % (skew disclosure, the recursive-(c,l) lite
    check) — shares as exact integer ppm via truncating division, no
    float anywhere.

    100 TB shape: one hash aggregate at (quasi-id × sensitive)
    cardinality with map-side combine, one re-aggregate at quasi-id
    cardinality; report size ∝ flagged classes."""
    cell = (
        load_table(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey",
            F.floor(F.col("c_acctbal") / 500)
            .cast("bigint")
            .alias("bal_band"),
            "c_mktsegment",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_seg"))
    )
    return (
        cell.groupBy("c_nationkey", "bal_band")
        .agg(
            F.sum("n_seg").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_seg"),
            F.expr("cast((1000000 * max(n_seg)) div sum(n_seg) as bigint)")
            .alias("top_seg_share_ppm"),
        )
        .filter(
            (F.col("n_distinct_seg") < 3)
            | (F.col("top_seg_share_ppm") > 800000)
        )
    )


@query(
    "t_closeness_risk_report",
    oracle="""
    WITH base AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS band
      FROM customer
    ),
    gl AS (
      SELECT band, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1
    ),
    glc AS (
      SELECT band, CAST(sum(c) OVER (ORDER BY band) AS BIGINT) AS ccum
      FROM gl
    ),
    tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS m
      FROM gl
    ),
    cls AS (
      SELECT c_nationkey, c_mktsegment, band,
             CAST(count(*) AS BIGINT) AS cg
      FROM base GROUP BY 1, 2, 3
    ),
    classes AS (
      SELECT c_nationkey, c_mktsegment, CAST(sum(cg) AS BIGINT) AS ng
      FROM cls GROUP BY 1, 2
    ),
    dense AS (
      SELECT k.c_nationkey, k.c_mktsegment, k.ng, g.band, g.ccum,
             COALESCE(c.cg, 0) AS cg
      FROM classes k
      CROSS JOIN glc g
      LEFT JOIN cls c
        ON c.c_nationkey = k.c_nationkey
       AND c.c_mktsegment = k.c_mktsegment
       AND c.band = g.band
    ),
    cum AS (
      SELECT c_nationkey, c_mktsegment, ng, band, ccum,
             CAST(sum(cg) OVER (PARTITION BY c_nationkey, c_mktsegment
                                ORDER BY band) AS BIGINT) AS cgcum
      FROM dense
    ),
    emd AS (
      SELECT c.c_nationkey, c.c_mktsegment,
             CAST(any_value(c.ng) AS BIGINT) AS n_class,
             CAST(sum(abs(CAST(c.cgcum AS HUGEINT) * t.n
                          - CAST(c.ng AS HUGEINT) * c.ccum))
                  AS HUGEINT) AS terms
      FROM cum c, tot t GROUP BY 1, 2
    )
    SELECT e.c_nationkey, e.c_mktsegment, e.n_class,
           CAST((1000000 * e.terms)
                // (CAST(e.n_class AS HUGEINT) * t.n * (t.m - 1))
                AS BIGINT) AS t_micro
    FROM emd e, tot t
    """,
)
def t_closeness_risk_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-governance t-closeness audit (Li, Li & Venkatasubramanian
    2007 — the distribution-disclosure complement to k-anonymity and
    l-diversity): a class can pass both and still leak if its SENSITIVE
    distribution differs sharply from the global one (e.g. a class
    whose balances are all in the top band). Per quasi-identifier class
    (nation x market segment), the Earth Mover's Distance between the
    class's ordered balance-band distribution and the global one:
    EMD = (1/(m-1)) * sum_v |P_cum(v) - Q_cum(v)|.

    Exactness: cumulative fractions are compared by integer
    CROSS-MULTIPLICATION (|cgcum*N - ng*ccum| — the quantized-ratio
    rule; HUGEINT/DECIMAL(38,0) since the product exceeds int64 at
    scale) and frozen to micro-units by one truncating division. No
    float anywhere.

    100 TB shape: one aggregate at (class x band) cardinality with
    map-side combine, a broadcast of the m-row global histogram, and
    a class-keyed window at dense (class x band) cardinality — report
    size = class count."""
    base = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("band"),
    )
    gl = base.groupBy("band").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wg = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, 0)
    glc = gl.select("band", F.sum("c").over(wg).cast("bigint").alias("ccum"))
    tot = gl.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("m"),
    )
    cls = base.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).cast("bigint").alias("cg")
    )
    classes = cls.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cg").cast("bigint").alias("ng")
    )
    dense = (
        classes.crossJoin(F.broadcast(glc))
        .join(cls, ["c_nationkey", "c_mktsegment", "band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "ng",
            "band",
            "ccum",
            F.coalesce("cg", F.lit(0)).alias("cg"),
        )
    )
    wc = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("band")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = dense.select(
        "c_nationkey",
        "c_mktsegment",
        "ng",
        "ccum",
        F.sum("cg").over(wc).cast("bigint").alias("cgcum"),
    )
    emd = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.first("ng").alias("n_class"),
            F.sum(
                F.abs(
                    F.col("cgcum").cast("decimal(38,0)") * F.col("n")
                    - F.col("ng").cast("decimal(38,0)") * F.col("ccum")
                )
            ).alias("terms"),
            F.first("n").alias("n_tot"),
            F.first("m").alias("m_bands"),
        )
    )
    return emd.select(
        "c_nationkey",
        "c_mktsegment",
        F.col("n_class").cast("bigint").alias("n_class"),
        F.expr(
            "cast((1000000 * terms)"
            " div (cast(n_class as decimal(38,0)) * n_tot * (m_bands - 1))"
            " as bigint)"
        ).alias("t_micro"),
    )


@query(
    "abc_classification_parts",
    oracle="""
    WITH rev AS (
      SELECT l_partkey AS p,
             CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rc
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(rc) AS BIGINT) AS t FROM rev),
    cum AS (
      SELECT p, rc,
             CAST(sum(rc) OVER (ORDER BY rc DESC, p ASC) AS BIGINT)
               AS cum_rc
      FROM rev
    )
    SELECT c.p AS l_partkey, c.rc AS rev_cents, c.cum_rc AS cum_cents,
           CAST((1000000 * c.rc) // t.t AS BIGINT) AS share_micro,
           CAST((1000000 * c.cum_rc) // t.t AS BIGINT) AS cum_share_micro,
           CASE WHEN 100 * c.cum_rc <= 80 * t.t THEN 'A'
                WHEN 100 * c.cum_rc <= 95 * t.t THEN 'B'
                ELSE 'C' END AS abc_class
    FROM cum c, tot t
    """,
)
def abc_classification_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue — the inventory
    staple ("A-parts are the ~20% of items carrying 80% of revenue").
    Every part gets its revenue share, the exact running revenue in
    (revenue DESC, partkey) order, and an A/B/C class from integer
    threshold comparisons (100·cum ≤ 80·total, ≤ 95·total — no float
    share ever decides a class).

    Scale shape — the running sum does NOT use a global
    single-partition window (the part domain is ~200M keys at 100 TB):
    the assign_contiguous_ids bucket recipe applied to a running SUM.
    approx_percentile samples revenue boundaries (scalar collect), a
    codegen'd fold buckets each part, per-bucket SUBTOTALS shuffle B
    rows, the exclusive prefix sum over those B rows is the only
    single-partition step, and the within-bucket window runs parallel
    across buckets. Correct for ANY boundary placement: equal revenue
    values always land in one bucket (strict `> b` fold), so the
    (rc DESC, p ASC) tiebreak never straddles buckets."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("p")).agg(
        F.sum(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast(
                "bigint"
            )
        )
        .cast("bigint")
        .alias("rc")
    )
    n_buckets = 64
    fracs = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    bounds = rev.agg(
        F.expr(f"approx_percentile(rc, array({fracs}), 10000)")
    ).first()[0]
    uniq = sorted({int(b) for b in (bounds or [])})
    barr = F.array(*[F.lit(b) for b in uniq]) if uniq else F.array(F.lit(0))
    # bucket 0 = highest revenue (DESC order): count boundaries >= rc
    bucket = F.aggregate(
        barr,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col("rc") > b, 1).otherwise(0),
    )
    with_b = rev.withColumn("__bucket", -bucket)  # negate → DESC order
    subtotals = with_b.groupBy("__bucket").agg(
        F.sum("rc").cast("bigint").alias("__sub")
    )
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = subtotals.select(
        "__bucket",
        F.coalesce(F.sum("__sub").over(w_off), F.lit(0))
        .cast("bigint")
        .alias("__offset"),
    )
    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(F.col("rc").desc(), F.col("p").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = rev.agg(F.sum("rc").cast("bigint").alias("t"))
    cum = (
        with_b.join(F.broadcast(offsets), "__bucket")
        .withColumn(
            "cum_rc",
            (F.col("__offset") + F.sum("rc").over(w_local)).cast("bigint"),
        )
        .crossJoin(F.broadcast(tot))
    )
    return cum.select(
        F.col("p").alias("l_partkey"),
        F.col("rc").alias("rev_cents"),
        F.col("cum_rc").alias("cum_cents"),
        F.expr("(1000000 * rc) div t").cast("bigint").alias("share_micro"),
        F.expr("(1000000 * cum_rc) div t")
        .cast("bigint")
        .alias("cum_share_micro"),
        F.when(100 * F.col("cum_rc") <= 80 * F.col("t"), F.lit("A"))
        .when(100 * F.col("cum_rc") <= 95 * F.col("t"), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


@query(
    "cohort_ltv_per_member",
    oracle="""
    WITH om AS (
      SELECT o_custkey,
             CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                  AS BIGINT) AS m,
             CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ),
    first_m AS (
      SELECT o_custkey, min(m) AS cohort_m FROM om GROUP BY 1
    ),
    sizes AS (
      SELECT cohort_m, CAST(count(*) AS BIGINT) AS cohort_size
      FROM first_m GROUP BY 1
    ),
    cells AS (
      SELECT f.cohort_m, om.m - f.cohort_m AS k,
             CAST(sum(om.cents) AS BIGINT) AS rev_cents
      FROM om JOIN first_m f ON om.o_custkey = f.o_custkey
      GROUP BY 1, 2
    ),
    cum AS (
      SELECT cohort_m, k, rev_cents,
             CAST(sum(rev_cents) OVER (PARTITION BY cohort_m ORDER BY k)
                  AS BIGINT) AS cum_cents
      FROM cells
    )
    SELECT c.cohort_m, CAST(c.k AS BIGINT) AS k, c.rev_cents,
           c.cum_cents, s.cohort_size,
           CAST((1000 * c.cum_cents) // s.cohort_size AS BIGINT)
             AS ltv_millicents
    FROM cum c JOIN sizes s ON s.cohort_m = c.cohort_m
    """,
)
def cohort_ltv_per_member(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-member cohort LTV over the ORDER history — the
    normalized companion of ``retention_cohort_matrix`` (same
    first-order-month cohorts) and of the event-stream
    ``cohort_ltv_curve`` (weekly, event-value based, unnormalized):
    per (first-order-month cohort, age k),
    the cohort's revenue that month, its RUNNING total, and cumulative
    LTV per cohort member (exact integer milli-cents via truncating
    division). The curve every subscription/commerce deck plots to ask
    "when does a cohort pay back acquisition cost".

    Scale shape: orders collapse to (custkey, month, cents) at source
    (map-side combine), one custkey-keyed join against the first-month
    aggregate, then everything — including the running-sum window —
    runs at (cohort × age) cardinality: a few hundred cells however
    big the order history."""
    om = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("bigint")
            .alias("m"),
        )
        .agg(
            F.sum(
                (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    first_m = om.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    sizes = first_m.groupBy("cohort_m").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    cells = (
        om.join(first_m, "o_custkey")
        .groupBy("cohort_m", (F.col("m") - F.col("cohort_m")).alias("k"))
        .agg(F.sum("cents").cast("bigint").alias("rev_cents"))
    )
    wcum = (
        Window.partitionBy("cohort_m")
        .orderBy("k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        cells.withColumn(
            "cum_cents", F.sum("rev_cents").over(wcum).cast("bigint")
        )
        .join(sizes, "cohort_m")
        .select(
            "cohort_m",
            F.col("k").cast("bigint").alias("k"),
            "rev_cents",
            "cum_cents",
            "cohort_size",
            F.expr("(1000 * cum_cents) div cohort_size")
            .cast("bigint")
            .alias("ltv_millicents"),
        )
    )


# ---------------------------------------------------------------------------
# Item-item collaborative filtering: top-k co-purchase recommendations
# ---------------------------------------------------------------------------


@query(
    "itemitem_cf_topk",
    oracle="""
    WITH bp AS MATERIALIZED (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    ci AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
      FROM bp GROUP BY l_partkey
    ),
    cij AS (
      SELECT a.l_partkey AS part_i, b.l_partkey AS part_j,
             CAST(count(*) AS BIGINT) AS co_count
      FROM bp a JOIN bp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT c.part_i, c.part_j, c.co_count,
             CAST((1000000 * CAST(c.co_count AS HUGEINT) * c.co_count)
                  // (ca.cnt * cb.cnt) AS BIGINT) AS cos2_q
      FROM cij c
      JOIN ci ca ON ca.l_partkey = c.part_i
      JOIN ci cb ON cb.l_partkey = c.part_j
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY part_i
               ORDER BY cos2_q DESC, co_count DESC, part_j) AS rk
      FROM scored
    )
    SELECT part_i, part_j, co_count, cos2_q, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def itemitem_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative-filtering recommendations (Sarwar et al.
    2001; the Amazon item-to-item pattern — public methods): for every
    part, the top-3 co-purchased neighbors ranked by squared cosine
    over binary basket vectors, cos²(i,j) = c_ij² / (c_i·c_j) —
    squared to stay in EXACT integer arithmetic (monotone in cosine,
    so ranks are identical; quantized at 1e6 by integer division,
    multiply carried in DECIMAL(38,0)/HUGEINT since c_ij² overflows
    int64 once items co-occur in > 3e9 baskets). Ties break by
    (co_count desc, part_j asc), deterministically.

    100 TB shape: candidate pairs come from a self-join keyed on the
    ORDER (co-located shuffle on l_orderkey, never an all-pairs item
    cross product), so pair work is Σ basket² — bounded because TPC-H
    baskets hold ≤ 7 distinct parts (a production corpus caps or
    samples mega-baskets first, the dedup mega-bucket guard's rule).
    The pair aggregate and the two item-count joins shuffle at
    pair/item cardinality; the per-item top-3 is a bounded window at
    neighbor cardinality, partitioned by item — no single-partition
    stage anywhere."""
    li = load_table(spark, sf_dir, "lineitem")
    return itemitem_topk_of(basket_pairs(li))


def basket_pairs(lineitem: DataFrame) -> DataFrame:
    """DISTINCT (l_orderkey, l_partkey) — the basket relation. A SET,
    so per-batch partials merge by distinct-union (order-free,
    replay-idempotent): the state the streaming CF maintenance member
    (streaming/itemitem_stream.py) stores."""
    return lineitem.select("l_orderkey", "l_partkey").distinct()


def itemitem_topk_of(bp: DataFrame) -> DataFrame:
    """The derivation half of itemitem_cf_topk (see its docstring),
    computable from ANY source of the basket relation — scanned or
    streamed-and-stored."""
    ci = bp.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    a, b = bp.alias("a"), bp.alias("b")
    # Aggregate ONE orientation (i < j) and mirror AFTER the aggregate:
    # co-counts are symmetric, so this halves the pair-aggregate
    # shuffle — the query's dominant exchange (it was the repo's #1
    # absolute shuffle writer in SHUFFLE_AUDIT before the fold) — while
    # the mirror is a narrow map over the already-aggregated pairs.
    half = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_i"),
            F.col("b.l_partkey").alias("part_j"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("co_count"))
    )
    scored_half = (
        half.join(
            ci.select(F.col("l_partkey").alias("part_i"), F.col("cnt").alias("c_i")),
            "part_i",
        )
        .join(
            ci.select(F.col("l_partkey").alias("part_j"), F.col("cnt").alias("c_j")),
            "part_j",
        )
        .select(
            "part_i",
            "part_j",
            "co_count",
            F.expr(
                "cast((1000000 * cast(co_count as decimal(38,0)) * co_count)"
                " div (c_i * c_j) as bigint)"
            ).alias("cos2_q"),
        )
    )
    # cos² and co_count are symmetric, so the item-count joins and the
    # score run on the HALF orientation; only the per-item top-3 window
    # sees both directions (a narrow union of the scored relation).
    scored = scored_half.unionByName(
        scored_half.select(
            F.col("part_j").alias("part_i"),
            F.col("part_i").alias("part_j"),
            "co_count",
            "cos2_q",
        )
    )
    w = Window.partitionBy("part_i").orderBy(
        F.col("cos2_q").desc(), F.col("co_count").desc(), F.col("part_j")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
    )
