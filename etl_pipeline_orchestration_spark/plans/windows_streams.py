"""Time-series / event queries [EXT]: sessionization, tumbling/sliding/
session windows (batch twins of the streaming pipelines in
``streaming/``), as-of and range joins (SURVEY.md §2.6-2.7, §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.plans.registry import query
from etl_pipeline_orchestration_spark.sources.tables import load_table


@query(
    "sessionize_events",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM gaps
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (gap > 30 min ⇒ new session): lag to mark
    boundaries + running sum to number sessions — one shuffle on user_id.
    """
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_sec = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap_sec.isNull() | (gap_sec > 1800), F.lit(1)).otherwise(F.lit(0)),
    )
    wsum = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = marked.withColumn(
        "session_no", F.sum("new_session").over(wsum).cast("long")
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "tumbling_window_events",
    oracle="""
    SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
           time_bucket(INTERVAL 5 MINUTE, ts) + INTERVAL 5 MINUTE AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming tumbling-window aggregation (identical
    F.window call runs under readStream in streaming/events_stream.py)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "sliding_window_events",
    oracle="""
    WITH shifted AS (
      SELECT time_bucket(INTERVAL 5 MINUTE, ts) - (k.off * INTERVAL 5 MINUTE)
               AS window_start,
             value
      FROM events CROSS JOIN (VALUES (0), (1)) AS k(off)
    )
    SELECT window_start,
           window_start + INTERVAL 10 MINUTE AS window_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM shifted
    GROUP BY 1, 2
    """,
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 — each event lands in 2 windows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "session_window_events",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    OR lag(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      FROM gaps
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4) AS total_value
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window batch twin (streaming version uses the same
    expression with a watermark). Session end = last event + gap, matching
    Spark's session_window semantics."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "asof_join_events_orders",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
      FROM orders
      GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
    FROM events e
    ASOF LEFT JOIN o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest order at-or-before each event per user), built as
    a single-shuffle union-sort-window plan: tag both sides, sort by
    (key, ts, tag), carry the last order forward with last(ignorenulls) —
    no pairwise explosion, scales to any fan-in. Orders deduped to one row
    per (custkey, orderdate) for deterministic ties.
    """
    ev = load_table(spark, sf_dir, "events")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    o_tagged = orders.select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("tag"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        "o_orderkey",
        "o_orderdate",
    )
    e_tagged = ev.select(
        F.col("user_id").alias("key"),
        F.col("ts").alias("t"),
        F.lit(1).alias("tag"),
        "event_id",
        "ts",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    )
    unioned = o_tagged.unionByName(e_tagged)
    w = (
        W.partitionBy("key")
        .orderBy("t", "tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "tag",
        "event_id",
        F.col("key").alias("user_id"),
        "ts",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("o_orderkey"),
        F.last("o_orderdate", ignorenulls=True).over(w).alias("o_orderdate"),
    )
    return carried.filter(F.col("tag") == 1).drop("tag")


@query(
    "range_join_value_tiers",
    oracle="""
    SELECT t.tier,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(e.value), 4) AS total_value
    FROM events e
    JOIN (VALUES ('bronze', 0.0, 50.0),
                 ('silver', 50.0, 120.0),
                 ('gold', 120.0, 1e9)) AS t(tier, lo, hi)
      ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    """,
)
def range_join_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join against a tiny tier dim — broadcast-nested-loop by
    construction (the dim is 3 rows; never shuffle the fact side)."""
    ev = load_table(spark, sf_dir, "events")
    tiers = ev.sparkSession.createDataFrame(
        [("bronze", 0.0, 50.0), ("silver", 50.0, 120.0), ("gold", 120.0, 1e9)],
        ["tier", "lo", "hi"],
    )
    joined = ev.join(
        F.broadcast(tiers),
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
    )
    return joined.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@query(
    "grouping_sets_events",
    oracle="""
    SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
    """,
)
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_bucket,
               count(*) AS n,
               round(sum(value), 4) AS total_value
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        """
    )
