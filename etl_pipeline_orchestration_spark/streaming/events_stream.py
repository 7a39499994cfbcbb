"""Structured Streaming runtime over the events stream [EXT]
(SURVEY.md §2.10).

File-source ``readStream`` → watermark → windowed aggregation →
``foreachBatch`` sink. The window expressions are shared with the batch
twins in ``plans/windows_streams.py`` — identical ``F.window`` /
``F.session_window`` calls run under both engines, which is what lets
the DuckDB oracle validate the aggregation logic while streaming runs
validate the runtime (watermarks, state, triggers).

Scale notes:
* watermark bounds state: windows older than max(event-time) - delay are
  finalized and evicted; without it, session/window state grows forever;
* ``availableNow`` trigger processes a backlog as a finite series of
  micro-batches (used by the tests); production runs drop the trigger;
* foreachBatch receives an ordinary batch DataFrame per micro-batch, so
  any batch sink (warehouse append, JDBC upsert) is reusable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream: new parquet files under ``path`` become
    micro-batches. Schema is explicit — streaming sources cannot infer."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_counts(
    stream: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling event-time windows per event_type; same aggregation as the
    batch twin ``tumbling_window_events``. Late rows beyond ``watermark``
    are dropped and their windows finalized."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
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


def session_counts(
    stream: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows (gap-based) per user; batch twin:
    ``session_window_events``."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
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


def run_to_memory(
    agg: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain the stream's current backlog into an in-memory table named
    ``query_name`` (availableNow: finite micro-batch series, then stop).
    ``complete`` mode emits every window on each trigger — right for
    finite twin-checks; production append-mode emits only finalized
    windows."""
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_foreach_batch_append(
    agg: DataFrame, sink_fn, checkpoint_dir: str, output_mode: str = "update"
) -> None:
    """Drain the backlog through ``foreachBatch``: each micro-batch is an
    ordinary DataFrame handed to ``sink_fn(batch_df, batch_id)`` — reuse
    any batch writer (warehouse append, JDBC upsert). Checkpointing makes
    the sink restartable/exactly-once per batch id."""
    q = (
        agg.writeStream.foreachBatch(sink_fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: drop repeat (event_id) arrivals, holding
    state only for the watermark horizon — the unbounded-state-safe form
    of ``dropDuplicates`` (state for keys older than the watermark is
    evicted, so 100 TB/day of events needs state ∝ watermark window, not
    ∝ history). At-least-once upstream delivery + this = effectively-once
    downstream."""
    keys = keys or ["event_id"]
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_stream_static(stream: DataFrame, dim: DataFrame, on: str) -> DataFrame:
    """Stream-static join: each micro-batch joins the (small) static
    dimension — Spark plans a broadcast hash join per batch, no stream
    state at all. The standard enrichment shape (events × user dim)."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), on, "left")


def _attribution_legs(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str,
    max_gap_minutes: int,
):
    """Shared leg preparation for the three attribution-join variants:
    watermarked click/purchase projections plus the interval condition
    (same user, click at most ``max_gap_minutes`` before the purchase).
    One definition so a change to the gap semantics or watermark
    handling cannot silently diverge the variants."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
        )
    )
    return c, p, cond


def stream_stream_interval_join(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "10 minutes",
    max_gap_minutes: int = 5,
) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition:
    pair each purchase with same-user click events at most
    ``max_gap_minutes`` BEFORE it (the attribution join). Both sides
    carry watermarks and the join condition bounds event time in BOTH
    directions — that is what lets Spark compute, per side, how long a
    row can still find a partner, and EVICT join state past that
    horizon. An unbounded condition would mean unbounded state: the
    difference between a join that runs forever at 100 TB/day and one
    that OOMs on day two.
    """
    c, p, cond = _attribution_legs(clicks, purchases, watermark, max_gap_minutes)
    return c.join(p, cond).select(
        F.col("p_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def stream_stream_interval_join_left_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "10 minutes",
    max_gap_minutes: int = 5,
) -> DataFrame:
    """LEFT OUTER attribution join: every purchase emits exactly once —
    paired with each qualifying click, or with NULL click columns once
    the watermark proves no click can still arrive. The interval
    condition bounds both directions, so the unmatched-side decision is
    FINALIZABLE: a purchase's state evicts (and its null row emits)
    when the click watermark passes purchase_ts + gap. An outer join
    without that bound could never emit a null row, because "no partner
    yet" would never become "no partner ever".

    Caveat a finite-backlog caller must know (exercised by the twin
    test): outer NULL rows ride WATERMARK ADVANCE, and with an
    availableNow trigger the watermark only advances when a later batch
    brings later events — a tail purchase whose no-match horizon lies
    beyond the last event's watermark stays pending at stream end. At
    100 TB scale on a live stream this is a non-issue (events keep
    coming); finite drains append sentinel events past the horizon on
    BOTH input legs — the global watermark is the MIN across the two
    watermark operators, so advancing only one leg pins it — and in two
    separate trailing batches, because a batch's watermark only takes
    effect in the next batch's state cleanup (the twin test does both)
    — or accept that the tail decision arrives with the next day's
    data."""
    c, p, cond = _attribution_legs(clicks, purchases, watermark, max_gap_minutes)
    return p.join(c, cond, "leftOuter").select(
        F.col("p_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def stream_stream_interval_join_full_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "10 minutes",
    max_gap_minutes: int = 5,
) -> DataFrame:
    """FULL OUTER attribution join: unmatched rows from BOTH legs
    finalize to NULL-padded rows on watermark passage — unattributed
    purchases AND dead-end clicks in one stream (funnel diagnostics).
    Same finalizability requirement and finite-drain caveats as the
    left-outer variant (min-across-legs watermark, one-batch cleanup
    lag); the click side's no-match horizon extends ``max_gap_minutes``
    further, because a click at t can still match purchases up to
    t + gap."""
    c, p, cond = _attribution_legs(clicks, purchases, watermark, max_gap_minutes)
    return p.join(c, cond, "fullOuter").select(
        F.coalesce(F.col("p_user"), F.col("c_user")).alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def stream_stream_interval_join_right_outer(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "10 minutes",
    max_gap_minutes: int = 5,
) -> DataFrame:
    """RIGHT OUTER attribution join preserving the CLICK side: every
    click emits exactly once per qualifying purchase, or with NULL
    purchase columns once the watermark proves none can arrive —
    dead-end-click diagnostics without the full-outer's purchase-side
    nulls. Completes the stream-stream outer family (inner / left /
    right / full). Same finalizability requirement and finite-drain
    caveats as the left-outer variant (min-across-legs watermark,
    one-batch cleanup lag); the click side's no-match horizon extends
    ``max_gap_minutes`` further, because a click at t can still match
    purchases up to t + gap."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
        )
    )
    return p.join(c, cond, "rightOuter").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
