"""Streaming attribution maintenance: Markov removal effects, exact
Shapley values, and the first/last/linear heuristics kept current as
event files land — the fifteenth streaming-maintenance member.

The batch side (plans/ml_analytics.py: markov_attribution_events,
shapley_attribution_events, attribution_heuristics_events) derives all
three tables from per-user JOURNEYS — windows over a user's
time-ordered events, cut at each conversion. Journey cuts are NOT
mergeable across micro-batches: a user's journey can straddle a batch
boundary, and a later batch can deliver an EARLIER conversion that
retroactively re-cuts journeys already counted (the retention-stream
mis-cohort failure at journey grain). What IS additive is the
per-(user, channel-event) relation itself: each event row is atomic,
journeys are a pure function of the set of a user's (ts, event_id,
event_type) triples, and set union is order-free. So maintenance
merges the four-column event projection — the minimal sufficient
statistic for journey assembly, since cuts depend on each user's total
event order and no coarser aggregate survives a boundary-straddling
journey — and the publishers re-derive journeys + credits from the
STORED relation with the batch queries' own code
(``markov_attribution_table`` / ``shapley_attribution_table`` /
``attribution_heuristics_table``). Twin equality certifies the merge
(both arrival orders); the batch oracles certify the derivation — the
preference_stream discipline applied to a window-cut statistic.

Storage is a ``SnapshotTable`` at event grain but pruned to four
columns (no value/props payloads): atomic pointer flip, replay skip
via the (checkpoint, batch_id) watermark, dedup on event_id so
re-delivered files cannot double-count (every non-key column is
functionally dependent on event_id, so the dedup is deterministic).
At corpus scale the stored projection is a column-pruned copy of the
event log — attribution's state genuinely is the journey history; the
projection (and any retention horizon a deployment adds on ts) is the
compression.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.plans.ml_analytics import (
    attribution_heuristics_table,
    markov_attribution_table,
    shapley_attribution_table,
)
from etl_pipeline_orchestration_spark.streaming.events_stream import (
    read_events_stream,
)

__all__ = [
    "read_events_stream",
    "merge_journey_state_batch",
    "stream_attribution_to_warehouse",
    "published_markov_attribution",
    "published_shapley_attribution",
    "published_attribution_heuristics",
]

_STATE_COLS = ("event_id", "ts", "user_id", "event_type")


def merge_journey_state_batch(
    snaps: SnapshotTable, batch_events: DataFrame, batch_id: int, app_id: str
) -> bool:
    """Set-union one micro-batch's (event_id, ts, user_id, event_type)
    projection into the stored journey history; returns False on
    checkpoint replay."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    partial = batch_events.select(*[F.col(c) for c in _STATE_COLS])
    if snaps.current_version() is not None:
        partial = snaps.read().unionByName(partial)
    snaps.write(
        partial.dropDuplicates(["event_id"]), marker=(app_id, batch_id)
    )
    return True


def stream_attribution_to_warehouse(
    stream_events: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the event stream's backlog, folding each micro-batch into
    the stored journey-history projection (availableNow)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_events,
        lambda batch, bid: merge_journey_state_batch(
            snaps, batch, bid, app_id
        ),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def published_markov_attribution(spark, snaps: SnapshotTable) -> DataFrame:
    """Markov removal-effect table from the maintained journey history —
    identical derivation to the batch query's."""
    return markov_attribution_table(snaps.read())


def published_shapley_attribution(spark, snaps: SnapshotTable) -> DataFrame:
    """Shapley attribution table from the maintained journey history."""
    return shapley_attribution_table(snaps.read())


def published_attribution_heuristics(spark, snaps: SnapshotTable) -> DataFrame:
    """First/last/linear heuristic table from the maintained journey
    history."""
    return attribution_heuristics_table(snaps.read())
