"""Custom stateful streaming operator via applyInPandasWithState
[EXT] (SURVEY.md §2.10): per-key running aggregates that survive across
micro-batches in the state store.

This is the escape hatch for stateful logic Spark's built-in windowed
aggregations can't express (per-entity counters, custom sessionization,
online features). State is partitioned by the grouping key — scale-out
is the same hash-shuffle story as any keyed aggregation, and the state
store (RocksDB-backed in production configs) spills per-key state off
heap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
RUNNING_STATE_SCHEMA = "n long, total double"


def _update_running(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into the persisted
    (count, total) state; emit the updated running totals."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum(value)) with explicit state.
    Each micro-batch emits one updated row per active user; the final
    emitted row per user equals the batch group-by."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
