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


TWS_OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"

_MINIPROTO_DIR = None


def ensure_protobuf_runtime() -> str:
    """Make ``google.protobuf`` importable for the TWS state protocol.

    Prefers the real protobuf package. When absent (this sandbox), puts
    the vendored mini runtime (vendor/miniproto — implements exactly the
    proto3 subset StateMessage_pb2 and the state clients use) on
    ``sys.path`` AND exports it via ``PYTHONPATH`` so the Python worker
    processes that actually speak the state protocol can import it too.
    Returns "protobuf" or "miniproto". The vendor path is only ever
    added when the real package is missing, so a normal deployment
    always wins."""
    global _MINIPROTO_DIR
    import importlib.util
    import os
    import sys

    if _MINIPROTO_DIR is None:
        try:
            # raises ModuleNotFoundError when even the 'google' parent
            # namespace is absent (instead of returning None)
            if importlib.util.find_spec("google.protobuf"):
                return "protobuf"
        except ModuleNotFoundError:
            pass
    vendor = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "vendor",
        "miniproto",
    )
    if vendor not in sys.path:
        sys.path.insert(0, vendor)
    existing = os.environ.get("PYTHONPATH", "")
    if vendor not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            vendor + (os.pathsep + existing if existing else "")
        )
    _MINIPROTO_DIR = vendor
    return "miniproto"


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """Same running per-user totals on Spark 4's ``transformWithState``
    API (StatefulProcessor + typed ValueState) — the successor to
    applyInPandasWithState: composable state variables (value/list/map),
    timers, and TTL instead of a single state tuple. Requires the
    RocksDB state-store provider (set in the caller/test) and a
    ``google.protobuf`` runtime for the TWS state protocol — satisfied
    by the real package when installed, else by the vendored mini
    runtime (ensure_protobuf_runtime). The Python workers inherit the
    vendor path via the SparkContext environment, so the state client
    inside the worker can frame its socket protocol.

    State scales out per grouping key exactly like any keyed
    aggregation.
    """
    if ensure_protobuf_runtime() == "miniproto":
        # Worker processes build their env from sc.environment at UDF
        # creation time — export the vendor path there as well (the
        # driver-side os.environ export only helps when the JVM forks
        # workers with the driver's environment).
        import os

        sc = stream.sparkSession.sparkContext
        wp = sc.environment.get("PYTHONPATH", "")
        if _MINIPROTO_DIR not in wp.split(os.pathsep):
            sc.environment["PYTHONPATH"] = (
                _MINIPROTO_DIR + (os.pathsep + wp if wp else "")
            )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n long, total double")

        def handleInputRows(self, key, rows, timerValues):
            prev = self._agg.get() if self._agg.exists() else (0, 0.0)
            n, total = int(prev[0]), float(prev[1])
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
