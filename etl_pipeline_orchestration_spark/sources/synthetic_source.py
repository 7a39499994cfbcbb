"""Custom Python data source (Spark 4 DataSource API): a deterministic
synthetic events generator exposed as ``spark.read.format(...)``.

Why this exists: the reference pipeline fabricates its landing data in
driver-side generators; a custom DataSource moves generation INTO the
scan — each Spark task synthesizes its own partition, so a 10⁹-row
test corpus materializes cluster-parallel with zero driver memory and
no landing files. The same API is how any bespoke system (an internal
feed, a paginated HTTP API, a message log) becomes a first-class,
partition-parallel Spark table.

Determinism: every row is a pure function of (seed, row index) — the
same (seed, n_rows, n_parts) options always produce the same table, so
tests can assert exact contents.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_parts", 4))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [
            _RangePartition(a, b) for a, b in zip(bounds, bounds[1:]) if a < b
        ]

    def read(self, partition):
        # executor-side: generate only THIS partition's rows
        import numpy as np

        rng = np.random.RandomState(self.seed + partition.start)
        n = partition.end - partition.start
        kinds = ("view", "click", "purchase")
        types = rng.randint(0, len(kinds), size=n)
        values = np.round(rng.uniform(0, 100, size=n), 2)
        for i in range(n):
            row_id = partition.start + i
            yield (row_id, kinds[types[i]], float(values[i]))


class SyntheticEventsSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, event_type string, value double"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration; afterwards
    ``spark.read.format("synthetic_events")`` works session-wide."""
    spark.dataSource.register(SyntheticEventsSource)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: each micro-batch emits the
    next ``rows_per_batch`` deterministic rows, offset = row index.

    ``SimpleDataSourceStreamReader`` is the driver-side streaming API
    (one reader, offsets tracked by the engine); rows here are a pure
    function of the row index, so replay after failure regenerates
    IDENTICAL rows — exactly-once semantics come from determinism, the
    same property the batch reader's tests pin. For partition-parallel
    streaming synthesis use DataSourceStreamReader with partitions();
    the simple variant keeps the demo driver-only, which matches its
    documented scale envelope (low-throughput sources)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 0))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        import numpy as np

        a = int(start["row"])
        b = a + self.rows_per_batch
        rng = np.random.RandomState(self.seed + a)
        kinds = ("view", "click", "purchase")
        types = rng.randint(0, len(kinds), size=b - a)
        values = np.round(rng.uniform(0, 100, size=b - a), 2)
        rows = [
            (a + i, kinds[types[i]], float(values[i])) for i in range(b - a)
        ]
        return iter(rows), {"row": b}

    def readBetweenOffsets(self, start: dict, end: dict):
        # failure replay: regenerate the exact same rows for [start, end)
        import numpy as np

        a, b = int(start["row"]), int(end["row"])
        rng = np.random.RandomState(self.seed + a)
        kinds = ("view", "click", "purchase")
        types = rng.randint(0, len(kinds), size=b - a)
        values = np.round(rng.uniform(0, 100, size=b - a), 2)
        return iter(
            (a + i, kinds[types[i]], float(values[i])) for i in range(b - a)
        )

    def commit(self, end: dict) -> None:
        pass
