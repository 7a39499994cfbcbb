"""Incremental view maintenance (streaming/ivm_stream.py): the
signed-delta view equals the from-scratch aggregate of the post-CDC
table in ANY arrival order (addition commutes — unlike the row-level
upsert, no sequence ordering is needed), cross-day update retractions
hit both days, and fully-deleted days vanish (zero-weight
elimination)."""

from __future__ import annotations

import datetime
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from etl_pipeline_orchestration_spark.loader import (
    SnapshotTable,
    WarehouseLoader,
)
from etl_pipeline_orchestration_spark.streaming.ivm_stream import (
    CHANGES_SCHEMA,
    apply_deltas,
    ivm_batch,
    signed_deltas,
    stream_ivm_to_warehouse,
)

D = datetime.date


def _view(df):
    return {str(r.day): (r.n_orders, r.rev_cents) for r in df.collect()}


def _mk_changes(spark, rows):
    return spark.createDataFrame(rows, CHANGES_SCHEMA)


def _events():
    """Deterministic CDC feed: 60 creates over 3 days, 20 price
    updates, 10 cross-day moves, and every order of day 3 deleted."""
    d1, d2, d3 = D(2024, 1, 1), D(2024, 1, 2), D(2024, 1, 3)
    days = [d1, d2, d3]
    ev = []
    for k in range(60):
        day = days[k % 3]
        ev.append(("c", k, None, None, day, 1000 + k))
    for k in range(0, 60, 3):  # price update, same day
        day = days[k % 3]
        ev.append(("u", k, day, 1000 + k, day, 2000 + k))
    for k in range(1, 30, 3):  # move day1-family orders to day2
        cents = 2000 + k if k % 3 == 0 else 1000 + k
        ev.append(("u", k, days[k % 3], cents, d2, cents + 7))
    for k in range(2, 60, 3):  # delete ALL of day3's orders
        cents = 2000 + k if k % 3 == 0 else 1000 + k
        ev.append(("d", k, d3, cents, None, None))
    return ev


def _expected():
    """Pure-python replay of the base table, then aggregate."""
    table = {}
    for op, k, do, co, dn, cn in _events():
        if op == "c":
            table[k] = (dn, cn)
        elif op == "u":
            table[k] = (dn, cn)
        else:
            del table[k]
    agg = {}
    for day, cents in table.values():
        n, c = agg.get(day, (0, 0))
        agg[day] = (n + 1, c + cents)
    return {str(d): v for d, v in agg.items()}


def test_batch_delta_application_and_zero_elimination(spark):
    changes = _mk_changes(spark, _events())
    got = _view(apply_deltas(None, signed_deltas(changes)))
    want = _expected()
    assert got == want
    assert "2024-01-03" not in got  # fully-deleted day VANISHED
    assert "2024-01-02" in got  # cross-day moves landed


def test_streamed_view_equals_batch_any_order(spark, tmp_path):
    ev = _events()
    rng = random.Random(7)
    shuffled = ev[:]
    rng.shuffle(shuffled)  # arrival order is NOT event order
    for tag, feed in (("ord", ev), ("shuf", shuffled)):
        d = str(tmp_path / f"cdc_{tag}")
        os.makedirs(d)
        per = (len(feed) + 3) // 4
        for i in range(4):
            chunk = feed[i * per : (i + 1) * per]
            table = pa.table(
                {
                    "op": pa.array([e[0] for e in chunk], pa.string()),
                    "key": pa.array([e[1] for e in chunk], pa.int64()),
                    "day_old": pa.array([e[2] for e in chunk], pa.date32()),
                    "cents_old": pa.array([e[3] for e in chunk], pa.int64()),
                    "day_new": pa.array([e[4] for e in chunk], pa.date32()),
                    "cents_new": pa.array([e[5] for e in chunk], pa.int64()),
                }
            )
            p = os.path.join(d, f"part-{i}.parquet")
            pq.write_table(table, p)
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        loader = WarehouseLoader(spark, str(tmp_path / f"wh_{tag}"))
        stream = (
            spark.readStream.schema(CHANGES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        snaps = stream_ivm_to_warehouse(
            stream, loader, "rev_view", str(tmp_path / f"ck_{tag}")
        )
        assert _view(snaps.read()) == _expected(), tag
        assert len(snaps.versions()) == 4


def test_replay_skip_and_checkpoint_guard(spark, tmp_path):
    import pytest

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "v")
    ch = _mk_changes(spark, _events()[:10])
    assert ivm_batch(snaps, ch, 0, "ck")
    state = _view(snaps.read())
    assert not ivm_batch(snaps, ch, 0, "ck")
    assert _view(snaps.read()) == state
    with pytest.raises(ValueError, match="checkpoint"):
        ivm_batch(snaps, ch, 0, "other")
