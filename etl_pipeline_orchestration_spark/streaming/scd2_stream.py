"""Streaming SCD Type-2 dimension maintenance: the full-history twin
of the streaming upsert.

``streaming/upsert.py`` maintains CURRENT state per key; this module
maintains the complete [valid_from, valid_to) interval history the
batch query ``scd2_user_event_intervals`` computes in one shot — as a
continuously-maintained snapshot-versioned table. Each micro-batch of
change rows is applied with the affected-keys discipline:

* keys NOT touched by the batch: their interval rows are copied
  through untouched (at scale: the copy-through is a partition-pruned
  anti-join, and on a transactional table format it would be zero
  rewrite — the snapshot layer here models the commit, not the
  file-level diff);
* keys IN the batch: their stored intervals are decomposed back into
  change rows ((valid_from, seq, payload) is lossless by
  construction), unioned with the batch's new change rows, exactly
  deduplicated, and their timelines RECOMPUTED with the same
  lead()-window expression as the batch query.

Because intervals derive from EVENT TIME (not arrival time), this
apply is arrival-order independent: an out-of-order batch carrying an
older change row splits the stored interval it lands inside — the
recompute handles middle insertion, head insertion, and duplicate
replays (exact dedup) uniformly, with no sequence-condition caveat at
all. That is the fundamental difference from last-write-wins upsert,
where arrival order must be neutralized by the sequence guard; the
stream==batch twin holds here under ANY file arrival order, and the
out-of-order test pins exactly that.

Publish discipline is the snapshot one (loader.SnapshotTable):
immutable ``v=N`` directory per batch + atomic pointer flip carrying
the applied-upto watermark; replayed batch ids are skipped; a crash
before the flip leaves an orphan the next write supersedes; every
batch's post-apply history stays time-travelable (dimension-as-of-
batch-k). No counterpart in the reference (its pipeline is stateless
per run, etl_pipeline.py:91-175); the op exists for the §2.10
streaming-runtime lane's warehouse-maintenance family.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader


def scd2_intervals(changes: DataFrame, key: str, ts_col: str, seq_col: str,
                   payload: tuple[str, ...]) -> DataFrame:
    """The shared timeline expression (identical to the batch query
    scd2_user_event_intervals): per-key lead() over (ts, seq) —
    the seq tiebreak keeps duplicate timestamps from flipping interval
    boundaries between runs."""
    w = W.partitionBy(key).orderBy(ts_col, seq_col)
    nxt = F.lead(ts_col).over(w)
    return changes.select(
        key,
        *payload,
        F.col(seq_col).alias("__seq__"),
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def _to_changes(intervals: DataFrame, key: str, ts_col: str, seq_col: str,
                payload: tuple[str, ...]) -> DataFrame:
    """Decompose stored interval rows back into change rows — lossless
    because each interval row carries its own (valid_from, seq,
    payload); valid_to/is_current are derived state."""
    return intervals.select(
        key,
        F.col("valid_from").alias(ts_col),
        F.col("__seq__").alias(seq_col),
        *payload,
    )


def scd2_apply_batch(
    snaps: SnapshotTable,
    batch: DataFrame,
    batch_id: int,
    app_id: str,
    key: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    payload: tuple[str, ...] = ("event_type",),
) -> bool:
    """Apply one micro-batch of change rows to the history table and
    publish the result as a new snapshot version. Returns False on
    checkpoint replay (batch id at or below the watermark)."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    # Deterministic dedup: dropDuplicates keeps a PARTITION-ORDER-
    # dependent survivor, which is fine for exact replays but would
    # make the maintained history run-dependent if an ill-formed feed
    # ever carried two payloads under one (key, ts, seq). max_by on
    # the payload struct pins the survivor to the lexicographically
    # greatest payload — stable across runs, cluster layouts, and the
    # stream==batch twin. That requires ORDERABLE payload types; fail
    # loudly up front for maps rather than at plan time mid-stream.
    from pyspark.sql import types as T

    for c in payload:
        if isinstance(batch.schema[c].dataType, T.MapType):
            raise TypeError(
                f"SCD2 payload column {c!r} is a map: max_by dedup needs "
                "orderable types — serialize the map (to_json / sorted "
                "entries) before streaming it into the dimension"
            )
    changes = (
        batch.select(key, ts_col, seq_col, *payload)
        .groupBy(key, ts_col, seq_col)
        .agg(
            F.max(F.struct(*payload)).alias("__p__"),
        )
        .select(key, ts_col, seq_col, *[f"__p__.{c}" for c in payload])
    )
    if snaps.current_version() is None:
        merged = scd2_intervals(changes, key, ts_col, seq_col, payload)
    else:
        cur = snaps.read()
        # One micro-batch's key set is small by construction; broadcast
        # it so both the copy-through anti-join and the affected-rows
        # semi-join are single broadcast-hash passes over the history —
        # never a shuffle of the (corpus-sized) stored table.
        affected = F.broadcast(changes.select(key).distinct())
        untouched = cur.join(affected, key, "left_anti")
        replay = _to_changes(
            cur.join(affected, key, "semi"), key, ts_col, seq_col, payload
        )
        recomputed = scd2_intervals(
            replay.unionByName(changes).dropDuplicates([key, ts_col, seq_col]),
            key,
            ts_col,
            seq_col,
            payload,
        )
        merged = untouched.unionByName(recomputed)
    snaps.write(merged, marker=(app_id, batch_id))
    return True


def stream_scd2_snapshots(
    stream: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
    key: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    payload: tuple[str, ...] = ("event_type",),
) -> SnapshotTable:
    """Drain the stream's backlog, maintaining the SCD2 history table
    (availableNow: finite, then stop). One published version per
    micro-batch; ``read(version=k)`` is the dimension history as of
    batch k."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream,
        lambda batch, bid: scd2_apply_batch(
            snaps, batch, bid, app_id, key, ts_col, seq_col, payload
        ),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def read_history(snaps: SnapshotTable, version: int | None = None) -> DataFrame:
    """The maintained history in the batch query's column shape."""
    return snaps.read(version).select(
        "user_id", "event_type", "valid_from", "valid_to", "is_current"
    )
