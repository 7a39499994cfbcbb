"""Streaming heavy-hitters maintenance: a Misra–Gries summary kept
current as document files land.

The batch side (operators/frequent.py) proves the two-phase shape —
bounded-memory MG candidates, exact verify, N/(m+1) floor. This module
runs phase 1 continuously: each micro-batch's per-partition MG
summaries (the SAME mapInPandas plan as batch) merge into a stored
summary of at most ``capacity`` counters via the mergeable-summaries
rule (Agarwal et al., PODS'12): add counters, subtract the
(capacity+1)-th largest, drop non-positives. Error is additive across
merges and stays ≤ N/(capacity+1) for the TOTAL token count N, so the
stored summary is at all times a provable superset of every token
whose global count exceeds that floor — regardless of how the corpus
was chopped into micro-batches.

Publishing exact counts is phase 2's job and stays a batch pass:
``published_topk`` verifies the stored candidates against the document
archive exactly. Because the floor filter discards every sub-floor
candidate, the published rows are IDENTICAL to a from-scratch batch
``exact_heavy_hitters`` over the same archive — differently-pruned
candidate supersets converge to the same exact prefix (the twin test's
equality).

Storage is a ``SnapshotTable`` (capacity+1 rows per version: the
counters plus one 'total' row carrying N): atomic pointer flip, replay
skip via the (checkpoint, batch_id) watermark, history readable by
version — the same exactly-once discipline as corpus_stats_stream.

Scale shape per micro-batch: one scan of the batch's new files, one
O(capacity)-memory Arrow pass, one ≤ P·capacity-row collect (bounded
by construction, not by luck), one capacity-row write. The stored
summary never grows with the corpus — only the archive does.
"""

from __future__ import annotations

import os
from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.operators.frequent import (
    mg_merge,
    misra_gries_summary,
    verify_topk,
)

_SCHEMA = "kind string, token string, cnt long"


def _read_state(snaps: SnapshotTable) -> tuple[Counter, int]:
    """(stored counters, running total token count) — ≤ capacity+1
    rows, a model-sized read."""
    if snaps.current_version() is None:
        return Counter(), 0
    rows = snaps.read().collect()
    n_total = next(int(r["cnt"]) for r in rows if r["kind"] == "total")
    counters = Counter(
        {r["token"]: int(r["cnt"]) for r in rows if r["kind"] == "tok"}
    )
    return counters, n_total


def merge_mg_batch(
    snaps: SnapshotTable,
    batch_docs: DataFrame,
    batch_id: int,
    app_id: str,
    capacity: int,
    text_col: str = "text",
) -> bool:
    """Fold one micro-batch's MG summary into the stored summary;
    returns False when the batch id was already applied (checkpoint
    replay) and the merge is skipped — an additive counter merge is
    not replay-idempotent, so the watermark is load-bearing."""
    if batch_id <= snaps.applied_upto(app_id):
        return False
    spark = batch_docs.sparkSession
    # ≤ P·capacity rows: per-partition summaries, summed per token.
    batch_counter: Counter = Counter()
    for r in misra_gries_summary(batch_docs, capacity, text_col=text_col).collect():
        batch_counter[r["token"]] += int(r["cnt"])
    batch_n = (
        batch_docs.select(
            F.sum(F.size(F.split(F.col(text_col), " "))).alias("n")
        ).first()[0]
        or 0
    )
    stored, n_prev = _read_state(snaps)
    merged = mg_merge(stored + batch_counter, capacity)
    rows = [("tok", t, int(c)) for t, c in merged.items()]
    rows.append(("total", None, int(n_prev) + int(batch_n)))
    snaps.write(
        spark.createDataFrame(rows, _SCHEMA), marker=(app_id, batch_id)
    )
    return True


def stream_heavy_hitters_to_warehouse(
    stream_docs: DataFrame,
    loader: WarehouseLoader,
    table: str,
    checkpoint_dir: str,
    capacity: int,
) -> SnapshotTable:
    """Drain the document stream's backlog, folding each micro-batch
    into the stored MG summary (availableNow: finite, then stop)."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_docs,
        lambda batch, bid: merge_mg_batch(snaps, batch, bid, app_id, capacity),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps


def candidates_of(snaps: SnapshotTable) -> DataFrame:
    """The stored candidate tokens as a relation (≤ capacity rows)."""
    return snaps.read().filter(F.col("kind") == "tok").select("token")


def error_bound(snaps: SnapshotTable, capacity: int) -> int:
    """Worst-case undercount of any stored counter: N/(capacity+1)."""
    _, n_total = _read_state(snaps)
    return n_total // (capacity + 1)


def published_topk(
    archive_docs: DataFrame,
    snaps: SnapshotTable,
    capacity: int,
    k: int,
    text_col: str = "text",
) -> DataFrame:
    """Phase-2 exact verify of the streamed candidates against the
    document archive — identical rows to a from-scratch batch
    exact_heavy_hitters over the same archive (floor-filter
    convergence, see module docstring)."""
    return verify_topk(
        archive_docs, candidates_of(snaps), capacity, k, text_col=text_col
    )
