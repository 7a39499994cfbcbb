"""Applied-batch watermark for non-idempotent foreachBatch sinks.

Sequence-aware merges (streaming/upsert.py) are replay-idempotent by
construction; ADDITIVE sinks (histogram merges, index growth, per-batch
pair emission) are not — a replayed batch id would double its
contribution. The fix is a high-water mark embedded INSIDE the
published table/version directory: the rename (or pointer flip) that
publishes the data publishes the watermark in the same atomic step, so
"data applied" and "batch recorded" can never diverge, and a replayed
id ≤ watermark is skipped.

Batch ids are monotone only WITHIN one checkpoint lineage — a stream
restarted against a fresh checkpoint numbers its batches from 0 again
(and re-reads the whole source). Skipping those would silently drop
data; merging them would silently double-count. So the marker records
the checkpoint identity (the ``txnAppId`` discipline transactional
formats use) and a mismatch FAILS LOUDLY: the (checkpoint, table) pair
is the unit of exactly-once, and pointing a new checkpoint at an
existing table is an operator error no sink-side bookkeeping can make
safe.

Spark's parquet reader ignores underscore-prefixed files (the _SUCCESS
convention), so the marker rides along invisibly."""

from __future__ import annotations

import os

MARKER = "_applied_upto"


def read_marker(table_dir: str) -> tuple[str, int] | None:
    """(app_id, batch_id) recorded in ``table_dir``, or None."""
    marker = os.path.join(table_dir, MARKER)
    if not os.path.isfile(marker):
        return None
    with open(marker) as f:
        lines = f.read().splitlines()
    if len(lines) == 1:  # legacy single-int format
        return "", int(lines[0].strip())
    return lines[0], int(lines[1].strip())


def applied_upto(table_dir: str, app_id: str) -> int:
    """Highest batch id of checkpoint ``app_id`` already folded into
    the table (-1 when none). Raises when the table was built by a
    DIFFERENT checkpoint — reprocessing under a new checkpoint re-reads
    the whole source, so neither skipping nor merging is safe."""
    m = read_marker(table_dir)
    if m is None:
        return -1
    if m[0] != app_id:
        raise ValueError(
            f"table at {table_dir} was built by checkpoint {m[0]!r}, but this "
            f"stream runs under {app_id!r}: batch ids are not comparable "
            "across checkpoints (a fresh checkpoint re-reads the source). "
            "Resume with the original checkpoint, or target a fresh table."
        )
    return m[1]


def write_marker(table_dir: str, app_id: str, batch_id: int) -> None:
    """Stamp a (scratch) table directory with its checkpoint identity
    and batch id — call BEFORE the publish rename/pointer flip so the
    publish is atomic."""
    with open(os.path.join(table_dir, MARKER), "w") as f:
        f.write(f"{app_id}\n{batch_id}")
