"""Applied-batch watermark for non-idempotent foreachBatch sinks.

Sequence-aware merges (streaming/upsert.py) are replay-idempotent by
construction; ADDITIVE sinks (histogram merges, index growth, per-batch
pair emission) are not — a replayed batch id would double its
contribution. The fix is a high-water mark embedded INSIDE the swapped
table directory: the rename that publishes the data publishes the
watermark in the same atomic step, so "data applied" and "batch
recorded" can never diverge, and a replayed id ≤ watermark is skipped.
Batch ids from one streaming query are monotone, so a single integer
suffices. Spark's parquet reader ignores underscore-prefixed files
(the _SUCCESS convention), so the marker rides along invisibly."""

from __future__ import annotations

import os

MARKER = "_applied_upto"


def applied_upto(table_path: str) -> int:
    """Highest batch id already folded into the table at ``table_path``
    (-1 when the table does not exist yet or carries no marker)."""
    marker = os.path.join(table_path, MARKER)
    if os.path.isfile(marker):
        with open(marker) as f:
            return int(f.read().strip())
    return -1


def write_marker(table_dir: str, batch_id: int) -> None:
    """Stamp a (scratch) table directory with the batch id it includes —
    call BEFORE the rename swap so the publish is atomic."""
    with open(os.path.join(table_dir, MARKER), "w") as f:
        f.write(str(batch_id))
