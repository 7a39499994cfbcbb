"""Change-data-capture merge (MERGE INTO semantics) as a pure
DataFrame plan.

``apply_changes`` applies a changes feed — one row per key with an op
column in {'U','D','I'} and a full-row payload — onto a target table:

* ``U`` rows replace the target row for that key,
* ``D`` rows delete it,
* ``I`` rows are appended,
* keys absent from the feed pass through unchanged.

Scale shape: ONE full-outer shuffle join on the merge key (both sides
hash-partitioned; AQE coalesces post-shuffle partitions). No windows, no
driver-side state; at 100 TB the cost is the same as any co-partitioned
equi-join, and a bucketed target (loader.save_bucketed) makes the
target-side exchange vanish entirely.

Parity surface: the reference's warehouse load path only supports
replace/append (reference etl_pipeline.py:316-334); MERGE is the [EXT]
upsert generalization a production warehouse needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
) -> DataFrame:
    """Merge a changes feed into ``target``; returns the post-merge table
    with exactly the target's columns.

    ``changes`` must carry ``key``, ``op_col``, and every target column
    (payload ignored for deletes). One change row per key.
    """
    payload = [c for c in target.columns if c != key]
    t = target.alias("t")
    c = changes.alias("c")
    merged = t.join(c, on=F.col(f"t.{key}") == F.col(f"c.{key}"), how="full_outer")
    op = F.col(f"c.{op_col}")
    return (
        merged.filter(op.isNull() | (op != F.lit("D")))
        .select(
            F.coalesce(F.col(f"t.{key}"), F.col(f"c.{key}")).alias(key),
            *[
                F.when(op.isNotNull(), F.col(f"c.{col}"))
                .otherwise(F.col(f"t.{col}"))
                .alias(col)
                for col in payload
            ],
        )
    )
