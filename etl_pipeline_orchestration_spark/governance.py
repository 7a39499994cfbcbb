"""Data-governance maintenance over snapshot tables: subject erasure
(right-to-be-forgotten) with history vacuum and a PII-free audit trail.

Extends the reference's data-quality layer
(/root/reference/etl_pipeline.py:248-351 tracks per-source health) to
the compliance operation a real warehouse must support: remove every
row belonging to a data subject, INCLUDING from time-travel history —
retention-for-reproducibility and erasure-on-request are directly in
conflict, and erasure wins by law. The op therefore:

1. publishes a new snapshot version without the subject's rows through
   ``merge_publish`` (optimistic concurrency: a racing writer's
   publish triggers re-read + re-filter, never a lost update — the
   erased rows cannot resurrect through a concurrent append);
2. VERIFIES the new current version contains zero matching rows before
   touching history (fail loudly rather than vacuum on top of a bad
   filter);
3. prunes EVERY older version (``keep=1``) — time travel across the
   erasure boundary is deliberately destroyed; readers that resolved a
   version before the prune finish their scan on POSIX (open files),
   new readers only see the erased current;
4. appends an audit record carrying ``xxhash64`` of the subject key —
   never the key itself (an erasure log that stores the identifier
   would re-create the PII it certifies the removal of), plus rows
   removed and the published version.

A no-match request publishes NO new version (idempotent) but is still
audited — compliance wants the request trail either way.

Scale shape: one filtered rewrite of the current version (the same
cost as any snapshot publish), O(1) pointer flip, O(versions) metadata
prune. On a cluster the same sequence is a Delta/Iceberg
DELETE + VACUUM + audit append.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable

AUDIT_SCHEMA = (
    "subject_hash bigint, rows_removed bigint, published_version bigint,"
    " versions_vacuumed int"
)


class ErasureVerificationError(RuntimeError):
    """The post-publish verification still found subject rows —
    history vacuum refused."""


def erase_subject(
    snaps: SnapshotTable,
    predicate: Column,
    subject_key: str,
    audit_snaps: SnapshotTable | None = None,
) -> dict:
    """Erase every row matching ``predicate`` from ``snaps`` and its
    history. ``subject_key`` is the identifier for the audit trail —
    stored ONLY as its xxhash64. Returns the audit record as a dict."""
    spark = snaps.loader.spark
    removed = {"n": 0}

    def fn(cur: DataFrame | None) -> DataFrame:
        if cur is None:
            raise ValueError(f"{snaps.root}: no snapshot to erase from")
        removed["n"] = cur.filter(predicate).count()
        return cur.filter(~predicate)

    base = snaps.current_version()
    if base is None:
        raise ValueError(f"{snaps.root}: no snapshot to erase from")
    if snaps.read(base).filter(predicate).count() == 0:
        record = _audit(spark, subject_key, 0, base, 0, audit_snaps)
        return record

    version = snaps.merge_publish(fn)
    # verify BEFORE vacuuming history: a broken predicate must not
    # destroy the only versions that still hold the evidence
    leftover = snaps.read(version).filter(predicate).count()
    if leftover:
        raise ErasureVerificationError(
            f"{snaps.root}: v={version} still holds {leftover} subject "
            "rows after erasure; history left intact"
        )
    vacuumed = snaps.prune(keep=1)
    return _audit(
        spark, subject_key, removed["n"], version, len(vacuumed), audit_snaps
    )


def _audit(
    spark, subject_key: str, rows_removed: int, version: int,
    versions_vacuumed: int, audit_snaps: SnapshotTable | None,
) -> dict:
    subject_hash = spark.range(1).select(
        F.xxhash64(F.lit(subject_key)).alias("h")
    ).collect()[0]["h"]
    record = {
        "subject_hash": int(subject_hash),
        "rows_removed": int(rows_removed),
        "published_version": int(version),
        "versions_vacuumed": int(versions_vacuumed),
    }
    if audit_snaps is not None:
        row = spark.createDataFrame(
            [tuple(record.values())], AUDIT_SCHEMA
        )
        cur = (
            audit_snaps.read()
            if audit_snaps.current_version() is not None
            else None
        )
        audit_snaps.write(row if cur is None else cur.unionByName(row))
    return record
