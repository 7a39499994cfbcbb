"""Subject erasure with history vacuum (governance.py): rows gone from
current AND history, audit carries only a hash, no-match is an audited
no-op, and a broken predicate refuses to vacuum."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.governance import (
    ErasureVerificationError,
    erase_subject,
)
from etl_pipeline_orchestration_spark.loader import (
    SnapshotTable,
    WarehouseLoader,
)
from etl_pipeline_orchestration_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _snaps(spark, tmp_path, versions=2):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "cust")
    cust = load_table(spark, SF, "customer")
    for i in range(versions):
        snaps.write(cust.filter(F.col("c_custkey") <= 1000000 + i))
    return loader, snaps


def test_erasure_removes_subject_from_current_and_history(spark, tmp_path):
    loader, snaps = _snaps(spark, tmp_path)
    audit = SnapshotTable(loader, "erasure_audit")
    subject = snaps.read().select("c_custkey").limit(1).collect()[0][0]
    n_before = snaps.read().count()
    n_subject = snaps.read().filter(F.col("c_custkey") == subject).count()
    assert n_subject > 0 and len(snaps.versions()) == 2

    record = erase_subject(
        snaps, F.col("c_custkey") == subject, str(subject), audit
    )
    assert record["rows_removed"] == n_subject
    assert record["versions_vacuumed"] == 2  # both pre-erasure versions
    # current: gone; history: only the erased version remains
    assert snaps.read().filter(F.col("c_custkey") == subject).count() == 0
    assert snaps.read().count() == n_before - n_subject
    assert snaps.versions() == [record["published_version"]]
    # audit stores a hash, never the key
    arow = audit.read().collect()[0]
    assert arow["subject_hash"] != subject
    assert arow["rows_removed"] == n_subject
    assert "subject_key" not in audit.read().columns


def test_no_match_is_an_audited_noop(spark, tmp_path):
    loader, snaps = _snaps(spark, tmp_path)
    audit = SnapshotTable(loader, "erasure_audit")
    before_versions = snaps.versions()
    record = erase_subject(
        snaps, F.col("c_custkey") == -424242, "-424242", audit
    )
    assert record["rows_removed"] == 0
    assert record["versions_vacuumed"] == 0
    assert snaps.versions() == before_versions  # no new version published
    assert audit.read().count() == 1  # the request is still on record


def test_broken_predicate_refuses_to_vacuum(spark, tmp_path, monkeypatch):
    """If verification still finds subject rows after the publish, the
    op must raise BEFORE pruning history."""
    loader, snaps = _snaps(spark, tmp_path)
    subject = snaps.read().select("c_custkey").limit(1).collect()[0][0]

    import etl_pipeline_orchestration_spark.governance as gov

    real_merge = SnapshotTable.merge_publish

    def sabotaged(self, fn, **kw):
        # publish a version that silently kept the subject rows
        return real_merge(self, lambda cur: cur, **kw)

    monkeypatch.setattr(SnapshotTable, "merge_publish", sabotaged)
    with pytest.raises(ErasureVerificationError):
        gov.erase_subject(snaps, F.col("c_custkey") == subject, str(subject))
    # history intact: nothing was vacuumed
    assert len(snaps.versions()) == 3  # 2 originals + sabotaged publish


def test_erasure_survives_concurrent_append(spark, tmp_path):
    """A writer that appends BETWEEN the erasure's read and publish
    loses the optimistic race; the erasure re-reads and the erased rows
    cannot resurrect."""
    loader, snaps = _snaps(spark, tmp_path, versions=1)
    subject = snaps.read().select("c_custkey").limit(1).collect()[0][0]

    # simulate the interleaving: another writer publishes right before
    # the erasure's first publish attempt by wrapping write()
    real_write = SnapshotTable.write
    raced = {"done": False}

    def racing_write(self, df, **kw):
        if not raced["done"] and kw.get("expect_version") is not None:
            raced["done"] = True
            extra = snaps.read().limit(0)  # schema-compatible no-op row set
            real_write(self, snaps.read().unionByName(extra))
        return real_write(self, df, **kw)

    import unittest.mock as mock

    with mock.patch.object(SnapshotTable, "write", racing_write):
        record = erase_subject(
            snaps, F.col("c_custkey") == subject, str(subject)
        )
    assert record["rows_removed"] > 0
    assert snaps.read().filter(F.col("c_custkey") == subject).count() == 0
