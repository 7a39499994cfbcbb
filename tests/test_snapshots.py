"""SnapshotTable: time travel, pointer atomicity, reader isolation,
crash orphans, retention."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader


@pytest.fixture()
def snaps(spark, tmp_path):
    return SnapshotTable(WarehouseLoader(spark, str(tmp_path)), "orders")


def test_time_travel_reads_each_version(spark, snaps):
    v0 = snaps.write(spark.range(3).withColumn("tag", F.lit("a")))
    v1 = snaps.write(spark.range(5).withColumn("tag", F.lit("b")))
    assert (v0, v1) == (0, 1) and snaps.current_version() == 1
    assert snaps.read().count() == 5
    assert snaps.read(version=0).count() == 3
    assert {r["tag"] for r in snaps.read(version=0).collect()} == {"a"}


def test_reader_isolated_from_later_writes_and_prunes(spark, snaps):
    snaps.write(spark.range(10))
    old_reader = snaps.read()  # plan resolved against v=0
    for i in range(3):
        snaps.write(spark.range(100 + i))
    snaps.prune(keep=2)
    # v=0 was pruned; the old reader's plan listed its files already —
    # on this filesystem the directory is gone, so re-reading by
    # version must fail loudly, while CURRENT serves the newest data.
    assert snaps.read().count() == 102
    with pytest.raises(FileNotFoundError):
        snaps.read(version=0)
    del old_reader


def test_crash_orphan_is_invisible_and_superseded(spark, snaps):
    snaps.write(spark.range(4))
    # Simulate a writer that crashed after the data write, before the
    # pointer flip: an orphaned v=1 directory exists, pointer still 0.
    spark.range(99).write.parquet(os.path.join(snaps.root, "v=1"))
    assert snaps.current_version() == 0
    assert snaps.read().count() == 4  # readers never observe the orphan
    v = snaps.write(spark.range(7))  # next write supersedes, no clash
    assert v == 2 and snaps.read().count() == 7


def test_prune_never_drops_current(spark, snaps):
    for i in range(4):
        snaps.write(spark.range(i + 1))
    dropped = snaps.prune(keep=1)
    assert 3 not in dropped and snaps.read().count() == 4
    assert snaps.versions() == [3]
