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


def test_cas_publish_refuses_lost_update(spark, snaps):
    """Two writers read version 0 and race: the second flip must refuse
    (SnapshotConflict), leaving the winner's data current and the
    loser's staged directory a harmless orphan."""
    from etl_pipeline_orchestration_spark.loader import SnapshotConflict

    snaps.write(spark.range(10))
    base = snaps.current_version()
    # writer A wins
    va = snaps.write(spark.range(11), expect_version=base)
    assert snaps.current_version() == va
    # writer B staged against the same base: must lose, not overwrite
    with pytest.raises(SnapshotConflict):
        snaps.write(spark.range(99), expect_version=base)
    assert snaps.current_version() == va
    assert snaps.read().count() == 11
    # the loser's orphan is skipped by the next claim
    v_next = snaps.write(spark.range(12))
    assert v_next > va and snaps.read().count() == 12


def test_concurrent_claims_get_distinct_versions(spark, snaps):
    """Version directories are claimed with atomic mkdir: two in-flight
    writers stage under DISTINCT numbers instead of overwriting each
    other's upload."""
    snaps.write(spark.range(3))
    cur = snaps.current_version()
    n1, d1 = snaps._claim_version(cur)
    n2, d2 = snaps._claim_version(cur)
    assert n1 != n2 and d1 != d2
    assert os.path.isdir(d1) and os.path.isdir(d2)


def test_merge_publish_retries_and_merges_both_increments(spark, snaps):
    """The read-merge-publish loop: a competing publish between read
    and flip forces a retry that recomputes from the NEW current —
    both writers' effects land (no lost update)."""
    snaps.write(spark.range(5))
    interfered = {"done": False}

    def add_one_row(cur_df):
        n = cur_df.count()
        if not interfered["done"]:
            interfered["done"] = True
            # competitor publishes first, invalidating our base read
            snaps.write(spark.range(n + 100))
        return spark.range(snaps.read().count() + 1)

    snaps.merge_publish(add_one_row)
    assert snaps.read().count() == 106  # 105 from competitor, +1 merged


def test_leftover_lock_file_does_not_wedge(spark, snaps):
    """The flip lock is an flock, not file existence: a lock FILE left
    behind by a killed process holds no kernel lock, so the next
    writer acquires immediately — no staleness protocol, no TOCTOU."""
    snaps.write(spark.range(2))
    lock_path = os.path.join(snaps.root, "_FLIP_LOCK")
    open(lock_path, "w").close()  # simulate a killed process's leftover
    v = snaps.write(spark.range(4), expect_version=snaps.current_version())
    assert snaps.current_version() == v


def test_held_flock_blocks_cas_flip(spark, snaps):
    """A LIVE flock (another writer mid-flip) must block the CAS flip
    until released — proven by timing out a flip attempted while this
    process holds the lock from another fd."""
    import fcntl
    import threading

    snaps.write(spark.range(2))
    lock_path = os.path.join(snaps.root, "_FLIP_LOCK")
    fd = os.open(lock_path, os.O_CREAT | os.O_WRONLY)
    fcntl.flock(fd, fcntl.LOCK_EX)
    state = {}

    def attempt():
        with snaps._flip_lock():
            state["entered"] = True

    t = threading.Thread(target=attempt, daemon=True)
    t.start()
    t.join(timeout=0.5)
    assert "entered" not in state  # blocked while held
    os.close(fd)  # release
    t.join(timeout=10)
    assert state.get("entered") is True
