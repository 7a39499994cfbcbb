"""Warehouse writers.

The reference loads every table into SQLite via row-wise INSERTs
(reference etl_pipeline.py:234-236). Here the warehouse is a parquet
directory tree (columnar, splittable, predicate-pushdown-friendly) with
the same replace/append semantics; at cluster scale the identical calls
target a real catalog via ``saveAsTable`` or a JDBC sink.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MODES = {"replace": "overwrite", "append": "append"}


class WarehouseLoader:
    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        os.makedirs(warehouse_dir, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.warehouse_dir, table)

    def load(
        self,
        df: DataFrame,
        table: str,
        if_exists: str = "append",
        partition_by: list[str] | None = None,
        fmt: str = "parquet",
    ) -> None:
        """Distributed write; ``partition_by`` produces a hive layout so
        downstream reads get partition pruning (e.g. fact_sales by month).
        ``fmt`` selects the storage format — parquet (default) or orc,
        both columnar with predicate pushdown and stats-based skipping;
        orc interops with Hive-era warehouses.
        """
        writer = df.write.mode(_MODES[if_exists])
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.format(fmt).save(self._path(table))

    def save_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        num_buckets: int = 16,
        sort_cols: list[str] | None = None,
    ) -> None:
        """Catalog-managed bucketed table: rows are hash-clustered into
        ``num_buckets`` files per partition on ``bucket_cols``. Two tables
        bucketed the same way join WITHOUT a shuffle (each bucket pair
        joins independently) — pre-paying the exchange once at write time
        for facts that are joined repeatedly on the same key. Requires
        ``saveAsTable`` (bucket metadata lives in the catalog, not the
        parquet files)."""
        # idempotent replace: a previous session's managed-table directory
        # survives in the warehouse dir even when the (in-memory) catalog
        # forgot the table, and saveAsTable then refuses the location
        self.spark.sql(f"DROP TABLE IF EXISTS {table}")
        warehouse = self.spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        stale = os.path.join(warehouse, table.lower())
        if os.path.isdir(stale):
            import shutil

            shutil.rmtree(stale)
        writer = (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(num_buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(table)

    def write_range_clustered(
        self,
        df: DataFrame,
        table: str,
        cluster_cols: list[str],
        target_files: int,
    ) -> None:
        """Z-order-lite layout: range-partition on the cluster key so each
        output file owns a disjoint key range, then sort within files so
        parquet row-group min/max stats are tight. A later scan filtered
        on the cluster key skips whole files/row-groups via footer stats —
        at 100 TB this is the difference between reading one file and
        reading the table (hot filter columns: dates, tenant ids).
        ``repartitionByRange`` samples the key distribution, so skew
        produces balanced files, unlike hash-bucketing on a skewed key.
        """
        (
            df.repartitionByRange(target_files, *cluster_cols)
            .sortWithinPartitions(*cluster_cols)
            .write.mode("overwrite")
            .parquet(self._path(table))
        )

    def write_zorder_clustered(
        self,
        df: DataFrame,
        table: str,
        col_a,
        col_b,
        target_files: int,
    ) -> None:
        """Two-column data-skipping layout: range-partition + sort on the
        Z-value of (col_a, col_b) (operators/partitioning.zorder_value),
        so every file's parquet footer stats are tight on BOTH columns —
        a scan filtered on either (or both) skips most files. The
        single-column alternative (write_range_clustered) is strictly
        better for one hot filter column; Z-order is for the two-hot-
        filter-column tables (tenant × date, key × time).

        Each column is first quantized to the full 16-bit range over its
        observed min/max (one cheap agg pass) — interleaving RAW values
        of different magnitudes lets the wider column's high bits
        dominate every split and the narrow column degenerates to a
        linear sort (measured: 0.97 normalized file span vs <0.5
        quantized). Delta/Iceberg's OPTIMIZE ZORDER does the same via
        per-column range ids."""
        from etl_pipeline_orchestration_spark.operators.partitioning import (
            zorder_value,
        )

        mn_a, mx_a, mn_b, mx_b = df.agg(
            F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
        ).head()

        def quant(col, mn, mx):
            span = max(int(mx) - int(mn), 1)
            return F.floor(
                (col - F.lit(int(mn))).cast("double") * 65535.0 / span
            ).cast("long")

        z = zorder_value(quant(col_a, mn_a, mx_a), quant(col_b, mn_b, mx_b))
        (
            df.withColumn("__z__", z)
            .repartitionByRange(target_files, "__z__")
            .sortWithinPartitions("__z__")
            .drop("__z__")
            .write.mode("overwrite")
            .parquet(self._path(table))
        )

    def compact(
        self,
        table: str,
        target_files: int,
        partition_by: list[str] | None = None,
    ) -> None:
        """Rewrite a table to ``target_files`` parquet files. Streaming
        appends and fine-grained partition writes accumulate small files
        that tax the file index and starve scan vectorization; periodic
        compaction is standard warehouse hygiene. Writes to a scratch
        path first (Spark cannot overwrite a path it is lazily reading),
        then swaps via rename-aside — rename old out, rename new in,
        delete old last — so no crash point LOSES data: a crash between
        the two renames leaves the table path briefly absent (data safe
        in ``__compact_old_<table>``), and the recovery preamble below
        rolls that aside directory back on the next call, so the window
        self-heals (the original rmtree-then-rename order could lose
        the table outright; same fix as streaming/upsert.py).

        ``partition_by``: for hive-layout tables, pass the partition
        columns so compaction PRESERVES the layout — the rewrite
        shuffles on the partition key (``target_files`` files per
        partition via repartition on key + a salt bucket) and writes
        ``partitionBy`` again; a plain repartition would flatten the
        directory structure and silently destroy downstream partition
        pruning (OPTIMIZE in table formats is per-partition for the
        same reason)."""
        import shutil

        src = self._path(table)
        tmp = self._path(f"__compact_{table}")
        old = self._path(f"__compact_old_{table}")
        # Recovery: a prior compact() crashed between its two renames —
        # the data lives only in the aside path; restore it first.
        if not os.path.exists(src) and os.path.exists(old):
            os.rename(old, src)
        df = self.spark.read.parquet(src)
        if partition_by:
            bucket = F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]),
                F.lit(max(target_files, 1)),
            )
            writer = (
                df.repartition(*[F.col(c) for c in partition_by], bucket)
                .write.mode("overwrite")
                .partitionBy(*partition_by)
            )
        else:
            writer = df.repartition(target_files).write.mode("overwrite")
        writer.parquet(tmp)
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(src, old)
        os.rename(tmp, src)
        shutil.rmtree(old)

    def load_sqlite(
        self,
        df: DataFrame,
        table: str,
        db_path: str,
        if_exists: str = "append",
    ) -> int:
        """SQLite-compat sink — byte-for-byte parity with the reference's
        warehouse (reference etl_pipeline.py:234-236 loads via pandas
        ``to_sql``). SQLite is single-writer, so this is a driver-side
        bridge for reference-sized loads (~5k rows/run) and dims ONLY;
        the distributed warehouse path is ``load`` (parquet) or a
        partitioned JDBC sink against a server database. Returns rows
        written."""
        import sqlite3

        pdf = df.toPandas()
        with sqlite3.connect(db_path) as conn:
            pdf.to_sql(
                table,
                conn,
                if_exists={"replace": "replace", "append": "append"}[if_exists],
                index=False,
            )
        return len(pdf)

    def read(
        self, table: str, fmt: str = "parquet", merge_schema: bool = False
    ) -> DataFrame:
        """``merge_schema=True`` is the schema-evolution read: a table
        whose appends ADDED columns over time unions all file footers'
        schemas (old rows null-fill the new columns — the parquet/ORC
        evolution contract). Without it Spark reads one file's footer,
        so whether a post-evolution column appears depends on WHICH
        file wins — nondeterministic at cluster scale. Incompatible
        evolution (same column, conflicting types) fails the merged
        read loudly rather than silently coercing — pinned by
        tests/test_schema_evolution.py. Off by default: footer-merge
        lists every file's schema, a real cost at 100 TB — flip it per
        read, or maintain evolved tables as SnapshotTable rewrites."""
        if fmt == "avro":
            # Route through the probing reader: JVM spark-avro when the
            # module is present, the pure-python OCF fallback otherwise.
            from etl_pipeline_orchestration_spark.sources.avro_io import (
                read_avro,
            )

            return read_avro(self.spark, self._path(table))
        reader = self.spark.read.format(fmt)
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.load(self._path(table))

    def table_count(self, table: str) -> int:
        """Row-count read-back (reference etl_pipeline.py:238-242); missing
        table → 0, matching the reference's lenient probe."""
        try:
            return self.read(table).count()
        except Exception:
            return 0


class SnapshotConflict(RuntimeError):
    """A CAS publish lost the race: the table's current version moved
    past ``expect_version`` between read and flip. The staged version
    directory is left orphaned (self-healing: skipped by the next
    claim, reclaimed by prune); the caller re-reads and recomputes."""


class SnapshotTable:
    """Versioned snapshot table: immutable version directories plus an
    atomically-updated CURRENT pointer — the minimal transactional
    layer a parquet warehouse needs for safe concurrent readers.

    The overwrite/swap writers above have a correctness gap at scale:
    replacing a table deletes the old files while an in-flight reader
    (a long analytics job, the correctness driver mid-collect) may
    still hold them in its plan — on a real cluster that reader dies
    with FileNotFound mid-stage. Snapshots close the gap the way every
    transactional table format does:

    * each write lands in a fresh ``v=N`` directory — existing readers'
      file listings are never disturbed (immutability, not locking);
    * ``_CURRENT`` flips via ``os.replace`` (atomic on POSIX — the
      pointer is never absent, never partial); a crash BEFORE the flip
      leaves an orphaned version directory that the next write simply
      supersedes — readers never observe it;
    * old versions stay readable by number (time travel: reproduce
      yesterday's training set, diff two corpus snapshots, audit a
      regression) until ``prune`` removes them, and pruning refuses to
      drop the current version.

    On a cluster the same calls target Delta/Iceberg; the reader/writer
    contract — readers resolve a version once, then read immutable
    files — is identical. Scale shape: the pointer is O(1) metadata;
    writes cost exactly one parquet write of the data; no rename of
    data files ever happens (renames are metadata-only moves of the
    version directory root — none after the initial write)."""

    def __init__(self, loader: WarehouseLoader, table: str):
        self.loader = loader
        self.root = loader._path(f"{table}__snaps")
        os.makedirs(self.root, exist_ok=True)

    def _pointer(self) -> str:
        return os.path.join(self.root, "_CURRENT")

    def current_version(self) -> int | None:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None

    def versions(self) -> list[int]:
        return sorted(
            int(d[2:]) for d in os.listdir(self.root) if d.startswith("v=")
        )

    def _vdir(self, version: int) -> str:
        return os.path.join(self.root, f"v={version}")

    def write(
        self,
        df: DataFrame,
        marker: tuple[str, int] | None = None,
        prepare=None,
        expect_version: int | None | type(...) = ...,
    ) -> int:
        """Publish a new snapshot; returns its version number. The data
        write completes fully before the pointer flips, so a crash at
        any point leaves the previous version current and intact.

        ``expect_version`` (optimistic concurrency): when given, the
        pointer only flips if the CURRENT version still equals it at
        flip time — two writers that both read version N and race their
        merges cannot both win; the loser raises SnapshotConflict with
        its staged directory left as a harmless orphan (the next claim
        skips past it) and must re-read + recompute (``merge_publish``
        wraps that loop). The check-and-flip pair holds a short
        lockfile so the compare and the ``os.replace`` are one atomic
        step; the lock is NEVER held across the data write. Version
        directories themselves are claimed with an atomic ``mkdir``, so
        concurrent writers stage under distinct numbers instead of
        overwriting each other's uploads — the unconditional-writer
        race that existed before this parameter.

        ``marker`` = (checkpoint app id, batch id) stamps the version
        with an applied-batch watermark (streaming/watermark.py) INSIDE
        the version directory before the pointer flips — the publish is
        atomic for data + watermark together, which is what
        non-idempotent streaming sinks need for exactly-once replay
        (see streaming/corpus_stats_stream.py). When ``marker`` is None
        the CURRENT version's watermark carries forward — a maintenance
        write (compaction, repartition) must not reset the stream's
        replay protection.

        ``prepare(version_dir)``, when given, runs after the data write
        and BEFORE the pointer flip — the hook for sidecar artifacts
        (schema notes, stats files) that must publish atomically with
        the data. NOTE: sidecars do not carry forward on maintenance
        writes the way the watermark does — state the publisher depends
        on belongs in the snapshot's DATA (the IVF stream versions its
        centroid matrix as rows for exactly this reason)."""
        from etl_pipeline_orchestration_spark.streaming.watermark import (
            read_marker,
            write_marker,
        )

        cur = self.current_version()
        if marker is None and cur is not None:
            marker = read_marker(self._vdir(cur))
        nxt, vdir = self._claim_version(cur)
        # APPEND into the freshly-claimed (empty) directory: overwrite
        # mode would DELETE the path at job start and recreate it,
        # reopening the claim race the mkdir exists to close (a
        # concurrent _claim_version listing during that window sees the
        # number free and both writers stage into it).
        df.write.mode("append").parquet(vdir)
        if marker is not None:
            write_marker(vdir, marker[0], marker[1])
        if prepare is not None:
            prepare(vdir)
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(nxt))
        # EVERY flip holds the lock: a plain write's unguarded replace
        # landing between a CAS writer's compare and ITS replace would
        # be silently overwritten — the precise lost update the CAS
        # parameter exists to prevent. The lock wraps pointer metadata
        # only, never the data write.
        with self._flip_lock():
            if expect_version is not ... and self.current_version() != expect_version:
                os.remove(tmp)
                raise SnapshotConflict(
                    f"{self.root}: expected current version "
                    f"{expect_version}, found {self.current_version()} "
                    f"(staged v={nxt} left orphaned)"
                )
            os.replace(tmp, self._pointer())
        return nxt

    def _claim_version(self, cur: int | None) -> tuple[int, str]:
        """Claim a fresh version directory with atomic ``mkdir`` —
        concurrent writers get DISTINCT numbers instead of both staging
        into the same ``v=N``. Orphans from crashed or conflicted
        writes are skipped past (they are in ``versions()``) and
        reclaimed by ``prune``."""
        nxt = max(self.versions() + [cur if cur is not None else -1]) + 1
        while True:
            try:
                vdir = self._vdir(nxt)
                os.mkdir(vdir)
                return nxt, vdir
            except FileExistsError:
                nxt += 1

    def _flip_lock(self):
        """Advisory ``flock`` making (compare, flip) atomic across
        writers. flock has no staleness problem at all — the kernel
        releases it when the holding process dies, so there is no
        mtime-based lock breaking and therefore no check-then-remove
        TOCTOU (the create/EXCL + break-if-stale pattern lets a waiter
        delete a FRESHLY acquired lock and admit two writers). The
        lock file itself is permanent metadata; only the flock on its
        fd matters. Held only around pointer metadata — never the data
        write."""
        import contextlib
        import fcntl
        import time

        path = os.path.join(self.root, "_FLIP_LOCK")

        @contextlib.contextmanager
        def lock():
            fd = os.open(path, os.O_CREAT | os.O_WRONLY, 0o644)
            deadline = time.monotonic() + 30.0
            try:
                while True:
                    try:
                        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                        break
                    except BlockingIOError:
                        if time.monotonic() > deadline:
                            raise TimeoutError(f"flip lock stuck: {path}")
                        time.sleep(0.02)
                yield
            finally:
                os.close(fd)  # releases the flock

        return lock()

    def merge_publish(self, fn, marker=None, prepare=None, retries: int = 5) -> int:
        """Optimistic read-merge-publish loop: ``fn(current_df_or_None)
        -> DataFrame`` recomputes from the version observed at loop
        entry; a SnapshotConflict (someone else published first) means
        re-read and recompute, never blind overwrite — the lost-update
        protection a multi-writer table needs."""
        for _ in range(retries):
            base = self.current_version()
            df = fn(self.read(base) if base is not None else None)
            try:
                return self.write(
                    df, marker=marker, prepare=prepare, expect_version=base
                )
            except SnapshotConflict:
                continue
        raise SnapshotConflict(
            f"{self.root}: lost the publish race {retries} times"
        )

    def applied_upto(self, app_id: str) -> int:
        """Watermark of the CURRENT version (-1 when no snapshot or no
        marker) — replayed streaming batch ids at or below this were
        fully published and must be skipped. Raises when the table was
        built under a different checkpoint (see watermark.py)."""
        from etl_pipeline_orchestration_spark.streaming.watermark import (
            applied_upto,
        )

        cur = self.current_version()
        if cur is None:
            return -1
        return applied_upto(self._vdir(cur), app_id)

    def read(self, version: int | None = None) -> DataFrame:
        """Read a snapshot (CURRENT when ``version`` is None). The
        returned plan references one immutable directory — later writes
        and prunes of OTHER versions cannot disturb it."""
        v = self.current_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshot published under {self.root}")
        vdir = os.path.join(self.root, f"v={v}")
        if not os.path.isdir(vdir):
            raise FileNotFoundError(f"snapshot v={v} does not exist")
        return self.loader.spark.read.parquet(vdir)

    def prune(self, keep: int = 2) -> list[int]:
        """Drop all but the newest ``keep`` versions; never drops the
        current pointer's target. Returns the dropped version numbers."""
        import shutil

        cur = self.current_version()
        vs = self.versions()
        drop = [v for v in vs[:-keep] if v != cur] if keep > 0 else []
        for v in drop:
            shutil.rmtree(os.path.join(self.root, f"v={v}"))
        return drop
