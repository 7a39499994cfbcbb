"""Bloom-filter data-skipping sidecar: point lookups on a
NON-partition column that read only the partitions that may contain
the key.

Partition pruning is free when the filter hits the partition column;
the classic 100 TB pain is the other lookup — find one user in a table
laid out by date. Transactional formats solve it with file-level bloom
indexes (Delta's bloom filter index, Iceberg/Parquet bloom filters);
this module is that feature for the snapshot warehouse:

* ``build``: one distributed pass — every key explodes to its
  ``n_hashes`` bit positions (``xxhash64(key, seed=i) pmod m_bits``,
  JVM-side), distinct (partition, bit), then one Arrow-batched
  ``applyInPandas`` per partition packs the positions into an m-bit
  numpy bitmap. The sidecar is tiny (n_partitions x m_bits/8 bytes)
  and publishes ATOMICALLY with nothing to keep consistent besides
  itself — it lives in its own SnapshotTable version, stamped with the
  indexed table's fingerprint so a stale sidecar REFUSES to prune
  (fail-safe: bloom false negatives are the one unforgivable error).
* ``lookup``: reads the (small) sidecar, recomputes the probe key's
  bit positions with the SAME JVM xxhash64 (a 1-row Spark job — never
  a Python reimplementation that could drift), prunes the partition
  list driver-side (metadata-scale, like any format's stats pruning),
  and scans ONLY candidate partitions via a partition-column isin
  filter the parquet source turns into PartitionFilters. A final
  ``key == probe`` filter removes bloom false positives; false
  negatives cannot occur (every indexed key set every one of its
  bits).

Scale shape: build is a narrow map + one distinct shuffle on
(partition, bit) — bounded by distinct keys x n_hashes — plus a tiny
grouped pack; lookup is sidecar-read (KBs) + a pruned scan. The
false-positive rate is the textbook (1 - e^{-kn/m})^k; the default
2^15 bits / 5 hashes holds ~2% at 3k distinct keys per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader

DEFAULT_M_BITS = 1 << 15
DEFAULT_N_HASHES = 5


def _bit_positions(key_col: F.Column, m_bits: int, n_hashes: int) -> F.Column:
    """Array of ``n_hashes`` bit positions for a key — xxhash64 with
    distinct seeds, pmod to the bitmap width. JVM-side on build AND
    probe, so the two can never drift. The key is canonicalized
    through a string cast first: xxhash64 hashes INT and BIGINT
    differently, so a Python probe literal (int -> IntegerType) would
    otherwise probe different bits than the table's bigint column set
    (observed: zero candidates for every present key)."""
    canon = key_col.cast("string")
    return F.array(
        *[
            F.pmod(F.xxhash64(canon, F.lit(i)), F.lit(m_bits))
            for i in range(n_hashes)
        ]
    )


def _pack_bitmap(m_bits: int):
    import numpy as np
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        pos = pdf["bit"].to_numpy()
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return pd.DataFrame(
            {"part": [pdf["part"].iloc[0]], "bloom": [bits.tobytes()]}
        )

    return pack


def table_fingerprint(df: DataFrame, key_col: str, part_col: str) -> int:
    """Order-independent fingerprint of the indexed (partition, key)
    content — the sidecar stores it and lookup refuses to prune when
    the table has drifted (a stale bloom could yield false negatives).

    ADDITIVE by construction (a sum of per-row hashes reduced mod
    2^61), so maintenance can update it incrementally:
    ``fingerprint(old ∪ batch) = fp_add(fp_old, fingerprint(batch))``.
    The sum runs in DECIMAL(38,0) — an int64 sum of xxhash64 values
    overflows after two rows and THROWS under the driver's ANSI
    session; decimal carries ~1e12 rows x |hash| and the modular
    reduction happens driver-side in Python ints."""
    row = df.select(
        F.sum(
            F.xxhash64(F.col(part_col).cast("string"), F.col(key_col)).cast(
                "decimal(38,0)"
            )
        ).alias("fp")
    ).head()
    return int(row["fp"] or 0) % FP_MOD


#: Modulus for the additive fingerprint (fits int64 storage).
FP_MOD = 1 << 61


def fp_add(a: int, b: int) -> int:
    """Combine two additive fingerprints (disjoint row sets)."""
    return (a + b) % FP_MOD


def build(
    loader: WarehouseLoader,
    df: DataFrame,
    index_table: str,
    key_col: str,
    part_col: str,
    m_bits: int = DEFAULT_M_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    marker: tuple[str, int] | None = None,
) -> int:
    """Build/refresh the sidecar; returns the published version."""
    if m_bits % 8 != 0:
        raise ValueError(f"m_bits must be byte-aligned, got {m_bits}")
    _check_key_type(df, key_col)
    pos = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            F.col(part_col).cast("string").alias("part"),
            F.explode(
                _bit_positions(F.col(key_col), m_bits, n_hashes)
            ).alias("bit"),
        )
        .distinct()
    )
    blooms = pos.groupBy("part").applyInPandas(
        _pack_bitmap(m_bits), "part string, bloom binary"
    )
    meta = blooms.withColumns(
        {
            "m_bits": F.lit(m_bits).cast("int"),
            "n_hashes": F.lit(n_hashes).cast("int"),
            "fingerprint": F.lit(
                table_fingerprint(df, key_col, part_col)
            ).cast("bigint"),
        }
    )
    return SnapshotTable(loader, index_table).write(meta, marker=marker)


def _check_key_type(df: DataFrame, key_col: str) -> None:
    """Refuse float/decimal key columns: the build hashes the COLUMN's
    string cast while the probe hashes a PYTHON literal's, and
    1000.00 (decimal) vs 1000.0 (double) stringify differently —
    a silent bloom false negative, the one unforgivable error. Integer,
    string, date, timestamp, and boolean keys stringify canonically on
    both paths."""
    from pyspark.sql import types as T

    dt = df.schema[key_col].dataType
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        raise TypeError(
            f"bloom index key {key_col!r} has type {dt.simpleString()}: "
            "float/decimal string casts differ between column values and "
            "probe literals; cast the key to string or integer yourself"
        )


# Hive partition-path escaping (mirrors Spark's ExternalCatalogUtils
# .escapePathName): these characters are %XX-encoded in partition
# directory names, so a path built from the RAW value would miss the
# directory (':' in timestamps) or be misread as a glob ('[', '*').
_HIVE_ESCAPE = set('"#%\'*/:=?{[]^')


def _escape_hive(value: str) -> str:
    out = []
    for ch in value:
        if ch in _HIVE_ESCAPE or ord(ch) < 0x20:
            out.append("%{:02X}".format(ord(ch)))
        else:
            out.append(ch)
    return "".join(out)


def candidate_partitions(
    spark: SparkSession,
    loader: WarehouseLoader,
    index_table: str,
    probe_key,
    expect_fingerprint: int | None = None,
) -> list[str]:
    """Partitions whose bloom may contain ``probe_key`` (string-cast
    partition values). Raises on a fingerprint mismatch instead of
    returning a possibly-false-negative pruning."""
    if isinstance(probe_key, float):
        raise TypeError(
            "bloom probe keys must not be floats: F.lit(1000.0) casts to "
            "'1000.0' while an integer column value casts to '1000' — a "
            "silent false negative; probe with the column's own type"
        )
    side = SnapshotTable(loader, index_table).read().collect()
    if not side:
        # An empty sidecar means the table was EMPTY at build time
        # (fingerprint 0). Returning [] before the staleness check
        # would bypass the fail-safe for a table that has since gained
        # rows — the silent-false-negative path.
        if expect_fingerprint not in (None, 0):
            raise ValueError(
                f"stale bloom sidecar {index_table}: built on an empty "
                f"table, table fingerprint now {expect_fingerprint}; "
                f"rebuild before pruning"
            )
        return []
    m_bits = side[0]["m_bits"]
    n_hashes = side[0]["n_hashes"]
    if expect_fingerprint is not None:
        stored = side[0]["fingerprint"]
        if stored != expect_fingerprint:
            raise ValueError(
                f"stale bloom sidecar {index_table}: fingerprint {stored} "
                f"!= table {expect_fingerprint}; rebuild before pruning"
            )
    pos_row = (
        spark.range(1)
        .select(_bit_positions(F.lit(probe_key), m_bits, n_hashes).alias("p"))
        .head()
    )
    probes = list(pos_row["p"])
    out = []
    for r in side:
        bits = r["bloom"]
        if all(bits[p >> 3] & (1 << (p & 7)) for p in probes):
            out.append(r["part"])
    return out


def lookup(
    spark: SparkSession,
    loader: WarehouseLoader,
    table: str,
    index_table: str,
    key_col: str,
    part_col: str,
    probe_key,
    expect_fingerprint: int | None = None,
) -> DataFrame:
    """Point lookup through the sidecar: the scan is built from the
    candidate partition DIRECTORIES only (``basePath`` keeps the
    partition column) — the skipping is physical, not an isin filter
    the planner may or may not push, and ``inputFiles()`` provably
    lists only candidate files (the plan-shape test relies on that).
    A final exact filter drops bloom false positives. Partition values
    ride the hive directory names, so this supports the plain
    string-safe values hive layouts use."""
    root = loader._path(table)
    cands = candidate_partitions(
        spark, loader, index_table, probe_key, expect_fingerprint
    )
    if not cands:
        return (
            spark.read.parquet(root).filter(F.lit(False))
        )
    import os

    paths = [
        os.path.join(root, f"{part_col}={_escape_hive(p)}") for p in cands
    ]
    return (
        spark.read.option("basePath", root)
        .parquet(*paths)
        .filter(F.col(key_col) == F.lit(probe_key))
    )


# ---------------------------------------------------------------------------
# Zone maps: the min/max complement to the bloom. Blooms answer point
# membership; zone maps answer RANGE overlap (date windows, id ranges)
# — together they are the two halves of format-level data skipping
# (parquet row-group stats, Delta file stats, ClickHouse minmax
# indexes). Same sidecar discipline: SnapshotTable publish,
# fingerprint-stamped, stale => refuse to prune.
# ---------------------------------------------------------------------------


def build_minmax(
    loader: WarehouseLoader,
    df: DataFrame,
    index_table: str,
    key_col: str,
    part_col: str,
) -> int:
    """Per-partition (min, max, has_null) of ``key_col`` — one
    aggregate pass; the sidecar keeps the key's native type so range
    comparison semantics are the column's own."""
    side = (
        df.groupBy(F.col(part_col).cast("string").alias("part"))
        .agg(
            F.min(key_col).alias("mn"),
            F.max(key_col).alias("mx"),
            F.max(F.col(key_col).isNull().cast("int")).alias("has_null"),
        )
        .withColumn(
            "fingerprint",
            F.lit(table_fingerprint(df, key_col, part_col)).cast("bigint"),
        )
    )
    return SnapshotTable(loader, index_table).write(side)


def range_candidates(
    loader: WarehouseLoader,
    index_table: str,
    lo=None,
    hi=None,
    expect_fingerprint: int | None = None,
) -> list[str]:
    """Partitions whose [mn, mx] overlaps [lo, hi] (either bound may
    be open). An all-NULL partition has mn = mx = NULL and never
    overlaps — correct, since a range predicate excludes NULLs."""
    rows = SnapshotTable(loader, index_table).read().collect()
    if rows and expect_fingerprint is not None:
        stored = rows[0]["fingerprint"]
        if stored != expect_fingerprint:
            raise ValueError(
                f"stale minmax sidecar {index_table}: fingerprint {stored} "
                f"!= table {expect_fingerprint}; rebuild before pruning"
            )
    sample = next((r["mn"] for r in rows if r["mn"] is not None), None)
    lo = _align_bound(lo, sample)
    hi = _align_bound(hi, sample)
    out = []
    for r in rows:
        if r["mn"] is None:
            continue
        if lo is not None and r["mx"] < lo:
            continue
        if hi is not None and r["mn"] > hi:
            continue
        out.append(r["part"])
    return out


def _align_bound(bound, sample):
    """Driver-side stats comparison is strict Python: a DATE probe
    against TIMESTAMP-typed stats (or vice versa) raises TypeError, so
    align the probe to the stored type — midnight widening matches the
    SQL coercion the exact filter applies."""
    import datetime as dt

    if bound is None or sample is None:
        return bound
    is_dt = isinstance(sample, dt.datetime)
    if is_dt and type(bound) is dt.date:
        return dt.datetime.combine(bound, dt.time.min)
    if not is_dt and isinstance(sample, dt.date) and isinstance(bound, dt.datetime):
        return bound.date()
    return bound


def range_scan(
    spark: SparkSession,
    loader: WarehouseLoader,
    table: str,
    index_table: str,
    key_col: str,
    part_col: str,
    lo=None,
    hi=None,
    expect_fingerprint: int | None = None,
) -> DataFrame:
    """Range scan through the zone map: candidate partition
    directories only, then the exact range filter (zone overlap is
    necessary, not sufficient)."""
    import os

    root = loader._path(table)
    cands = range_candidates(loader, index_table, lo, hi, expect_fingerprint)
    if not cands:
        return spark.read.parquet(root).filter(F.lit(False))
    paths = [
        os.path.join(root, f"{part_col}={_escape_hive(p)}") for p in cands
    ]
    out = spark.read.option("basePath", root).parquet(*paths)
    if lo is not None:
        out = out.filter(F.col(key_col) >= F.lit(lo))
    if hi is not None:
        out = out.filter(F.col(key_col) <= F.lit(hi))
    return out


def refresh_partitions(
    loader: WarehouseLoader,
    df: DataFrame,
    index_table: str,
    key_col: str,
    part_col: str,
    parts: list[str],
    fingerprint: int | None = None,
    marker: tuple[str, int] | None = None,
) -> int:
    """Incrementally refresh the bloom sidecar for ``parts`` only —
    the post-append maintenance step: a batch that landed in a handful
    of partitions rebuilds a handful of bitmaps, while every untouched
    partition's row carries forward verbatim from the current sidecar
    version. The published version stores the CURRENT table
    fingerprint, so a refresh that silently missed a touched partition
    is caught by the next fingerprint-checked lookup (fail-safe
    inherited from build/lookup).

    At 100 TB: the rebuild scans ONLY the touched partitions (explicit
    directory reads would also work; the filter prunes on the
    partition column here because ``df`` is the caller's handle), the
    carry-forward is a metadata-sized anti-join, and the publish is
    one snapshot flip."""
    if not parts:
        raise ValueError("refresh_partitions: empty partition list")
    snaps = SnapshotTable(loader, index_table)
    side = snaps.read()
    head = side.limit(1).collect()
    if not head:
        # Sidecar was built on an empty table (zero rows — no stored
        # m_bits to inherit): a refresh is a first real build.
        return build(
            loader, df, index_table, key_col, part_col, marker=marker
        )
    m_bits = int(head[0]["m_bits"])
    n_hashes = int(head[0]["n_hashes"])
    touched = df.filter(F.col(part_col).cast("string").isin(parts))
    pos = (
        touched.filter(F.col(key_col).isNotNull())
        .select(
            F.col(part_col).cast("string").alias("part"),
            F.explode(
                _bit_positions(F.col(key_col), m_bits, n_hashes)
            ).alias("bit"),
        )
        .distinct()
    )
    rebuilt = pos.groupBy("part").applyInPandas(
        _pack_bitmap(m_bits), "part string, bloom binary"
    )
    # ``fingerprint``: callers that KNOW the post-change fingerprint
    # (streaming maintenance adds the batch delta to the stored value —
    # the fingerprint is additive) pass it and skip the O(table)
    # recompute; ad-hoc refreshes recompute from the handle.
    fp = (
        fingerprint
        if fingerprint is not None
        else table_fingerprint(df, key_col, part_col)
    )
    carried = side.filter(~F.col("part").isin(parts)).select("part", "bloom")
    meta = carried.unionByName(rebuilt).withColumns(
        {
            "m_bits": F.lit(m_bits).cast("int"),
            "n_hashes": F.lit(n_hashes).cast("int"),
            "fingerprint": F.lit(fp).cast("bigint"),
        }
    )
    return snaps.write(meta, marker=marker)


def stored_fingerprint(loader: WarehouseLoader, index_table: str) -> int:
    """The fingerprint the current sidecar version is stamped with
    (0 for an empty sidecar — the empty-table fingerprint)."""
    rows = SnapshotTable(loader, index_table).read().limit(1).collect()
    return int(rows[0]["fingerprint"]) if rows else 0


def null_candidates(loader: WarehouseLoader, index_table: str) -> list[str]:
    """Partitions that may contain NULL keys (the ``has_null`` zone-map
    stat) — the pruning set for an ``IS NULL`` point lookup, which
    min/max alone cannot answer (NULLs never enter mn/mx)."""
    rows = SnapshotTable(loader, index_table).read().collect()
    return [r["part"] for r in rows if r["has_null"]]
