"""Partition-shape helpers for CPU-bound narrow operators, and Z-order
layout math for multi-column data skipping.

A parquet scan yields one input split per ``maxPartitionBytes`` of file,
which is right for I/O-bound plans but starves CPU-heavy per-row
operators (shingling, hashing, Arrow UDFs) when the source is a small
file: a 5 MB file = 1 task = 1 core, regardless of cluster size.
``ensure_min_partitions`` widens such inputs to the session's default
parallelism. At real scale (directories of row-group-sized files) the
scan already yields >= cores partitions and this is a no-op — the
repartition only fires exactly in the small-input regime where its
shuffle is cheap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_min_partitions(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(target) if current < target else df


def _spread_bits_16(x: Column) -> Column:
    """Spread the low 16 bits of a non-negative int so bit i lands at
    position 2i (classic Morton-encoding magic-mask sequence — public
    bit-twiddling; same five steps any Z-order implementation uses)."""
    x = x.cast("long").bitwiseAND(F.lit(0xFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_value(a: Column, b: Column) -> Column:
    """32-bit Z-value (Morton code) interleaving the low 16 bits of two
    non-negative int columns: bits of ``a`` at even positions, ``b`` at
    odd. Sorting by this single value keeps rows close in BOTH
    dimensions, so parquet min/max footer stats stay tight on both
    columns at once — the multi-column data-skipping layout
    (Delta/Iceberg OPTIMIZE ZORDER does exactly this): a linear sort
    gives perfect skipping on its leading column and none on the rest.
    Pure codegen'd bit math; callers quantize real domains (dates →
    day numbers, ids → mod 2^16) into the 16-bit range first."""
    return _spread_bits_16(a).bitwiseOR(F.shiftleft(_spread_bits_16(b), 1))
