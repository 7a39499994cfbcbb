"""Streaming perceptual-hash (dHash) near-duplicate maintenance over a
landing image stream — the multimodal twin of dedup_stream.py.

Each micro-batch of landed media

1. decodes + dHashes ONLY its own payloads (operators/multimodal.py
   dhash_batch — Arrow-batched, one narrow map),
2. emits the verified near-dup pairs it completes — (batch × stored
   index) ∪ (batch × batch), candidates from 16-bit band equality,
   verified by JVM ``bit_count(xor) <= MAX_HAMMING`` — into a
   per-batch output partition,
3. appends its own (doc_id, dhash, band) rows as an
   ``index_table/batch_id=N`` partition (overwrite — replay
   idempotent), then
4. publishes the manifest snapshot whose atomic pointer flip carries
   the applied-upto watermark.

The index rows CARRY the full 64-bit hash alongside each band, so the
Hamming verify against history needs no archive payloads and no second
decode — per-batch cost is O(batch decode) + O(matching band buckets),
never O(archive). Replay discipline is dedup_stream's, byte for byte:
pairs before index before watermark; a crashed attempt's orphan
partitions are invisible behind the watermark; a fresh checkpoint
against an existing index fails loudly (watermark.py).

Unlike MinHash's mega-bucket guard there is no emission-time cutoff:
band buckets are tiny (16-bit equality over near-uniform hashes), so
the streamed union is EXACTLY the batch pair set — and because pairs
are canonicalized (least, greatest), the union is also arrival-order
independent (each unordered pair is emitted by whichever side lands
second). Both properties are pinned by tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import SnapshotTable, WarehouseLoader
from etl_pipeline_orchestration_spark.operators import multimodal

DHASH_INDEX_SCHEMA = "doc_id bigint, dhash bigint, band_id int, band_val bigint"

N_BANDS = 4
MAX_HAMMING = 3  # < N_BANDS: pigeonhole recall guarantee


def dhash_band_rows(hashes: DataFrame) -> DataFrame:
    """[doc_id, dhash] -> the banded index relation (4 x 16-bit)."""
    return hashes.select(
        "doc_id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright("dhash", 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("band_val"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "dhash", "band.band_id", "band.band_val")


def read_dhash_index(
    loader: WarehouseLoader,
    index_table: str,
    index_snaps: SnapshotTable,
    app_id: str,
) -> DataFrame:
    """Published band rows, watermark-pruned (the shared per-batch
    partition-store read path)."""
    from etl_pipeline_orchestration_spark.streaming.compaction import (
        read_published_partitions,
    )

    return read_published_partitions(
        loader.spark,
        loader._path(index_table),
        DHASH_INDEX_SCHEMA,
        index_snaps.applied_upto(app_id),
    )


def dhash_incremental_pairs(
    batch_hashes: DataFrame, index: DataFrame
) -> DataFrame:
    """Verified near-dup pairs touching the new batch only: candidates
    from band equality against (index ∪ batch), new×old in either id
    order, new×new once; Hamming verified on the carried hashes.
    Output: (id_a, id_b, hamming) with id_a < id_b."""
    new_bands = dhash_band_rows(batch_hashes).withColumn(
        "__new__", F.lit(True)
    )
    combined = index.withColumn("__new__", F.lit(False)).unionByName(
        new_bands
    )
    a = combined.filter("__new__").alias("a")
    b = combined.alias("b")
    pair_a = F.least(F.col("a.doc_id"), F.col("b.doc_id"))
    pair_b = F.greatest(F.col("a.doc_id"), F.col("b.doc_id"))
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (
                (~F.col("b.__new__"))
                | (F.col("a.doc_id") < F.col("b.doc_id"))
            )
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            pair_a.alias("id_a"),
            pair_b.alias("id_b"),
        )
        .agg(
            F.first("a.dhash").alias("h_a"), F.first("b.dhash").alias("h_b")
        )
    )
    return (
        cand.select(
            "id_a",
            "id_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= MAX_HAMMING)
    )


def dhash_batch(
    loader: WarehouseLoader,
    index_snaps: SnapshotTable,
    pairs_table: str,
    batch_media: DataFrame,
    batch_id: int,
    app_id: str,
    index_table: str = "dhash_index",
) -> bool:
    """Process one micro-batch of media rows [doc_id, payload]: emit
    its verified pairs, grow the index by one partition, publish the
    watermark. Returns False when already applied (replay skip)."""
    if batch_id <= index_snaps.applied_upto(app_id):
        return False

    spark = batch_media.sparkSession
    hashes = multimodal.dhash_batch(batch_media).localCheckpoint()
    index = read_dhash_index(loader, index_table, index_snaps, app_id)
    pairs = dhash_incremental_pairs(hashes, index)
    pairs_dir = os.path.join(loader._path(pairs_table), f"batch_id={batch_id}")
    pairs.write.mode("overwrite").parquet(pairs_dir)

    band_dir = os.path.join(loader._path(index_table), f"batch_id={batch_id}")
    dhash_band_rows(hashes).write.mode("overwrite").parquet(band_dir)

    manifest = spark.createDataFrame([(batch_id,)], "last_batch_id bigint")
    index_snaps.write(manifest, marker=(app_id, batch_id))
    return True


def compact_dhash_index(
    loader: WarehouseLoader,
    index_table: str,
    index_snaps: SnapshotTable,
    app_id: str,
    target_files: int = 1,
) -> int:
    """Fold published band partitions into one consolidated partition
    (file-count bound for a long-running stream); watermark untouched."""
    from etl_pipeline_orchestration_spark.streaming.compaction import (
        compact_batch_partitions,
    )

    return compact_batch_partitions(
        loader.spark,
        loader._path(index_table),
        index_snaps.applied_upto(app_id),
        DHASH_INDEX_SCHEMA,
        target_files=target_files,
    )


def stream_dhash_to_warehouse(
    stream_media: DataFrame,
    loader: WarehouseLoader,
    index_table: str,
    pairs_table: str,
    checkpoint_dir: str,
) -> SnapshotTable:
    """Drain the media stream's backlog through the incremental dHash
    dedup (availableNow). ``stream_media`` must carry [doc_id,
    payload]. The (checkpoint, index) pair is the exactly-once unit."""
    from etl_pipeline_orchestration_spark.streaming.events_stream import (
        run_foreach_batch_append,
    )

    snaps = SnapshotTable(loader, index_table)
    app_id = os.path.abspath(checkpoint_dir)
    run_foreach_batch_append(
        stream_media,
        lambda batch, bid: dhash_batch(
            loader, snaps, pairs_table, batch, bid, app_id,
            index_table=index_table,
        ),
        checkpoint_dir,
        output_mode="append",
    )
    return snaps
