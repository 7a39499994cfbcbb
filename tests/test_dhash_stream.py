"""Streaming dHash near-dup maintenance (streaming/dhash_stream.py):
stream==batch twin, arrival-order independence of the pair union,
replay skip, checkpoint identity, and index compaction."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from etl_pipeline_orchestration_spark.loader import (
    SnapshotTable,
    WarehouseLoader,
)
from etl_pipeline_orchestration_spark.operators import multimodal
from etl_pipeline_orchestration_spark.plans import registry
from etl_pipeline_orchestration_spark.sources.tables import load_table

registry.load_all()

SF = "/root/testdata/sf0.001"

MEDIA_SCHEMA = "doc_id long, payload binary"


def _media_rows(spark, n=120):
    docs = load_table(spark, SF, "documents").select("doc_id").limit(n)
    return (
        multimodal.synth_png_neardup_media(docs)
        .select("doc_id", "payload")
        .orderBy("doc_id")
        .collect()
    )


def _write_chunks(rows, d, order):
    """Write rows as len(order) parquet files; mtimes follow ``order``
    so FileStreamSource arrival order is exactly ``order``."""
    per = (len(rows) + len(order) - 1) // len(order)
    chunks = [rows[i * per : (i + 1) * per] for i in range(len(order))]
    for arrival, idx in enumerate(order):
        chunk = chunks[idx]
        table = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in chunk], pa.int64()),
                "payload": pa.array(
                    [bytes(r["payload"]) for r in chunk], pa.binary()
                ),
            }
        )
        path = os.path.join(d, f"part-{idx}.parquet")
        pq.write_table(table, path)
        t = 1_700_000_000 + arrival * 100
        os.utime(path, (t, t))


def _batch_pairs(spark, rows):
    media = spark.createDataFrame(
        [(r["doc_id"], bytes(r["payload"])) for r in rows], MEDIA_SCHEMA
    )
    from etl_pipeline_orchestration_spark.streaming.dhash_stream import (
        dhash_incremental_pairs,
        DHASH_INDEX_SCHEMA,
    )

    empty = spark.createDataFrame([], DHASH_INDEX_SCHEMA)
    hashes = multimodal.dhash_batch(media)
    return {
        (r.id_a, r.id_b, r.hamming)
        for r in dhash_incremental_pairs(hashes, empty).collect()
    }


def _stream_pairs(spark, rows, tmp_path, order, tag):
    from etl_pipeline_orchestration_spark.streaming.dhash_stream import (
        stream_dhash_to_warehouse,
    )

    d = str(tmp_path / f"media_{tag}")
    os.makedirs(d)
    _write_chunks(rows, d, order)
    loader = WarehouseLoader(spark, str(tmp_path / f"wh_{tag}"))
    stream = (
        spark.readStream.schema(MEDIA_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    snaps = stream_dhash_to_warehouse(
        stream, loader, "dhash_index", "dhash_pairs",
        str(tmp_path / f"ckpt_{tag}"),
    )
    pairs = spark.read.schema(
        "id_a bigint, id_b bigint, hamming bigint"
    ).parquet(loader._path("dhash_pairs"))
    return snaps, loader, {
        (r.id_a, r.id_b, r.hamming) for r in pairs.collect()
    }


def test_streamed_pairs_equal_batch_and_are_order_independent(
    spark, tmp_path
):
    rows = _media_rows(spark)
    want = _batch_pairs(spark, rows)
    assert len(want) >= (len(rows) // 4) * 6 * 0.9  # planted groups found

    snaps, _, got_ordered = _stream_pairs(
        spark, rows, tmp_path, [0, 1, 2, 3], "ord"
    )
    assert len(snaps.versions()) == 4
    assert got_ordered == want

    # reversed arrival: every unordered pair is still emitted exactly
    # once (by whichever side lands second), canonicalized identically
    _, _, got_reversed = _stream_pairs(
        spark, rows, tmp_path, [3, 1, 2, 0], "rev"
    )
    assert got_reversed == want


def test_replay_skip_and_checkpoint_identity(spark, tmp_path):
    from etl_pipeline_orchestration_spark.streaming.dhash_stream import (
        dhash_batch,
        read_dhash_index,
    )

    rows = _media_rows(spark, n=40)
    media = spark.createDataFrame(
        [(r["doc_id"], bytes(r["payload"])) for r in rows], MEDIA_SCHEMA
    )
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "idx")
    assert dhash_batch(loader, snaps, "prs", media, 0, "ck", index_table="idx")
    n_idx = read_dhash_index(loader, "idx", snaps, "ck").count()
    assert n_idx == 40 * 4  # 4 band rows per image
    # replay: skipped, index unchanged
    assert not dhash_batch(
        loader, snaps, "prs", media, 0, "ck", index_table="idx"
    )
    assert read_dhash_index(loader, "idx", snaps, "ck").count() == n_idx
    with pytest.raises(ValueError, match="checkpoint"):
        dhash_batch(loader, snaps, "prs", media, 0, "other", index_table="idx")


def test_compaction_preserves_index_and_future_pairs(spark, tmp_path):
    from etl_pipeline_orchestration_spark.streaming.dhash_stream import (
        compact_dhash_index,
        dhash_batch,
        read_dhash_index,
    )

    rows = _media_rows(spark, n=90)
    third = len(rows) // 3
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    snaps = SnapshotTable(loader, "idx")

    def media(chunk):
        return spark.createDataFrame(
            [(r["doc_id"], bytes(r["payload"])) for r in chunk], MEDIA_SCHEMA
        )

    dhash_batch(loader, snaps, "prs", media(rows[:third]), 0, "ck",
                index_table="idx")
    dhash_batch(loader, snaps, "prs", media(rows[third : 2 * third]), 1,
                "ck", index_table="idx")
    before = {
        (r.doc_id, r.dhash, r.band_id, r.band_val)
        for r in read_dhash_index(loader, "idx", snaps, "ck").collect()
    }
    folded = compact_dhash_index(loader, "idx", snaps, "ck")
    assert folded == 2
    after = {
        (r.doc_id, r.dhash, r.band_id, r.band_val)
        for r in read_dhash_index(loader, "idx", snaps, "ck").collect()
    }
    assert after == before
    # the stream continues against the compacted index: the last
    # third's cross-batch pairs land as if never compacted
    dhash_batch(loader, snaps, "prs", media(rows[2 * third :]), 2, "ck",
                index_table="idx")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in spark.read.schema("id_a bigint, id_b bigint, hamming bigint")
        .parquet(loader._path("prs"))
        .collect()
    }
    want = _batch_pairs(spark, rows)
    assert got == want
