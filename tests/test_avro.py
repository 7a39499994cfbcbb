"""Avro OCF source/sink (sources/avro_io.py): golden wire bytes for
the pure-python fallback codec, Spark round trips, honest failure on
unsupported shapes. The JVM spark-avro datasource is absent in this
sandbox, so the fallback path is what executes; write_avro/read_avro
report which path ran, and the round-trip assertions hold for either.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_orchestration_spark.sources import avro_io


def test_golden_bytes_single_record():
    """Hand-derived encoding per the public spec: zigzag varint longs,
    length-prefixed utf-8 strings, union branch indexes, container
    header framing. Byte-for-byte, deterministic sync."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": ["null", "long"]},
        ],
    }
    sync = bytes(range(16))
    blob = avro_io.encode_ocf(
        [{"a": 3, "b": "hi", "c": None}], schema, sync=sync
    )
    assert blob[:4] == b"Obj\x01"
    # records: a=3 -> zigzag 6; b="hi" -> len 2 (zigzag 4) + bytes;
    # c=None -> union branch 0
    body = bytes([0x06, 0x04]) + b"hi" + bytes([0x00])
    # block: count=1 (zigzag 2), size=len(body) (zigzag 2*len)
    block = bytes([0x02, 2 * len(body)]) + body + sync
    assert blob.endswith(block)
    # header metadata map declares exactly our schema + codec
    meta_schema, records = avro_io.decode_ocf(blob)
    assert meta_schema == schema
    assert records == [{"a": 3, "b": "hi", "c": None}]


def test_zigzag_negative_and_multibyte():
    out = bytearray()
    avro_io._write_long(out, -1)  # zigzag(-1) = 1
    avro_io._write_long(out, 64)  # zigzag(64) = 128 -> two bytes
    assert bytes(out) == bytes([0x01, 0x80, 0x01])
    v1, p = avro_io._read_long(bytes(out), 0)
    v2, p = avro_io._read_long(bytes(out), p)
    assert (v1, v2) == (-1, 64)
    # int64 extremes survive
    for v in (2**63 - 1, -(2**63), 0, 42, -42):
        buf = bytearray()
        avro_io._write_long(buf, v)
        got, _ = avro_io._read_long(bytes(buf), 0)
        assert got == v


def test_deflate_codec_round_trip():
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "string"}],
    }
    recs = [{"x": "abc" * 50} for _ in range(100)]
    blob = avro_io.encode_ocf(recs, schema, codec="deflate")
    null_blob = avro_io.encode_ocf(recs, schema, codec="null")
    assert len(blob) < len(null_blob) / 2  # actually compressed
    _, back = avro_io.decode_ocf(blob)
    assert back == recs


def test_spark_round_trip_all_types_and_nulls(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("name", T.StringType(), True),
            T.StructField("score", T.DoubleType(), True),
            T.StructField("flag", T.BooleanType(), True),
            T.StructField("small", T.IntegerType(), True),
            T.StructField("payload", T.BinaryType(), True),
        ]
    )
    rows = [
        (1, "alpha", 1.5, True, 7, b"\x00\x01"),
        (2, None, None, None, None, None),
        (3, "gamma", -2.25, False, -1, b""),
    ]
    df = spark.createDataFrame(rows, schema).repartition(3)
    path = str(tmp_path / "t.avro")
    mode = avro_io.write_avro(df, path)
    assert mode in ("jvm", "fallback")
    back = avro_io.read_avro(spark, path)
    assert back.schema == schema or [
        (f.name, f.dataType) for f in back.schema.fields
    ] == [(f.name, f.dataType) for f in schema.fields]
    assert sorted(map(tuple, back.collect())) == sorted(rows)


def test_spark_round_trip_from_testdata(spark, tmp_path):
    """A real table lands in Avro and comes back value-identical —
    the Kafka-landing-format gap named in VERDICT r6."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text", "lang")
    )
    path = str(tmp_path / "docs_avro")
    avro_io.write_avro(docs, path)
    back = avro_io.read_avro(spark, path)
    assert back.count() == docs.count()
    a = {r["doc_id"]: (r["text"], r["lang"]) for r in back.collect()}
    b = {r["doc_id"]: (r["text"], r["lang"]) for r in docs.collect()}
    assert a == b
    # explicit-schema read matches the header-derived one
    explicit = avro_io.read_avro(spark, path, schema=docs.schema)
    assert explicit.count() == docs.count()


def test_unsupported_types_fail_loudly(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "id bigint, emb array<double>"
    )
    with pytest.raises(NotImplementedError, match="array"):
        avro_io.write_avro(df, str(tmp_path / "bad"))
    with pytest.raises(NotImplementedError):
        avro_io.spark_schema_of(
            {
                "type": "record",
                "name": "r",
                "fields": [{"name": "m", "type": {"type": "map", "values": "long"}}],
            }
        )


def test_append_mode_accumulates(spark, tmp_path):
    df = spark.range(10).select(F.col("id").alias("v"))
    path = str(tmp_path / "acc")
    avro_io.write_avro(df, path, mode="overwrite")
    avro_io.write_avro(df, path, mode="append")
    assert avro_io.read_avro(spark, path).count() == 20
    with pytest.raises(FileExistsError):
        avro_io.write_avro(df, path, mode="error")


def test_empty_dataframe_round_trip(spark, tmp_path):
    """Review r7: an empty write must land a header-only file so the
    read returns an empty frame (the JVM datasource's behavior), not a
    FileNotFoundError."""
    df = spark.range(0).select(F.col("id").alias("v"))
    path = str(tmp_path / "empty")
    avro_io.write_avro(df, path)
    back = avro_io.read_avro(spark, path)
    assert back.count() == 0
    assert [f.name for f in back.schema.fields] == ["v"]


def test_schema_peek_reads_header_only(tmp_path):
    """Review r7: the schema probe must parse the header alone, never
    decode the blocks of a large part file."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "x", "type": "long"}],
    }
    blob = avro_io.encode_ocf([{"x": i} for i in range(10_000)], schema)
    p = tmp_path / "big.avro"
    p.write_bytes(blob)
    assert avro_io.read_ocf_schema(str(p)) == schema
    # truncated header fails loudly instead of looping
    (tmp_path / "trunc.avro").write_bytes(blob[:10])
    with pytest.raises(ValueError, match="truncated"):
        avro_io.read_ocf_schema(str(tmp_path / "trunc.avro"))


def test_partition_file_names_deterministic_per_job(spark, tmp_path):
    """Review r7: file names derive from (job token, partition id) so
    a task retry rewrites the same file — and two append jobs never
    collide."""
    import re

    df = spark.range(20).select(F.col("id").alias("v")).repartition(2)
    path = str(tmp_path / "det")
    avro_io.write_avro(df, path)
    names = sorted(os.listdir(path))
    assert all(re.fullmatch(r"part-[0-9a-f]{12}-\d{5}\.avro", n) for n in names)
    tokens = {n.split("-")[1] for n in names}
    assert len(tokens) == 1  # one job, one token
    avro_io.write_avro(df, path, mode="append")
    tokens2 = {n.split("-")[1] for n in os.listdir(path)}
    assert len(tokens2) == 2  # second job cannot clobber the first
    assert avro_io.read_avro(spark, path).count() == 40



def test_warehouse_loader_reads_avro_tables(spark, tmp_path):
    """loader.read(table, fmt='avro') routes through the probing
    reader, so an Avro-landed warehouse table reads back regardless of
    whether the JVM datasource is installed."""
    from etl_pipeline_orchestration_spark.loader import WarehouseLoader

    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    df = spark.range(7).select(F.col("id").alias("v"))
    avro_io.write_avro(df, loader._path("t_avro"))
    assert loader.read("t_avro", fmt="avro").count() == 7
    assert loader.table_count("missing_avro") == 0  # lenient probe holds


def test_streaming_avro_ingestion_equals_batch(spark, tmp_path):
    """Avro file stream (Kafka-landing shape): draining the directory
    with availableNow yields exactly the batch read's rows, and
    arrival-ordered chunks land once each."""
    schema = T.StructType(
        [
            T.StructField("v", T.LongType(), False),
            T.StructField("tag", T.StringType(), True),
        ]
    )
    land = str(tmp_path / "land")
    os.makedirs(land)
    # three avro files with ascending mtimes (controlled arrival order)
    for i in range(3):
        recs = [
            {"v": i * 10 + j, "tag": f"f{i}"} for j in range(5)
        ]
        aschema = avro_io.avro_schema_of(schema)
        p = os.path.join(land, f"chunk-{i}.avro")
        with open(p, "wb") as fh:
            fh.write(avro_io.encode_ocf(recs, aschema))
        t = 1_700_000_000 + i * 100
        os.utime(p, (t, t))
    stream = avro_io.read_avro_stream(spark, land, schema)
    assert stream.isStreaming
    got: list[tuple] = []
    q = (
        stream.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(
            lambda df, bid: got.extend(map(tuple, df.collect()))
        )
        .start()
    )
    q.awaitTermination(120)
    want = sorted(map(tuple, avro_io.read_avro(spark, land).collect()))
    assert sorted(got) == want and len(want) == 15
