"""XML source/sink tests: entity escaping, null-vs-empty distinction,
explicit-schema typed round trip, and multi-partition writes."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipeline_orchestration_spark.sources import xml_io


def test_xml_round_trip_escaping_and_types(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("txt", T.StringType(), True),
            T.StructField("val", T.DoubleType(), True),
            T.StructField("flag", T.BooleanType(), True),
        ]
    )
    rows = [
        (1, "a & b < c > d \"quoted\" 'apos'", 1.5, True),
        (2, None, None, False),
        (3, "plain", -0.25, None),
        (4, "tags <doc></doc> inside", 2.0, True),
    ]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "xml_rt")
    xml_io.write_xml(df, path, row_tag="doc", root_tag="docs")
    back = xml_io.read_xml(spark, path, row_tag="doc", schema=schema)
    # datasources relax nullability on read; names and types must hold
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in schema.fields
    ]
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)


def test_xml_multi_partition_write(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"), F.concat(F.lit("t"), F.col("id")).alias("txt")
    ).repartition(4)
    path = str(tmp_path / "xml_parts")
    xml_io.write_xml(df, path)
    back = xml_io.read_xml(
        spark, path, schema=T.StructType(
            [
                T.StructField("id", T.LongType(), True),
                T.StructField("txt", T.StringType(), True),
            ]
        )
    )
    assert back.count() == 1000
    assert back.agg(F.sum("id")).head()[0] == 499500
