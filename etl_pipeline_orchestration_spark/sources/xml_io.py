"""XML source/sink — Spark 4's built-in ``xml`` datasource.

Spark 4 ships the (formerly external) spark-xml module in-box
(SPARK-44265), so unlike Avro (sources/avro_io.py) no fallback codec
is needed: reads are JVM-side, splittable across files, and
schema-inferring; writes emit one ``<rowTag>`` element per row, one
file per partition. These wrappers pin the options a round-trippable
relational landing needs:

* ``rowTag`` / ``rootTag`` fixed per call so read and write agree;
* ``nullValue`` left at the datasource default (absent element =
  null) — empty string and null stay distinguishable;
* reads accept an explicit schema (recommended: inference scans the
  files twice and types every ambiguous field as string).

100 TB note: XML is a CONNECTOR format here (landing feeds from
legacy systems), not a lake format — each file parses in one task, so
pipelines should land many medium files, then convert to parquet via
WarehouseLoader for anything queried repeatedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    (
        df.write.format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .mode(mode)
        .save(path)
    )


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: T.StructType | None = None,
) -> DataFrame:
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
