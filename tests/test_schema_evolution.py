"""Warehouse schema-evolution contract (loader.read merge_schema):
added columns null-fill historical rows, dropped columns read back as
nulls for new rows, and a same-name type CONFLICT fails the merged
read loudly instead of coercing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.loader import WarehouseLoader


def test_added_column_null_fills_history(spark, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh"))
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    loader.load(v1, "t", if_exists="replace")
    v2 = spark.createDataFrame(
        [(3, "c", 9.5)], "id long, name string, score double"
    )
    loader.load(v2, "t", if_exists="append")

    merged = loader.read("t", merge_schema=True)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 9.5)}
    # dropped-column direction: files written WITHOUT a column read
    # back as null for those rows — same union, symmetric
    v3 = spark.createDataFrame([(4,)], "id long")
    loader.load(v3, "t", if_exists="append")
    m2 = loader.read("t", merge_schema=True)
    r4 = m2.filter(F.col("id") == 4).collect()[0]
    assert r4.name is None and r4.score is None
    assert m2.count() == 4


def test_type_conflict_fails_loudly(spark, tmp_path):
    loader = WarehouseLoader(spark, str(tmp_path / "wh2"))
    loader.load(
        spark.createDataFrame([(1, 10)], "id long, v long"), "t", "replace"
    )
    loader.load(
        spark.createDataFrame([(2, "x")], "id long, v string"), "t", "append"
    )
    with pytest.raises(Exception, match="(?i)merge|incompatible|failed"):
        loader.read("t", merge_schema=True).collect()
