from __future__ import annotations

from etl_pipeline_orchestration_spark.operators.cdc import apply_changes


def test_apply_changes_merge_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        ["id", "name", "amount"],
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 25.0, "U"),   # update
            (3, None, None, "D"),   # delete (payload ignored)
            (9, "z", 90.0, "I"),    # insert
        ],
        ["id", "name", "amount", "op"],
    )
    out = {
        r["id"]: (r["name"], r["amount"])
        for r in apply_changes(target, changes, key="id").collect()
    }
    assert out == {
        1: ("a", 10.0),   # untouched passthrough
        2: ("b2", 25.0),  # updated payload wins
        4: ("d", 40.0),
        9: ("z", 90.0),   # inserted
    }
    assert 3 not in out


def test_apply_changes_preserves_schema(spark):
    target = spark.createDataFrame([(1, "a")], ["id", "v"])
    changes = spark.createDataFrame([(1, "b", "U")], ["id", "v", "op"])
    merged = apply_changes(target, changes, key="id")
    assert merged.columns == target.columns
