"""Unit tests for the scalar helpers, pinning the reference's pandas
semantics (SURVEY.md §4 "semantic traps")."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.functions.scalar import (
    coerce_numeric,
    cut,
    month_bucket,
    safe_divide,
    with_global_quantile_flag,
)


def _col_vals(spark, rows, schema, expr):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(expr.alias("v")).collect()]


def test_cut_pd_semantics(spark):
    """pd.cut: left-open/right-closed intervals; exactly the first edge,
    out-of-range, and NULL all map to NULL (reference etl_pipeline.py:204-206)."""
    vals = [0.0, 0.15, 0.3, 0.45, 0.6, 0.9, 1.0, 1.1, -0.2, None]
    rows = [(v,) for v in vals]
    out = _col_vals(
        spark, rows, "x double",
        cut(F.col("x"), [0.0, 0.3, 0.6, 1.0], ["Low", "Medium", "High"]),
    )
    assert out == [None, "Low", "Low", "Medium", "Medium", "High", "High", None, None, None]


def test_safe_divide_null_on_zero(spark):
    rows = [(10.0, 4.0), (1.0, 0.0), (None, 2.0), (7.0, 3.0)]
    out = _col_vals(
        spark, rows, "a double, b double", safe_divide(F.col("a"), F.col("b"), 2)
    )
    assert out[0] == 2.5
    assert out[1] is None  # division by zero -> NULL, not inf/error
    assert out[2] is None
    assert out[3] == 2.33  # round(7/3, 2dp)


def test_coerce_numeric_bad_input(spark):
    """pd.to_numeric(errors='coerce').fillna(0) parity — and it must hold
    under ANSI sessions (try_cast), since the driver runs ANSI on."""
    rows = [("1.5",), ("abc",), (None,), ("2",)]
    out = _col_vals(spark, rows, "s string", coerce_numeric(F.col("s")))
    assert out == [1.5, 0.0, 0.0, 2.0]


def test_month_bucket_and_date_coerce(spark):
    """month_bucket yields NULL for unparseable dates — deliberately
    diverging from pandas .to_period('M').astype(str) which yields the
    string 'NaT' (documented divergence: NULL is the sane engine value)."""
    rows = [("2026-03-15",), ("garbage",), (None,)]
    out = _col_vals(
        spark, rows, "d string", month_bucket(F.try_to_timestamp(F.col("d")))
    )
    assert out == ["2026-03", None, None]


def test_quantile_flag_exact_matches_manual(spark):
    import numpy as np

    vals = sorted(float(v) for v in np.random.RandomState(7).uniform(0, 100, 200))
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    flagged = with_global_quantile_flag(df, "x", "hi", q=0.9)
    n_hi = flagged.filter("hi").count()
    thresh = float(np.quantile(np.array(vals), 0.9))  # linear interpolation
    expected = sum(1 for v in vals if v > thresh)
    assert n_hi == expected


def test_distributed_exact_quantile_equals_builtin(spark):
    """The bracket-and-refine quantile must be BIT-identical to Spark's
    buffered exact percentile (which it replaces for scale)."""
    from etl_pipeline_orchestration_spark.functions.scalar import (
        exact_quantile_distributed,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    for q in (0.1, 0.5, 0.9, 0.987):
        v_dist = exact_quantile_distributed(df, "l_extendedprice", q)
        v_builtin = df.selectExpr(f"percentile(l_extendedprice, {q})").head()[0]
        assert v_dist == v_builtin, q


def test_quantile_flag_approx_close_to_exact(spark):
    """The scale path (approx_percentile sketch) must agree with exact on
    all but a vanishing fraction of rows."""
    import numpy as np

    vals = [float(v) for v in np.random.RandomState(11).uniform(0, 1000, 5000)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    n_exact = with_global_quantile_flag(df, "x", "hi", q=0.9).filter("hi").count()
    n_approx = (
        with_global_quantile_flag(df, "x", "hi", q=0.9, exact=False)
        .filter("hi")
        .count()
    )
    assert math.isclose(n_exact, n_approx, rel_tol=0.01, abs_tol=5)


def test_grouped_exact_percentiles_match_buffering_builtin(spark):
    """The distributed per-group percentile (sort + rank selection)
    must equal Spark's buffering `percentile` builtin on every group —
    the independent reference that catches formula bugs a
    mirrored-in-the-oracle compare cannot (e.g. the integral-rank case
    where the weighted form evaluates to zero)."""
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F

    from etl_pipeline_orchestration_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: (r["p50"], r["p95"])
        for r in entrymod.queries()["grouped_exact_percentiles"](
            spark, sf
        ).collect()
    }
    ev = load_table(spark, sf, "events").filter(F.col("value").isNotNull())
    ref = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    ).collect()
    assert len(got) == len(ref)
    for r in ref:
        g = got[r["event_type"]]
        assert abs(g[0] - r["p50"]) < 1e-12
        assert abs(g[1] - r["p95"]) < 1e-12


def test_polymorphic_udtf_analyze_schema(spark):
    """Spark 4 polymorphic UDTF: the output schema is computed at plan
    time by analyze() from a constant argument (here a key list), so
    one UDTF serves any projection — SELECT * resolves to the derived
    columns, values extracted per row on executors."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class ExtractKeys:
        @staticmethod
        def analyze(props: AnalyzeArgument, keys: AnalyzeArgument):
            names = [k.strip() for k in keys.value.split(",")]
            return AnalyzeResult(
                StructType(
                    [StructField(n, LongType()) for n in names]
                )
            )

        def eval(self, props: str, keys: str):
            import json

            d = json.loads(props) if props else {}
            names = [k.strip() for k in keys.split(",")]
            yield tuple(
                int(d[n]) if n in d and d[n] is not None else None
                for n in names
            )

    spark.udtf.register("extract_keys", udtf(ExtractKeys))
    df = spark.createDataFrame(
        [(1, '{"k": 7}'), (2, '{"k": 9, "other": 3}'), (3, None)],
        "id long, props string",
    )
    df.createOrReplaceTempView("props_rows")
    out = spark.sql(
        """
        SELECT p.id, t.k, t.other
        FROM props_rows p, LATERAL extract_keys(p.props, 'k, other') t
        ORDER BY p.id
        """
    ).collect()
    assert [tuple(r) for r in out] == [
        (1, 7, None),
        (2, 9, 3),
        (3, None, None),
    ]
