"""Clean-stage tests: dedup, exempt-column null-drop, and
Observation-based drop accounting (reference etl_pipeline.py:181-189)."""

from __future__ import annotations

from etl_pipeline_orchestration_spark.operators.cleaning import CleanStats, clean_common


def _dirty_df(spark):
    rows = [
        ("a", "x@y.com", 1.0),
        ("a", "x@y.com", 1.0),      # exact duplicate -> dropped
        ("b", None, 2.0),           # null in exempt col -> kept
        ("c", "c@y.com", None),     # null in checked col -> dropped
        (None, "d@y.com", 4.0),     # null in checked col -> dropped
        ("e", "e@y.com", 5.0),
    ]
    return spark.createDataFrame(rows, "id string, email string, v double")


def test_clean_dedup_and_exempt_nulls(spark):
    out = clean_common(_dirty_df(spark), null_exempt=("email",))
    ids = sorted(r["id"] for r in out.collect())
    assert ids == ["a", "b", "e"]


def test_clean_stats_ride_the_action(spark):
    stats = CleanStats()
    out = clean_common(_dirty_df(spark), null_exempt=("email",), stats=stats)
    out.collect()  # the single action populates both counters
    assert stats.records_in == 6
    assert stats.records_out == 3
    assert stats.records_dropped == 3


def test_clean_no_exempt(spark):
    out = clean_common(_dirty_df(spark), null_exempt=())
    ids = sorted(r["id"] for r in out.collect())
    assert ids == ["a", "e"]
