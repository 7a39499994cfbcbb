"""Every registered query must EXECUTE under an ANSI-on session.

The correctness driver runs `__spark_entry__` with a VANILLA Spark 4
session — ANSI enabled — while our own `get_spark` (and therefore the
whole pytest suite and tools/check_oracle.py) runs ANSI off for pandas
parity (SURVEY §4 trap 3). That gap let an ANSI-only crash slip
through every in-repo gate in round 4: `gram_stats_of` indexed one
past the end of the token array, which is a silent NULL under ANSI-off
but INVALID_ARRAY_INDEX under the driver's session — all eight
corpus-statistics queries would have failed the driver while every
local check stayed green.

This sweep closes the gap: ANSI is a runtime SQL conf, so the shared
session toggles it on and runs EVERY registered query to completion at
sf0.001. Value parity is the oracle sweep's job; this asserts the
much cheaper property that no plan contains an ANSI-only failure
(array index, int overflow, bad cast, out-of-range elt)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


@pytest.mark.slow
def test_every_registered_query_executes_under_ansi(spark):
    sf_dir = "/root/testdata/sf0.001"
    qs = entrymod.queries()
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    failures = []
    try:
        for name, fn in sorted(qs.items()):
            try:
                fn(spark, sf_dir).count()
            except Exception as ex:  # noqa: BLE001 — collecting a report
                failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:160]}")
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert not failures, "ANSI-only failures:\n" + "\n".join(failures)
