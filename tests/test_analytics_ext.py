"""Planted-truth tests for plans/analytics_ext.py additions beyond
the oracle sweep (the sweep proves cross-engine equality; these pin
MEANING on hand-built inputs)."""

from __future__ import annotations



# ---------------------------------------------------------------------------
# GSP sequential patterns
# ---------------------------------------------------------------------------


def test_gsp_gaps_allowed_order_required(spark, tmp_path):
    """Planted streams: 3 of 4 users do view ..gap.. click ..gap..
    purchase (with noise events between), the 4th does the REVERSE.
    With minsup = ceil(n/4) = 1... use 4 users and check the len-3
    pattern view>click>purchase is found with support 3, while
    purchase>click>view has support 1 (the reversed user only) —
    order matters, gaps don't."""
    import datetime

    from etl_pipeline_orchestration_spark.plans import registry

    registry.load_all()
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def add(u, seq):
        nonlocal eid
        for s, typ in enumerate(seq):
            rows.append(
                (eid, t0 + datetime.timedelta(seconds=s), u, typ, 0.0, "{}")
            )
            eid += 1

    for u in (1, 2, 3):
        add(u, ["view", "error", "click", "signup", "purchase"])
    add(4, ["purchase", "click", "view"])
    events = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    sf = str(tmp_path / "sf_gsp")
    events.write.parquet(f"{sf}/events.parquet")
    got = {
        (r.pattern, r.length): r.sup
        for r in registry.QUERIES["gsp_frequent_sequences"](spark, sf).collect()
    }
    assert got[("view>click>purchase", 3)] == 3  # gaps allowed
    assert got[("purchase>click>view", 3)] == 1  # reversal ≠ same pattern
    assert got[("view>purchase", 2)] == 3  # subsequence, not adjacency
    assert got[("view", 1)] == 4
    # anti-monotonicity: every frequent pattern's prefix is frequent
    for (p, ln), sup in got.items():
        if ln > 1:
            prefix = ">".join(p.split(">")[:-1])
            assert got[(prefix, ln - 1)] >= sup, p
