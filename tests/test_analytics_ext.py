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


def test_sequence_regex_exclusion_semantics(spark, tmp_path):
    """The clean-convert pattern must REJECT a user whose error falls
    between view and purchase, while convert_any accepts them — the
    exclusion-class semantics GSP cannot express."""
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

    add(1, ["view", "click", "purchase"])            # clean
    add(2, ["view", "error", "click", "purchase"])   # dirty convert
    add(3, ["view", "error"])                        # immediate bounce
    add(4, ["purchase", "view", "purchase"])         # repeat buyer
    events = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    sf = str(tmp_path / "sf_rx")
    events.write.parquet(f"{sf}/events.parquet")
    got = {
        r.pattern_name: (r.n_users, r.n_total)
        for r in registry.QUERIES["sequence_regex_funnel"](spark, sf).collect()
    }
    assert got["clean_convert"] == (1, 4)   # user 2 excluded by [^e]
    assert got["convert_any"] == (2, 4)     # users 1 and 2
    assert got["immediate_bounce"] == (2, 4)  # users 2 AND 3 start "ve"
    assert got["double_purchase"] == (1, 4)
    assert got["error_then_recover"] == (1, 4)  # user 2 only


# ---------------------------------------------------------------------------
# Item-item collaborative filtering
# ---------------------------------------------------------------------------


def test_itemitem_cf_hand_computed_cosines(spark, tmp_path):
    """Hand-built baskets: {1,2,3}, {1,2}, {1,2}, {1,4}. Then
    c1=4, c2=3, c3=1, c4=1; c12=3, c13=1, c23=1, c14=1.
    cos²(1,2)=9/12, cos²(2,1)=9/12, cos²(1,3)=1/4, cos²(1,4)=1/4,
    cos²(3,2)=1/3 ... part 1's ranking: 2 (750000), then 3 vs 4 tie at
    250000 with equal co_count -> part_j ascending."""
    import duckdb

    baskets = [(1, [1, 2, 3]), (2, [1, 2]), (3, [1, 2]), (4, [1, 4])]
    rows = [(ok, p) for ok, parts in baskets for p in parts]
    con = duckdb.connect()
    con.execute("CREATE TABLE li (l_orderkey BIGINT, l_partkey BIGINT)")
    con.executemany("INSERT INTO li VALUES (?,?)", rows)
    con.execute(f"COPY li TO '{tmp_path}/lineitem.parquet' (FORMAT PARQUET)")

    from etl_pipeline_orchestration_spark.plans import registry

    registry.load_all()
    out = registry.QUERIES["itemitem_cf_topk"](spark, str(tmp_path)).collect()
    by_i = {}
    for r in sorted(out, key=lambda r: (r.part_i, r.rk)):
        by_i.setdefault(r.part_i, []).append(r)
    p1 = by_i[1]
    assert [r.part_j for r in p1] == [2, 3, 4]
    assert p1[0].cos2_q == (1_000_000 * 9) // 12
    assert p1[1].cos2_q == (1_000_000 * 1) // 4
    assert p1[2].cos2_q == (1_000_000 * 1) // 4
    # part 3 recommends 1 and 2: cos²(3,1)=1/4, cos²(3,2)=1/3 -> 2 first
    p3 = by_i[3]
    assert [r.part_j for r in p3] == [2, 1]
    assert p3[0].cos2_q == 1_000_000 // 3
    # every item emits at most 3 neighbors
    assert max(len(v) for v in by_i.values()) <= 3
