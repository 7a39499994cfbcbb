"""Property-based tests (hypothesis): the scalar semantics that pin
reference parity must hold on arbitrary inputs, not just the fixtures.
Each property runs ONE Spark job over the whole generated batch."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.functions.scalar import cut, safe_divide
from etl_pipeline_orchestration_spark.operators.sampling import KNUTH

FINITE = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
)


@settings(max_examples=15, deadline=None)
@given(st.lists(st.one_of(FINITE, st.none()), min_size=1, max_size=50))
def test_cut_matches_pandas_cut(spark, values):
    bins, labels = [0.0, 0.3, 0.6, 1.0], ["Low", "Medium", "High"]
    df = spark.createDataFrame([(v,) for v in values], "x double")
    got = [
        r["c"]
        for r in df.select(cut(F.col("x"), bins, labels).alias("c")).collect()
    ]
    want = [
        None if pd.isna(c) else c
        for c in pd.cut(pd.Series(values, dtype="float64"), bins=bins, labels=labels)
        .astype(object)
        .tolist()
    ]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(FINITE, st.one_of(FINITE, st.just(0.0))), min_size=1, max_size=50
    )
)
def test_safe_divide_never_errors_null_on_zero(spark, pairs):
    df = spark.createDataFrame(pairs, "a double, b double")
    rows = df.select(
        "a", "b", safe_divide(F.col("a"), F.col("b"), 2).alias("q")
    ).collect()
    for r in rows:
        if r["b"] == 0.0:
            assert r["q"] is None  # the one semantic guarantee: NULL, no error
        elif r["q"] is not None:
            true_q = r["a"] / r["b"]
            if math.isinf(true_q):
                # IEEE overflow (subnormal denominator) — pandas'
                # x / y.replace(0, nan) yields the same inf
                assert math.isinf(r["q"])
            else:
                # within rounding distance of the true quotient
                assert abs(r["q"] - true_q) <= 0.005 + abs(true_q) * 1e-9


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_split_bucket_is_stable_and_in_range(doc_id):
    """The split bucket used by train/val/test assignment is a pure
    function of the id and always lands in [0, 1000)."""
    b = (doc_id * KNUTH) % (2**32) % 1000
    b2 = (doc_id * KNUTH) % (2**32) % 1000
    assert b == b2
    assert 0 <= b < 1000


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 100)),
        min_size=1,
        max_size=60,
    ),
    st.lists(st.integers(0, 20), min_size=1, max_size=15, unique=True),
)
def test_salted_join_equals_plain_join(spark, fact_rows, dim_keys):
    """Salting must be invisible: same multiset of joined rows as the
    plain inner join, for arbitrary key overlap and duplication."""
    from etl_pipeline_orchestration_spark.operators.skew import salted_join

    fact = spark.createDataFrame(fact_rows, "k BIGINT, v BIGINT")
    dim = spark.createDataFrame([(k, f"d{k}") for k in dim_keys], "dk BIGINT, name STRING")
    got = sorted(
        map(tuple, salted_join(fact, dim, "k", "dk", salt_factor=4).collect())
    )
    want = sorted(
        map(tuple, fact.join(dim, fact.k == dim.dk).collect())
    )
    assert got == want


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 300))
def test_chunking_covers_every_token_with_overlap(spark, n_tokens):
    """Every token index lands in ≥1 chunk; consecutive chunks start 48
    apart (16-token overlap at width 64); chunks are ≤64 tokens — the
    invariants that make chunked training text lossless."""
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id BIGINT, text STRING")

    import etl_pipeline_orchestration_spark.plans.llm_data  # noqa: F401
    from etl_pipeline_orchestration_spark.plans.registry import QUERIES

    # run the registered chunker's logic through a temp view of this doc
    from pyspark.sql import functions as F2
    from etl_pipeline_orchestration_spark.operators import text as T

    w = T._norm_words("text")
    base = df.select("doc_id", w.alias("w"))
    starts = F2.sequence(F2.lit(0), F2.greatest(F2.size("w") - 1, F2.lit(0)), F2.lit(48))
    chunk = F2.slice("w", F2.col("start") + 1, 64)
    rows = (
        base.select("doc_id", F2.posexplode(starts).alias("chunk_idx", "start"), "w")
        .select("chunk_idx", "start", F2.size(chunk).alias("n"), chunk.alias("c"))
        .collect()
    )
    covered = set()
    for r in sorted(rows, key=lambda r: r["chunk_idx"]):
        assert r["start"] == r["chunk_idx"] * 48
        assert 1 <= r["n"] <= 64
        covered.update(range(r["start"], r["start"] + r["n"]))
    assert covered == set(range(n_tokens))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from("red green blue fast slow hot cold big".split()),
            min_size=0,
            max_size=12,
        ),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([0.3, 0.5, 0.7]),
)
def test_jaccard_prefix_join_exact_on_random_corpora(spark, token_lists, threshold):
    """The prefix/size-ratio/positional candidate prunes must preserve
    EXACT recall for arbitrary small-vocabulary corpora (which maximize
    shared shingles and tie-heavy frequency orders — the regime where a
    subtle prefix-length off-by-one would surface)."""
    from itertools import combinations

    from etl_pipeline_orchestration_spark.operators.dedup import (
        jaccard_all_pairs_prefix,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id_a"], r["id_b"]): r["intersect_size"]
        for r in jaccard_all_pairs_prefix(docs, threshold=threshold).collect()
    }

    def shingles(toks):
        if len(toks) < 3:
            return set()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {i: shingles(t) for i, t in enumerate(token_lists)}
    want = {}
    for a, b in combinations(sorted(sets), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        if inter / len(sa | sb) >= threshold:
            want[(a, b)] = inter
    assert got == want


@given(
    a=st.integers(min_value=-(10**15), max_value=10**15),
    b=st.integers(min_value=1, max_value=10**12),
)
@settings(max_examples=200, deadline=None)
def test_trunc_div_matches_duckdb_integer_division(a, b):
    """The classifier's update divisor must be DuckDB's `//` (truncate
    toward zero) for any sign of gradient — Python's floor `//` differs
    on negatives, which would silently diverge every trained weight."""
    import duckdb

    from etl_pipeline_orchestration_spark.operators.classifier import _trunc_div

    want = duckdb.sql(f"SELECT CAST({a} AS BIGINT) // CAST({b} AS BIGINT)").fetchone()[0]
    assert _trunc_div(a, b) == int(want)


@given(
    positions=st.lists(
        st.integers(min_value=0, max_value=(1 << 15) - 1),
        min_size=1, max_size=400,
    ),
    probe=st.integers(min_value=0, max_value=(1 << 15) - 1),
)
@settings(max_examples=100, deadline=None)
def test_bloom_pack_has_no_false_negatives(positions, probe):
    """Every packed bit is readable back (the no-false-negative
    invariant the bloom index rests on); bits never set read as
    absent unless they collide with a set one."""
    import pandas as pd

    from etl_pipeline_orchestration_spark.operators.bloom_index import _pack_bitmap

    m_bits = 1 << 15
    pdf = pd.DataFrame({"part": ["p"] * len(positions), "bit": positions})
    packed = _pack_bitmap(m_bits)(pdf)["bloom"].iloc[0]
    for p in positions:
        assert packed[p >> 3] & (1 << (p & 7)), p
    if probe not in set(positions):
        # absent bits MAY collide within a byte but only at the exact
        # bit position of a set one — check the precise bit
        assert not (packed[probe >> 3] & (1 << (probe & 7))) or any(
            q == probe for q in positions
        )


@given(
    y=st.integers(min_value=1995, max_value=1999),
    m=st.integers(min_value=1, max_value=12),
    d=st.integers(min_value=1, max_value=28),
    as_datetime_stats=st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_align_bound_is_order_preserving(y, m, d, as_datetime_stats):
    """Zone-map bound alignment never changes which side of a stat a
    bound falls on: aligning a DATE probe to TIMESTAMP stats widens to
    midnight, matching SQL coercion."""
    import datetime as dt

    from etl_pipeline_orchestration_spark.operators.bloom_index import _align_bound

    bound = dt.date(y, m, d)
    if as_datetime_stats:
        sample = dt.datetime(1997, 6, 15, 12, 30)
        aligned = _align_bound(bound, sample)
        assert isinstance(aligned, dt.datetime)
        assert aligned == dt.datetime(y, m, d, 0, 0)
    else:
        sample = dt.date(1997, 6, 15)
        aligned = _align_bound(bound, sample)
        assert aligned == bound
