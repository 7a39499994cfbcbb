"""Oracle output-column types must be Arrow-portable.

Round-10/11 driver hash-fails (`decision_tree_histogram_splits`,
`gbt_stump_boosting`) were ultimately a fetch-path type defect: DuckDB
types ``sum(BIGINT)`` (aggregate OR window) as HUGEINT, which
``fetchall()`` renders as a Python ``int`` (so the in-repo mirror
passed) but Arrow renders as ``decimal128(38,0)`` — so any driver that
fetches through Arrow/pandas hashes ``Decimal('3542')`` against Spark's
int64 ``3542`` and fails, with rows and schema still matching. The only
five oracles in the r11 registry emitting HUGEINT output columns were
exactly the two driver-red rows plus their three latent twins.

Rule, enforced over EVERY registered oracle by *binding* (not
executing) it in DuckDB against the sf0.001 views: no output column may
type HUGEINT or UHUGEINT — re-cast the offending expression with
``CAST(... AS BIGINT)`` in the final SELECT. Binding resolves the full
type tree without running the query, so this lint is cheap enough to
run in the default (non-slow) suite.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from etl_pipeline_orchestration_spark.plans import registry as R

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

FORBIDDEN = {"HUGEINT", "UHUGEINT"}


@pytest.fixture(scope="module")
def con():
    # Some pipeline oracles embed literal .landing/v1/oracle parquet
    # paths; binding them requires the (idempotent, deterministic)
    # landing zone to exist — a fresh checkout doesn't have it yet.
    from etl_pipeline_orchestration_spark.sources.landing import ensure_landing

    ensure_landing()
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def hugeint_outputs(con, sql: str) -> list[str]:
    """Bind ``sql`` and return the output columns typing (U)HUGEINT."""
    rel = con.sql(sql)  # lazy relation: .types binds without executing
    return [
        name
        for name, typ in zip(rel.columns, rel.types)
        if str(typ).upper() in FORBIDDEN
    ]


def test_no_hugeint_output_columns(con):
    R.load_all()
    bad: list[str] = []
    for name, sql in R.ORACLES.items():
        cols = hugeint_outputs(con, sql)
        if cols:
            bad.append(f"{name}: {cols}")
    assert not bad, (
        "oracle output columns type HUGEINT — Arrow fetch renders these "
        "as decimal128(38,0) and the driver hash-fails against Spark's "
        "int64; CAST(... AS BIGINT) in the final SELECT:\n"
        + "\n".join(bad)
    )


def test_lint_catches_seeded_hugeint(con):
    # sum(BIGINT) as aggregate and as window fn both type HUGEINT
    assert hugeint_outputs(
        con, "SELECT sum(o_custkey) AS s FROM orders"
    ) == ["s"]
    assert hugeint_outputs(
        con,
        "SELECT sum(o_custkey) OVER () AS s FROM orders LIMIT 1",
    ) == ["s"]
    # the prescribed fix passes
    assert not hugeint_outputs(
        con, "SELECT CAST(sum(o_custkey) AS BIGINT) AS s FROM orders"
    )
    # count(*) is plain BIGINT — not flagged
    assert not hugeint_outputs(con, "SELECT count(*) AS n FROM orders")
