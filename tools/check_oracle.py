"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column names, and
order-insensitive values (exact match after normalization). Queries with
no oracle get a rows-only check (runs + row count printed).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, "/root/repo")

from etl_pipeline_orchestration_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_val(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Full precision, sign-of-zero preserving: the driver's hash
        # distinguishes -0.0 from 0.0 (round-1 lesson — customer_churn_labels
        # failed there while a +0.0-collapsing mirror passed), so the mirror
        # must be at least as strict.
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_val(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return bool(v)
    return v


def norm_rows(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def run_sweep(sf_dir: str, only: set[str] | None = None, spark=None) -> dict:
    """Run the full differential sweep; returns
    ``{"pass": n, "rows_only": n, "fail": n, "failures": [names]}``.
    Reusable from pytest (pass the test session as ``spark``) so the
    registry-wide gate runs in-repo every round, not just when the
    driver samples."""
    only = only or set()
    if spark is None:
        spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            n_fail += 1
            continue
        ok = True
        msgs = []
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        if len(srows) != len(drows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if ok:
            sn = norm_rows(srows, scols)
            dn = norm_rows(drows, dcols)
            if sn != dn:
                ok = False
                diff = [
                    (a, b) for a, b in zip(sn, dn) if a != b
                ][:3]
                msgs.append(f"values differ; first diffs: {diff}")
        if ok:
            print(f"PASS  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + " | ".join(msgs))
            failures.append(name)
            n_fail += 1
    print(
        f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail"
        + (f" → {failures}" if failures else "")
    )
    return {
        "pass": n_pass,
        "rows_only": n_rows_only,
        "fail": n_fail,
        "failures": failures,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = set(sys.argv[2:])
    # --window composes with explicit names (ADVICE r12: it used to be
    # recognized only as the sole argument and was otherwise silently
    # filtered away as an unknown query name). Any other dash-prefixed
    # token is an error, not a query name.
    if "--window" in names:
        names.discard("--window")
        from etl_pipeline_orchestration_spark.plans import registry

        registry.load_all()
        names |= set(registry.CERTIFICATION_WINDOW)
    unknown_flags = sorted(n for n in names if n.startswith("-"))
    if unknown_flags:
        print(f"unrecognized flags: {unknown_flags}", file=sys.stderr)
        return 2
    result = run_sweep(sf_dir, names)
    return 1 if result["fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
