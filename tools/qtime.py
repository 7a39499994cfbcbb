"""Per-query isolation bench + plan capture for the optimization rounds.

Times each named query with the same protocol as bench.py (noop sink,
min-of-reps) in an otherwise idle session, and optionally writes
``explain("formatted")`` to plans/<tag>/<query>_<suffix>.txt.

Usage:
  python tools/qtime.py [--sf DIR] [--reps N] [--plans TAG:SUFFIX] q1 q2 ...

Examples:
  python tools/qtime.py suffix_array_ranks_docs
  python tools/qtime.py --plans r13:before suffix_array_ranks_docs
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 3
    plans_tag = None
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            i += 1
            sf_dir = args[i]
        elif a == "--reps":
            i += 1
            reps = int(args[i])
        elif a == "--plans":
            i += 1
            plans_tag = args[i]
        else:
            names.append(a)
        i += 1

    from etl_pipeline_orchestration_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("qtime")
    qs = entrymod.queries()

    # Same warm-up as bench.py.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict[str, float | None] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(f"qtime: unknown query {name}", file=sys.stderr)
            out[name] = None
            continue
        if plans_tag:
            tag, suffix = plans_tag.split(":", 1)
            pdir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "plans",
                tag,
            )
            os.makedirs(pdir, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(os.path.join(pdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(f"qtime:{name}")
        try:
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            out[name] = round(best, 3)
        except Exception as e:
            print(f"qtime: {name} failed: {e}", file=sys.stderr)
            out[name] = None
        finally:
            spark.sparkContext.setJobDescription(None)
        print(f"{name}\t{out[name]}", flush=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
