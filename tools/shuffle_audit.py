"""Measured shuffle audit: per-query shuffle/input/output BYTES from
the Spark REST API — evidence, not guesswork, for the "minimize
shuffles" design claims PLANS.md makes structurally.

PLANS.md counts Exchange operators in the plan; this tool runs every
headline query once and attributes the stages it created, summing
`shuffleWriteBytes` / `inputBytes` / `outputBytes` from
`/api/v1/applications/<id>/stages`. The ranking signal is ABSOLUTE
shuffle-write volume: those are the exchanges that dominate at 100 TB
and where the map-side-combine / broadcast shapes must hold. The
ratio column is context, not a verdict — inputBytes is compressed,
column-pruned parquet while shuffle bytes are row-format and often
over a DERIVED relation (exploded grams, window rows), so ratios far
above 1 are inherent for corpus expansion pipelines.

Writes SHUFFLE_AUDIT.json (per-query bytes + amplification, sorted by
shuffle volume). Run: python tools/shuffle_audit.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stages(ui: str, app_id: str) -> dict[int, dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        return {s["stageId"]: s for s in json.load(r)}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from etl_pipeline_orchestration_spark.session import get_spark
    import __spark_entry__ as entrymod
    from bench import HEADLINE

    spark = get_spark(
        "shuffle_audit",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    sc = spark.sparkContext
    ui = sc.uiWebUrl
    with urllib.request.urlopen(f"{ui}/api/v1/applications") as r:
        app_id = json.load(r)[0]["id"]
    qs = entrymod.queries()
    # warm the write path so setup stages don't bill to query 1
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    seen: set[int] = set(_stages(ui, app_id))
    for name in HEADLINE:
        fn = qs.get(name)
        if fn is None:
            continue
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # keep auditing the rest
            out[name] = {"error": str(e)[:120]}
            continue
        stages = _stages(ui, app_id)
        mine = [s for sid, s in stages.items() if sid not in seen]
        seen = set(stages)
        inp = sum(s.get("inputBytes", 0) for s in mine)
        shw = sum(s.get("shuffleWriteBytes", 0) for s in mine)
        shr = sum(s.get("shuffleReadBytes", 0) for s in mine)
        out[name] = {
            "input_mb": round(inp / 1e6, 2),
            "shuffle_write_mb": round(shw / 1e6, 2),
            "shuffle_read_mb": round(shr / 1e6, 2),
            "amplification": round(shw / inp, 3) if inp else None,
            "n_stages": len(mine),
        }

    ranked = dict(
        sorted(
            out.items(),
            key=lambda kv: -(kv[1].get("shuffle_write_mb") or 0),
        )
    )
    doc = {
        "metric": "shuffle_bytes_per_query",
        "sf_dir": sf_dir,
        "note": (
            "bytes via /api/v1 stage metrics, one run per query; ratio "
            "= shuffleWrite/input is context only (compressed pruned "
            "parquet vs row-format derived relations) - rank by "
            "absolute shuffle volume and cross-check PLANS.md"
        ),
        "queries": ranked,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "SHUFFLE_AUDIT.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
    worst = list(ranked.items())[:8]
    print(json.dumps({k: v for k, v in worst}, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
