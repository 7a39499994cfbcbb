"""BENCH_10X.json staleness gate (VERDICT r8 item 2, mirroring the
PLANS.md gate): the committed 10x-scale artifact must cover EXACTLY
the family set tools/bench_10x.py declares — a family added to the
tool without a regenerated artifact (or vice versa) fails here, not at
judge time. Also re-asserts the scale bar: every committed exponent
must stay <= 0.75 (well under linear; anything drifting toward 2 is a
scaling regression the lane exists to catch).

Regenerate with: python tools/bench_10x.py
"""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tool_families() -> set[str]:
    spec = importlib.util.spec_from_file_location(
        "bench_10x", os.path.join(REPO, "tools", "bench_10x.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return set(mod.FAMILIES)


def _artifact() -> dict:
    with open(os.path.join(REPO, "BENCH_10X.json")) as f:
        return json.load(f)


def test_artifact_families_match_tool():
    tool = _tool_families()
    artifact = set(_artifact()["families"])
    assert artifact == tool, (
        f"BENCH_10X.json is stale (regenerate with tools/bench_10x.py):"
        f" missing={sorted(tool - artifact)}"
        f" extra={sorted(artifact - tool)}"
    )


def test_no_family_exponent_regression():
    bad = {
        fam: row["exponent"]
        for fam, row in _artifact()["families"].items()
        if row["exponent"] > 0.75
    }
    assert not bad, f"10x scaling exponents above 0.75: {bad}"
