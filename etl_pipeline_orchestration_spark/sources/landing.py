"""Landing-zone bootstrap for the six-source pipeline.

Generates the deterministic source datasets once (simulators.py, seeds
1-6) into a fixed landing directory, each in its native format for the
Spark readers, PLUS a parquet copy of each generated frame under
``oracle/`` so the DuckDB correctness oracle can query the identical
input the Spark pipeline consumed. Content is fully deterministic
(fixed seeds + fixed base clock), so regeneration is idempotent.
"""

from __future__ import annotations

import os

from etl_pipeline_orchestration_spark.sources import simulators

# Fixed absolute path: the oracle SQL strings registered at import time
# must embed a literal path the driver's DuckDB process can read.
LANDING_DIR = "/root/repo/.landing/v1"
ORACLE_DIR = os.path.join(LANDING_DIR, "oracle")

_GENERATORS = {
    "sales": simulators.gen_sales,
    "customers": simulators.gen_customers,
    "finance": simulators.gen_finance,
    "inventory": simulators.gen_inventory,
    "hr": simulators.gen_hr,
    "weblogs": simulators.gen_web_logs,
}


def oracle_path(name: str) -> str:
    return os.path.join(ORACLE_DIR, f"{name}.parquet")


def _write_oracle_copies() -> None:
    os.makedirs(ORACLE_DIR, exist_ok=True)
    for name, gen in _GENERATORS.items():
        gen().to_parquet(oracle_path(name), index=False)


def ensure_landing(landing_dir: str = LANDING_DIR) -> dict[str, str]:
    """Idempotently materialize landing files + oracle copies; returns
    {source_key: path} as produced by ``simulators.write_landing_files``."""
    marker = os.path.join(landing_dir, "_SUCCESS")
    if not os.path.exists(marker):
        paths = simulators.write_landing_files(landing_dir)
        if landing_dir == LANDING_DIR:
            _write_oracle_copies()
        with open(marker, "w") as f:
            f.write("\n".join(f"{k}={v}" for k, v in sorted(paths.items())))
        return paths
    with open(marker) as f:
        return dict(line.split("=", 1) for line in f.read().splitlines() if line)
