"""CLI entry point: ``python -m etl_pipeline_orchestration_spark``.

Runs the full six-source pipeline — the Spark equivalent of the
reference's ``python etl_pipeline.py`` main path (reference
etl_pipeline.py:354-359): generate/refresh landing files, run
extract → clean → transform → load for every source concurrently,
append health metrics, print the run summary.

Options via env vars (keeps the zero-dependency invocation):
  ETL_LANDING_DIR    landing-file directory (default: repo .landing/v1)
  ETL_WAREHOUSE_DIR  warehouse output (default: ./warehouse)
  ETL_SEQUENTIAL=1   run sources serially like the reference
  ETL_SQLITE_COMPAT=1  apply the reference's load-time type coercion
"""

from __future__ import annotations

import os
import sys

from etl_pipeline_orchestration_spark.orchestrator import (
    ETLOrchestrator,
    default_sources,
)
from etl_pipeline_orchestration_spark.session import get_spark
from etl_pipeline_orchestration_spark.sources import landing


def main() -> int:
    landing_dir = os.environ.get("ETL_LANDING_DIR", landing.LANDING_DIR)
    warehouse_dir = os.environ.get("ETL_WAREHOUSE_DIR", "warehouse")
    spark = get_spark("etl_pipeline_orchestration")
    paths = landing.ensure_landing(landing_dir)
    orch = ETLOrchestrator(
        spark,
        default_sources(paths),
        warehouse_dir,
        parallel=os.environ.get("ETL_SEQUENTIAL") != "1",
        sqlite_compat=os.environ.get("ETL_SQLITE_COMPAT") == "1",
    )
    run = orch.run_pipeline()
    return 0 if run.uptime_pct == 100.0 else 1


if __name__ == "__main__":
    sys.exit(main())
