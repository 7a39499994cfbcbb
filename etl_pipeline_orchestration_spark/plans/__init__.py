from etl_pipeline_orchestration_spark.plans.registry import (
    QUERIES,
    ORACLES,
    query,
)

__all__ = ["QUERIES", "ORACLES", "query"]
