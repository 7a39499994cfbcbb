from etl_pipeline_orchestration_spark.functions.scalar import (
    coerce_numeric,
    cut,
    month_bucket,
    safe_divide,
    with_global_quantile_flag,
)

__all__ = [
    "coerce_numeric",
    "cut",
    "month_bucket",
    "safe_divide",
    "with_global_quantile_flag",
]
