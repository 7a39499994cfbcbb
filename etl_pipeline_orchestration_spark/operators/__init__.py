"""Operator library: cleaning, transforms, dedup (exact / MinHash-LSH /
SimHash), similarity (brute-force / hyperplane-LSH / IVF), text
analysis, multimodal plumbing, skew salting, partition-shape helpers."""

from etl_pipeline_orchestration_spark.operators.cleaning import (  # noqa: F401
    CleanStats,
    clean_common,
)
from etl_pipeline_orchestration_spark.operators.partitioning import (  # noqa: F401
    ensure_min_partitions,
)
from etl_pipeline_orchestration_spark.operators.transforms import (  # noqa: F401
    TRANSFORMS,
    apply_transform,
)
