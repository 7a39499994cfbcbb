"""PySpark-native analytics / ETL engine.

A from-scratch rebuild of the capabilities of the reference pandas ETL
pipeline (``/root/reference/etl_pipeline.py``), re-expressed Spark-first:
lazy DataFrame plans, Catalyst optimization, shuffle-based scale-out,
columnar parquet I/O — plus the large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal columns).
"""

from etl_pipeline_orchestration_spark.session import get_spark

__all__ = ["get_spark"]
