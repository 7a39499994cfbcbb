"""Query registry: the driver-facing correctness surface.

Every implemented operator gets a named entry: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) an
equivalent DuckDB oracle SQL string over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings). Column names/types are aligned on both sides — the driver's
compare sorts columns by name and hashes values.

Float discipline: any column whose value depends on float summation order
is ``round()``ed identically on both sides, since Spark's partial
aggregation and DuckDB's single-node sum associate differently in ulps.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (the driver then records a weaker rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import etl_pipeline_orchestration_spark.plans.reference_parity  # noqa: F401
    import etl_pipeline_orchestration_spark.plans.relational  # noqa: F401
    import etl_pipeline_orchestration_spark.plans.llm_data  # noqa: F401
    import etl_pipeline_orchestration_spark.plans.windows_streams  # noqa: F401
    import etl_pipeline_orchestration_spark.plans.pipeline_sources  # noqa: F401
    import etl_pipeline_orchestration_spark.plans.udf_surface  # noqa: F401
    import etl_pipeline_orchestration_spark.plans.warehouse_ops  # noqa: F401
    import etl_pipeline_orchestration_spark.plans.tpch_extra  # noqa: F401
    import etl_pipeline_orchestration_spark.plans.analytics_ext  # noqa: F401
    import etl_pipeline_orchestration_spark.plans.tpch_partsupp  # noqa: F401
    import etl_pipeline_orchestration_spark.plans.corpus_ops  # noqa: F401
