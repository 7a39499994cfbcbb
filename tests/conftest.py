from __future__ import annotations

import pytest

from etl_pipeline_orchestration_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    """One shared local session; small parallelism keeps test latency low
    (tiny frames shuffle in 4 partitions, not 32)."""
    spark = get_spark(
        "etl_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.execution.arrow.pyspark.fallback.enabled": "true"},
    )
    yield spark
