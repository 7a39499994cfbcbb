"""Integration test for the partitioned JDBC path (sources/readers.py:
read_finance_jdbc) against embedded Apache Derby — the one JDBC engine
whose driver ships inside the PySpark distribution, so the at-scale SQL
source path executes in CI without a database server. Skips cleanly if
the Derby jars ever disappear from the runtime.
"""

from __future__ import annotations

import pytest

from etl_pipeline_orchestration_spark.sources.readers import read_finance_jdbc

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
        return True
    except Exception:
        return False


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    if not _derby_available(spark):
        pytest.skip("embedded Derby driver not on the Spark classpath")
    db = tmp_path_factory.mktemp("derby") / "financedb"
    url = f"jdbc:derby:{db};create=true"
    # seed via Spark's own JDBC writer (round-trips the write path too)
    rows = spark.range(1000).selectExpr(
        "CAST(id AS INT) AS transaction_id",
        "CAST(id % 50 AS INT) AS account_id",
        "CAST(id AS DOUBLE) / 4 AS amount",
        "CASE WHEN id % 2 = 0 THEN 'debit' ELSE 'credit' END AS kind",
    )
    rows.write.format("jdbc").option("url", url).option(
        "dbtable", "transactions"
    ).mode("overwrite").save()
    return url


def test_partitioned_jdbc_read_matches_seed(spark, derby_url):
    df = read_finance_jdbc(
        spark,
        derby_url,
        "transactions",
        properties={},
        partition_column="transaction_id",
        num_partitions=8,
        lower_bound=0,
        upper_bound=1000,
    )
    # the scan must actually be split into range-bounded partitions
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    agg = df.groupBy("kind").count().collect()
    assert {r["kind"]: r["count"] for r in agg} == {"debit": 500, "credit": 500}
    total = df.agg({"amount": "sum"}).head()[0]
    assert total == pytest.approx(sum(i / 4 for i in range(1000)))


def test_unpartitioned_jdbc_read_single_cursor(spark, derby_url):
    df = read_finance_jdbc(spark, derby_url, "transactions", properties={})
    assert df.rdd.getNumPartitions() == 1  # serial cursor, documented path
    assert df.count() == 1000
