"""Warehouse-grade relational anchors [EXT]: further TPC-H-shaped
queries (correlated EXISTS, group-by-HAVING semi-join, 4-table star
top-k), CDC merge, and unpivot.

Scale discipline matches plans/relational.py: fixed dims broadcast,
fact-fact joins shuffle on keys, top-k via orderBy().limit() →
TakeOrderedAndProject, aggregates pushed below joins where semantics
allow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.operators import cdc
from etl_pipeline_orchestration_spark.plans.registry import query
from etl_pipeline_orchestration_spark.sources.tables import load_table


@query(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= DATE '1998-01-01' AND o_orderdate < DATE '1998-07-01'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue this half-year.

    Plan: date filter pushed to the orders scan and returnflag filter to
    the lineitem scan (both reach PushedFilters); orders⋈lineitem
    shuffles on orderkey, the result shuffles once more on custkey into
    customer; 25-row nation is broadcast. Top-20 on the ROUNDED revenue
    with a custkey tiebreak → TakeOrderedAndProject, deterministic under
    float summation-order differences.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(qty.sum_qty, 2) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
          GROUP BY l_orderkey HAVING sum(l_quantity) > 280) qty
      ON o_orderkey = qty.l_orderkey
    """,
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold.

    Plan: the lineitem aggregate runs FIRST (map-side partial sums →
    one shuffle on orderkey) and its HAVING filter shrinks the join
    input to a few hundred keys per million orders; the filtered
    aggregate then joins orders on the same orderkey partitioning
    (AQE turns it into a broadcast join at sf0.1 sizes) and customer
    joins on custkey. No window, no second pass over lineitem.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders")
    qty = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty__"))
        .filter(F.col("__qty__") > 280)
        .select("l_orderkey", F.round("__qty__", 2).alias("sum_qty"))
    )
    return (
        orders.join(qty, orders.o_orderkey == qty.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


@query(
    "tpch_q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1998-01-01' AND o_orderdate < DATE '1998-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_discount >= 0.06 AND l_quantity > 30)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (correlated EXISTS): priority distribution of
    orders that have at least one heavily-discounted bulk line.

    Plan: EXISTS compiles to a LEFT SEMI join — the lineitem side is
    filtered BEFORE the join (predicate pushdown to the scan) and the
    semi join short-circuits per key, never materializing match
    multiplicity. One shuffle on orderkey, then a tiny hash aggregate
    on the 5 priority values.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    bulk = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_discount") >= 0.06) & (F.col("l_quantity") > 30)
    )
    return (
        orders.join(bulk, orders.o_orderkey == bulk.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "cdc_merge_orders",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, o_custkey, 'P' AS o_orderstatus,
             o_totalprice + 100.0 AS o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 3
    ),
    ins AS (
      SELECT o_orderkey + 1000000000 AS o_orderkey, o_custkey,
             'N' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 5
    ),
    kept AS (
      SELECT * FROM orders WHERE o_orderkey % 10 NOT IN (3, 7)
    )
    SELECT * FROM kept
    UNION ALL SELECT * FROM upd
    UNION ALL SELECT * FROM ins
    """,
)
def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (operators/cdc.py) on a deterministic
    synthetic changes feed derived from orders: keys ≡3 (mod 10) are
    updated (+100.0 price, status P — exact in fp64, no rounding trap),
    ≡7 deleted, and ≡5 spawn an insert under a shifted key. The oracle
    states the same post-merge relation in plain SQL; the Spark side
    exercises the generic single-shuffle full-outer merge operator.
    """
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 10
    updates = orders.filter(k == 3).select(
        "o_orderkey",
        "o_custkey",
        F.lit("P").alias("o_orderstatus"),
        (F.col("o_totalprice") + 100.0).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
        F.lit("U").alias("op"),
    )
    deletes = orders.filter(k == 7).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        F.lit("D").alias("op"),
    )
    inserts = orders.filter(k == 5).select(
        (F.col("o_orderkey") + 1000000000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        F.lit("I").alias("op"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)
    return cdc.apply_changes(orders, changes, key="o_orderkey")


@query(
    "unpivot_part_measures",
    oracle="""
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value
    FROM part
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt). Narrow per-row operator — no shuffle,
    stays inside whole-stage codegen, output is 2× input rows with 3
    columns (column-pruned scan reads only the 3 source columns)."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        "p_retailprice",
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@query(
    "cdc_envelope_apply",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 10 = 0
    ), env AS (
      SELECT '{"op":"c","seq":1,"key":' || CAST(k AS VARCHAR)
             || ',"price_cents":' || CAST(cents AS VARCHAR) || '}' AS payload
      FROM base
      UNION ALL
      SELECT '{"op":"u","seq":2,"key":' || CAST(k AS VARCHAR)
             || ',"price_cents":' || CAST(cents + 150 AS VARCHAR) || '}'
      FROM base WHERE k % 3 = 0
      UNION ALL
      SELECT '{"op":"d","seq":3,"key":' || CAST(k AS VARCHAR) || '}'
      FROM base WHERE k % 7 = 0
    ), parsed AS (
      SELECT json_extract_string(payload, '$.op') AS op,
             CAST(json_extract(payload, '$.seq') AS INT) AS seq,
             CAST(json_extract(payload, '$.key') AS BIGINT) AS k,
             CAST(json_extract(payload, '$.price_cents') AS BIGINT)
               AS price_cents
      FROM env
    ), latest AS (
      SELECT k, op, seq, price_cents,
             row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS rn,
             CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n_events
      FROM parsed
    )
    SELECT k AS o_orderkey, price_cents, op AS last_op, n_events
    FROM latest WHERE rn = 1 AND op <> 'd'
    """,
)
def cdc_envelope_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-style CDC ENVELOPE decoding + apply: change events
    arrive as JSON envelopes carrying (op, seq, key, after-payload);
    the consumer parses them (from_json — the F6 surface doing real
    protocol work), takes the latest op per key by sequence, and
    materializes the surviving state (create/update wins, delete
    removes). Envelope strings are CONSTRUCTED identically on both
    engines (integer-only fields — float formatting would diverge)
    from a deterministic orders-derived feed, so the JSON parse, the
    sequence semantics, and the tombstone handling are all
    hash-certified.

    100 TB shape: narrow parse + one window shuffle on the key —
    identical to the streaming upsert's per-batch merge; at scale the
    same decode feeds streaming/upsert.py's sequence-aware merge
    instead of a window."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    j = F.concat
    creates = base.select(
        j(
            F.lit('{"op":"c","seq":1,"key":'), F.col("k").cast("string"),
            F.lit(',"price_cents":'), F.col("cents").cast("string"), F.lit("}"),
        ).alias("payload")
    )
    updates = base.filter(F.col("k") % 3 == 0).select(
        j(
            F.lit('{"op":"u","seq":2,"key":'), F.col("k").cast("string"),
            F.lit(',"price_cents":'), (F.col("cents") + 150).cast("string"),
            F.lit("}"),
        ).alias("payload")
    )
    deletes = base.filter(F.col("k") % 7 == 0).select(
        j(
            F.lit('{"op":"d","seq":3,"key":'), F.col("k").cast("string"),
            F.lit("}"),
        ).alias("payload")
    )
    env = creates.unionByName(updates).unionByName(deletes)
    parsed = env.select(
        F.from_json(
            "payload", "op string, seq int, key bigint, price_cents bigint"
        ).alias("e")
    ).select(
        F.col("e.op").alias("op"),
        F.col("e.seq").alias("seq"),
        F.col("e.key").alias("k"),
        F.col("e.price_cents").alias("price_cents"),
    )
    w = Window.partitionBy("k")
    latest = parsed.select(
        "k", "op", "price_cents",
        F.row_number().over(w.orderBy(F.desc("seq"))).alias("rn"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_events"),
    )
    return latest.filter((F.col("rn") == 1) & (F.col("op") != "d")).select(
        F.col("k").alias("o_orderkey"),
        "price_cents",
        F.col("op").alias("last_op"),
        "n_events",
    )
