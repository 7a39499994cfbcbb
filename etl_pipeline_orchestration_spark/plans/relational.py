"""Relational operator coverage [EXT]: joins, aggregates, windows, sorts,
set ops, scalar functions (SURVEY.md §2.5-2.9).

Scale discipline:
* Fixed-size dims (region/nation) are always ``F.broadcast`` — no shuffle.
* Fact-fact joins shuffle on their keys; AQE handles skew/coalescing.
* Top-k is ``orderBy().limit(k)`` → Spark plans TakeOrderedAndProject
  (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.plans.registry import query
from etl_pipeline_orchestration_spark.sources.tables import load_table


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
             AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < DATE '1998-06-01'
      AND l_shipdate > DATE '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (o_orderpriority standing in for the corpus's
    missing o_shippriority): selective filters pushed to all three scans,
    two key joins, aggregate, top-10 with full deterministic tiebreak."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("date")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: every predicate pushes to the parquet scan; the
    whole query is one codegen'd scan + scalar aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("date"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "join_revenue_by_region",
    oracle="""
    SELECT r.r_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def join_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact-fact shuffle joins on keys, fixed-size dims
    broadcast (nation/region never exceed 25/5 rows at any SF)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c, orders o, lineitem l, supplier s, nation n, region r
    WHERE c.c_custkey = o.o_custkey
      AND l.l_orderkey = o.o_orderkey
      AND l.l_suppkey = s.s_suppkey
      AND c.c_nationkey = s.s_nationkey
      AND s.s_nationkey = n.n_nationkey
      AND n.n_regionkey = r.r_regionkey
      AND r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join with the customer-nation =
    supplier-nation locality condition; region filter prunes through two
    broadcast dims before the fact joins."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "semi_join_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "window_top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ranking window — single shuffle on the
    partition key; deterministic tiebreak on o_orderkey."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "window_lag_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(datediff('day',
             lag(o_orderdate) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey),
             o_orderdate) AS INT) AS gap_days
    FROM orders
    """,
)
def window_lag_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias(
            "gap_days"
        ),
    )


@query(
    "window_running_revenue",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_price
    FROM lineitem
    """,
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame (rowsBetween) per supplier."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_extendedprice").over(w), 2).alias("running_price"),
    )


@query(
    "order_count_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: double aggregation — orders per customer, then
    the histogram of those counts (zero-order customers included via the
    outer join)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "scalar_subquery_above_avg_parts",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
    """,
)
def scalar_subquery_above_avg_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery through the SQL front door: Catalyst plans the
    uncorrelated subquery as a one-row broadcast, exactly like the
    hand-built two-phase quantile pattern."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_sq")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part_sq
        WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part_sq)
        """
    )


@query(
    "window_ntile_percent_rank",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INT) AS price_quartile,
           round(percent_rank() OVER w * 1000000) / 1000000 AS pct_rank
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows (ntile quartiles + percent_rank) over a
    global ordering — computed with the DISTRIBUTED exact-rank operator
    (operators/ranking.py): quantile-cutpoint bucketing → parallel
    per-bucket row_number → literal prefix-sum offsets. Same exact
    output as the unpartitioned window (the oracle is unchanged), but
    the plan has no single-partition exchange: at 100 TB the sort runs
    B-way parallel instead of on one task. ntile/percent_rank are then
    pure integer arithmetic on the global row number (strict total
    order via the o_orderkey tiebreak makes row_number == rank)."""
    from etl_pipeline_orchestration_spark.operators import ranking

    orders = load_table(spark, sf_dir, "orders")
    ranked, n = ranking.append_global_row_number(
        orders,
        [F.col("o_totalprice"), F.col("o_orderkey")],
        F.col("o_totalprice"),
        out_col="__rn",
    )
    return ranked.select(
        "o_orderkey",
        ranking.ntile_from_row_number(F.col("__rn"), n, 4).alias(
            "price_quartile"
        ),
        (
            F.round(
                ranking.percent_rank_from_row_number(F.col("__rn"), n)
                * 1_000_000
            )
            / 1_000_000
        ).alias("pct_rank"),
    )


@query(
    "rollup_qty_by_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_qty_by_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "cube_orders_priority_status",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           round(sum(o_totalprice), 2) AS total,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def cube_orders_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderpriority", "o_orderstatus").agg(
        F.round(F.sum("o_totalprice"), 2).alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "distinct_part_supp_counts",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def distinct_part_supp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "topk_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy().limit() → TakeOrderedAndProject: per-partition top-k then
    driver merge; no global sort at scale."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "set_ops_customer_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 1000
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    """,
)
def set_ops_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 1000).select("c_custkey")
    negative = cust.filter(F.col("c_acctbal") < 0).select("c_custkey")
    return building.intersect(rich).union(negative).distinct()


@query(
    "string_functions_part",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           lower(p_brand) AS brand_lower,
           trim(p_type) AS type_trim,
           substring(p_type, 1, 5) AS type_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           CAST(len(string_split(p_type, ' ')) AS INT) AS type_words
    FROM part
    """,
)
def string_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.trim("p_type").alias("type_trim"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.size(F.split("p_type", " ")).alias("type_words"),
    )


@query(
    "date_functions_orders",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
                AS INT) AS days_since_95
    FROM orders
    """,
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
    )


@query(
    "json_extract_events",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(avg(value), 4) AS avg_value,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-string property extraction (events.props) — reference web-log
    analogue with semi-structured payloads."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.sum(F.get_json_object("props", "$.k").cast("int").cast("long")).alias(
            "sum_k"
        ),
    )


@query(
    "left_outer_join_customer_order_stats",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           round(sum(o.o_totalprice), 2) AS total_spent
    FROM customer c
    LEFT OUTER JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def left_outer_join_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count 0, sum NULL)
    — SURVEY §2.6 outer-join row. Shuffle join on the key; AQE may flip
    to broadcast when the build side is small at runtime."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
    )


@query(
    "right_outer_join_part_usage",
    oracle="""
    SELECT p.p_partkey, p.p_brand,
           CAST(count(l.l_orderkey) AS BIGINT) AS n_uses
    FROM lineitem l
    RIGHT OUTER JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_brand
    """,
)
def right_outer_join_part_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join: every part retained, zero-use parts included."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey, "right_outer")
        .groupBy("p_partkey", "p_brand")
        .agg(F.count("l_orderkey").alias("n_uses"))
    )


@query(
    "full_outer_join_monthly_activity",
    oracle="""
    WITH om AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    sm AS (
      SELECT strftime(l_shipdate, '%Y-%m') AS month,
             CAST(count(*) AS BIGINT) AS n_ships
      FROM lineitem GROUP BY 1
    )
    SELECT COALESCE(om.month, sm.month) AS month, om.n_orders, sm.n_ships
    FROM om FULL OUTER JOIN sm ON om.month = sm.month
    """,
)
def full_outer_join_monthly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two monthly aggregates (ship months extend past
    order months, so both null sides occur). Aggregate-then-join: the
    join input is tiny regardless of fact size."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    om = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    sm = li.groupBy(F.date_format("l_shipdate", "yyyy-MM").alias("month")).agg(
        F.count(F.lit(1)).alias("n_ships")
    )
    return om.join(sm, om.month == sm.month, "full_outer").select(
        F.coalesce(om.month, sm.month).alias("month"), "n_orders", "n_ships"
    )


@query(
    "except_all_multi_order_customers",
    oracle="""
    SELECT o_custkey FROM orders
    EXCEPT ALL
    SELECT DISTINCT o_custkey FROM orders
    """,
)
def except_all_multi_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exceptAll (multiset difference — SURVEY §2.8): all-orders minus
    one-per-customer leaves one row per order beyond a customer's first,
    duplicates preserved."""
    orders = load_table(spark, sf_dir, "orders")
    all_keys = orders.select("o_custkey")
    return all_keys.exceptAll(all_keys.distinct())


@query(
    "math_functions_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - l_quantity * 1000) AS abs_diff,
           sqrt(l_extendedprice) AS price_sqrt,
           round(ln(l_extendedprice) * 10000) / 10000 AS price_ln,
           CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct_floor,
           CAST(ceil(l_tax * 100) AS BIGINT) AS tax_pct_ceil,
           CAST(sign(l_extendedprice - 30000.0) AS BIGINT) AS above_30k,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
    FROM lineitem
    """,
)
def math_functions_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function surface (SURVEY §2.9): abs/floor/ceil/sign/pmod are
    exact; sqrt is IEEE-correctly-rounded in both engines; ln is libm
    (last-ulp may differ between engines) so it alone is rounded."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000).alias("abs_diff"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.round(F.log("l_extendedprice") * 10000) / 10000).alias("price_ln"),
        F.floor(F.col("l_discount") * 100).alias("disc_pct_floor"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
        F.signum(F.col("l_extendedprice") - 30000.0).cast("long").alias("above_30k"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


@query(
    "map_functions_events",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_prop_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys_csv,
           event_type AS type_from_map
    FROM events
    """,
)
def map_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function surface (SURVEY §2.9): parse props into a real
    MapType, then map_keys/map_values/element_at/size; plus a constructed
    create_map probed with element_at."""
    ev = load_table(spark, sf_dir, "events")
    props_map = F.from_json("props", "map<string,bigint>")
    built = F.create_map(F.lit("type"), F.col("event_type"))
    return ev.select(
        "event_id",
        F.size(props_map).alias("n_prop_keys"),
        F.element_at(props_map, "k").alias("k_value"),
        F.concat_ws(",", F.array_sort(F.map_keys(props_map))).alias("prop_keys_csv"),
        F.element_at(built, "type").alias("type_from_map"),
    )


@query(
    "salted_agg_order_revenue",
    oracle="""
    SELECT o_custkey, round(sum(o_totalprice), 2) AS sum_totalprice
    FROM orders
    GROUP BY o_custkey
    """,
)
def salted_agg_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase aggregation (operators/skew.py): salt spreads
    each key over 16 sub-keys so no reduce task can receive a hot key's
    full volume; the oracle proves the result equals a direct group-by."""
    from etl_pipeline_orchestration_spark.operators.skew import salted_sum

    orders = load_table(spark, sf_dir, "orders")
    out = salted_sum(orders, ["o_custkey"], "o_totalprice", salt_factor=16)
    return out.select(
        "o_custkey", F.round("sum_o_totalprice", 2).alias("sum_totalprice")
    )


@query(
    "pivot_qty_by_status",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return pv


@query(
    "window_first_last_cume_dist",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           first_value(o_totalprice) OVER w AS first_price,
           last_value(o_totalprice)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_price,
           round(cume_dist() OVER w, 6) AS price_cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value (explicit full frame — last_value under
    the default frame is a famous footgun) / cume_dist, one shuffle on
    custkey shared by all three window functions (same partitioning +
    ordering → single Window physical operator)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume_dist"),
    )


@query("approx_distinct_sketch")  # HLL estimate — engine-specific, rows-only
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per returnflag: the O(1)-memory
    path for COUNT(DISTINCT) at 100 TB (exact distinct shuffles every
    distinct value; the sketch merges 16 KB registers commutatively, so
    the result is deterministic under any partitioning). Estimates are
    engine-specific — DuckDB's HLL gives different values — so this is a
    rows-only entry; tests/test_sketches.py pins the ≤2 % relative error
    against the exact count."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.01).alias(
                "approx_distinct_orders"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query("approx_quantile_sketch")  # GK/KLL-style estimate — engine-specific, rows-only
def approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: p50/p90/p99 of order value via
    ``approx_percentile`` (Spark's Greenwald-Khanna variant, accuracy
    1/10000). Like the HLL entry, the estimate is engine-specific —
    no DuckDB oracle; tests/test_sketches.py bounds the error against
    the exact distributed quantile. The sketch aggregates with
    map-side partial merge: constant memory per executor at any scale
    — the 100 TB replacement for the exact percentile's
    buffer-everything behavior."""
    q = (
        load_table(spark, sf_dir, "orders")
        .agg(
            F.expr(
                "approx_percentile(o_totalprice, array(0.5, 0.9, 0.99), 10000)"
            ).alias("qs")
        )
        .select(
            F.col("qs")[0].alias("p50"),
            F.col("qs")[1].alias("p90"),
            F.col("qs")[2].alias("p99"),
        )
    )
    return q
