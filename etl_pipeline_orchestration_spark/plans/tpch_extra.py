"""Further TPC-H-shaped relational anchors [EXT]: Q7 (nation-pair
volume with a cross-table disjunction), Q12 shape (late-shipment
priority counts), Q14 (conditional-revenue ratio), Q19 (disjunctive
bracket-predicate join), Q22 shape (scalar-subquery threshold +
anti-join aggregate).

The synthetic tables carry a slimmed TPC-H schema (no l_shipmode /
l_receiptdate / c_phone / p_container / partsupp), so Q12/Q19/Q22 keep
the reference query's *plan shape* — the operator composition Catalyst
must handle — over the columns that exist; Q2/Q9/Q11/Q16/Q20 need
partsupp and are out of scope for this dataset.

Scale notes (100 TB discipline):
- nation is the only broadcast dim; fact-fact joins shuffle on their
  keys and aggregates are pushed below joins where semantics allow.
- Q19's disjunction stays a RESIDUAL on the partkey equi-join — the
  join itself is hash, never nested-loop.
- Q22's scalar average is one tiny agg broadcast into the filter, and
  the NOT EXISTS compiles to a left-anti shuffle join on custkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.plans.registry import query
from etl_pipeline_orchestration_spark.sources.tables import load_table


@query(
    "tpch_q7_nation_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: trade volume between a nation pair by year.

    Plan: the shipdate range is pushed to the lineitem scan; both
    25-row nation dims broadcast, so the nation-pair DISJUNCTION (it
    references columns from two different joins) evaluates as a cheap
    post-broadcast filter, never a shuffle. The two fact-fact joins
    (lineitem⋈orders on orderkey, ⋈customer on custkey) are the only
    shuffles; supplier joins on suppkey after lineitem is already
    date-pruned. Aggregate is a low-cardinality hash agg (2 nations ×
    2 years).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "tpch_q12_late_shipment_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
)
def tpch_q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority mix of lines shipped ≥30 days after
    their order (the dataset has no l_shipmode/l_receiptdate, so the
    late-shipment predicate plays the role of the receipt-date window).

    Plan: the shipdate year-range prunes the lineitem scan
    (PushedFilters); the cross-table lateness predicate evaluates as a
    join residual after the single orderkey shuffle; CASE-WHEN counts
    are integer partial aggregates — exact, no float parity risk.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_revenue_share",
    oracle="""
    SELECT CAST(round(
             sum(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             * 10000 / sum(l_extendedprice * (1 - l_discount))
           ) AS BIGINT) AS promo_revenue_bp
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of revenue from promotional parts in a month.

    Plan: one month of lineitem (scan-pruned) shuffle-joins part on
    partkey; a single hash agg computes both conditional and total
    sums in one pass. The ratio is emitted as integer BASIS POINTS
    (round(num*10000/den)): a division result rounded to a fraction
    can sit on a representable half-boundary where Spark's HALF_UP
    BigDecimal and DuckDB's double rounding disagree — rounding to an
    integer and KEEPING it integer sidesteps both that and -0.0.
    """
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                * 10000
                / F.sum(rev)
            )
            .cast("bigint")
            .alias("promo_revenue_bp")
        )
    )


@query(
    "tpch_q19_bracket_discounted_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 15)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50
           AND l_quantity BETWEEN 25 AND 50)
    """,
)
def tpch_q19_bracket_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue from three disjunctive (brand, size,
    quantity) brackets — the classic test that a disjunction OVER BOTH
    SIDES of a join stays a hash-join residual, not a nested loop.

    Plan: single-side conjuncts are pushed to each scan (Catalyst
    factors `p_brand IN (...)` to part and `l_quantity BETWEEN 1 AND
    50` to lineitem from the OR), the partkey equi-join is the only
    shuffle, and the full disjunction evaluates as the join residual.
    """
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    bracket = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 15)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 30)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 50)
        & F.col("l_quantity").between(25, 50)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(bracket)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


@query(
    "tpch_q22_idle_customer_balance",
    oracle="""
    WITH avg_bal AS (
      SELECT round(avg(c_acctbal) * 1000) / 1000 AS threshold
      FROM customer
      WHERE c_acctbal > 0.0
        AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, avg_bal
    WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
      AND c_acctbal > threshold
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_mktsegment
    """,
)
def tpch_q22_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers in chosen segments with
    no RECENT order (the dataset has no c_phone, so market segment
    plays the country-code role; every customer has *some* order here,
    so the idle predicate is date-scoped to keep the check
    non-vacuous).

    Plan: the scalar average is one tiny agg CROSS-JOINED (broadcast,
    1 row) into the filter — no recomputation per row; the NOT EXISTS
    compiles to a left-anti shuffle join on custkey against the orders
    key projection. The threshold is rounded to 3dp IDENTICALLY on
    both engines: avg() of doubles differs across engines in ulps, and
    an unrounded threshold could flip `>` for a customer within that
    ulp; 2dp-quantized balances can't straddle a 3dp-rounded boundary.
    """
    seg = F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING", "MACHINERY")
    cust = load_table(spark, sf_dir, "customer").filter(seg)
    thresh = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.round(F.avg("c_acctbal") * 1000) / 1000).alias("threshold")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(round(
             sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
             * 10000 / sum(volume)
           ) AS BIGINT) AS mkt_share_bp
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part, lineitem, orders, customer, nation n1, region,
           supplier, nation n2
      WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
        AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
        AND n1.n_regionkey = r_regionkey AND r_name = 'EUROPE'
        AND s_suppkey = l_suppkey AND s_nationkey = n2.n_nationkey
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's share of ECONOMY-part volume
    sold into Europe, by year — the deepest star in the suite that
    this schema supports (7 joins, two roles for nation).

    Plan: part is filtered to one type BEFORE joining (the most
    selective predicate drives the join order); customer→nation→region
    restricts the demand side; all four dims (part after filter,
    nation ×2, region, supplier at test SF) broadcast, so the only
    shuffles are lineitem⋈orders and the final year aggregate. Share
    emitted as integer basis points (division + fractional rounding is
    the cross-engine half-boundary trap).
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    ).select("r_regionkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_vol = F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(F.sum(nat_vol) * 10000 / F.sum(vol))
            .cast("bigint")
            .alias("mkt_share_bp")
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue — an
    aggregate reused by both a scalar-max subquery and the main query.

    Plan: the revenue aggregate is built once; its max is a 1-row agg
    cross-joined (broadcast) back as the filter threshold — Spark
    reuses the shuffle for both consumers (ReusedExchange), so
    lineitem is scanned once. Equality on the rounded revenue is safe:
    both consumers read the SAME rounded values. Returns all ties,
    like the reference query.
    """
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0 * 100) / 100 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p_partkey
      )
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost if below-fifth-of-average orders were
    dropped — the correlated-scalar-average shape.

    Plan: the correlation decorrelates to a per-part average aggregate
    (one shuffle on partkey over the UNFILTERED lineitem — the inner
    query sees all lines for the part) joined back on the same key;
    the brand filter prunes the part side before its join. The
    threshold 0.2·avg is identical IEEE arithmetic on both engines
    (integer-valued quantity sums divide exactly the same), so the
    comparison cannot flip. Output rounded with the scale-then-round
    guard (a /7 division result can sit on a half-boundary).
    """
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    avg_q = (
        li.groupBy(F.col("l_partkey").alias("ap_key"))
        .agg((F.lit(0.2) * F.avg("l_quantity")).alias("threshold"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_q, li.l_partkey == avg_q.ap_key)
        .filter(F.col("l_quantity") < F.col("threshold"))
        .agg(
            (F.round(F.sum("l_extendedprice") / 7.0 * 100) / 100).alias("avg_yearly")
        )
    )


@query(
    "intersect_all_priorities",
    oracle="""
    SELECT o_orderpriority FROM orders, customer
    WHERE o_custkey = c_custkey AND c_mktsegment = 'BUILDING'
    INTERSECT ALL
    SELECT o_orderpriority FROM orders, customer
    WHERE o_custkey = c_custkey AND c_mktsegment = 'MACHINERY'
    """,
)
def intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): priority values with
    their common multiplicity across two customer segments —
    completes the set-operator family next to union/intersect/
    except/exceptAll.

    Plan: Catalyst rewrites intersectAll as a count-compare aggregate
    + generator (min of per-side counts, re-expanded) — two shuffles
    on the value, never a pairwise join.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")

    def side(segment: str) -> DataFrame:
        return (
            orders.join(
                F.broadcast(cust.filter(F.col("c_mktsegment") == segment)),
                orders.o_custkey == F.col("c_custkey"),
            ).select("o_orderpriority")
        )

    return side("BUILDING").intersectAll(side("MACHINERY"))


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey
       AND o_orderpriority <> '4-NOT SPECIFIED'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the customer order-count distribution — how many
    customers placed exactly N qualifying orders, INCLUDING the
    zero-order customers the left outer join keeps. The dataset has no
    o_comment, so the reference's ``NOT LIKE '%special%requests%'``
    plays out as a priority exclusion with the same plan shape: the
    predicate lives in the outer join's ON clause (filtering the
    right side only), never in WHERE (which would silently turn the
    join inner and drop the zero bucket — the Q13 trap).

    Plan (100 TB shape): the order count is aggregated per custkey
    BELOW the outer join — count(o_orderkey) needs only o_custkey, so
    orders collapses from N rows to distinct-customer rows before any
    join, and the left join matches customer against the pre-counted
    relation with coalesce(cnt, 0) for the no-order bucket. One
    shuffle over the (priority-pruned, two-column) orders scan, one
    over customer, and a low-cardinality final agg on c_count —
    customer×orders rows are never materialized. Completes the
    22-query TPC-H suite (q1-q22 all registered).
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy(F.col("o_custkey"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
    )
