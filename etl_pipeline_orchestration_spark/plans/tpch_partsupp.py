"""TPC-H partsupp-family anchors [EXT]: Q2, Q9, Q11, Q16, Q20 over a
DERIVED partsupp relation.

The synthetic corpus has no partsupp table, so these five queries —
the ones exercising min-cost correlated subqueries, profit attribution,
scalar-threshold HAVING, NOT-IN supplier exclusion, and the
excess-stock semi-join chain — would otherwise be untestable. The fix:
derive partsupp deterministically from part × a small index range with
pure integer arithmetic (4 suppliers per part, availqty/supplycost as
modular functions of the keys). Both engines compute the identical
relation from the identical expressions, so the DuckDB oracle checks
the QUERY logic, not a lucky data coincidence.

Scale notes: the derived ps is a generate-on-read relation (rows = 4 ×
part, no storage); every query below joins it on its keys exactly as a
stored partsupp would, so the plans generalize unchanged to a real
table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_pipeline_orchestration_spark.plans.registry import query
from etl_pipeline_orchestration_spark.sources.tables import load_table

# shared oracle CTE; {nsupp_sq} is the supplier-count scalar subquery
_PS_CTE = """
    ps AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey * 4 + t.i) % (SELECT count(*) FROM supplier)
               AS ps_suppkey,
             (p_partkey * 7 + t.i * 13) % 9999 + 1 AS ps_availqty,
             (p_partkey * 31 + t.i * 7) % 100000 AS ps_supplycost_cents,
             CAST((p_partkey * 31 + t.i * 7) % 100000 AS DOUBLE) / 100.0
               AS ps_supplycost
      FROM part, unnest(range(0, 4)) AS t(i)
    )
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp: 4 (supplier, availqty, supplycost) entries
    per part, all pure integer functions of (p_partkey, i) — identical
    on any engine. One narrow generate over the part scan."""
    nsupp = load_table(spark, sf_dir, "supplier").count()
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    i = F.col("i")
    return part.select(
        "p_partkey", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")
    ).select(
        F.col("p_partkey").alias("ps_partkey"),
        ((F.col("p_partkey") * 4 + i) % nsupp).alias("ps_suppkey"),
        ((F.col("p_partkey") * 7 + i * 13) % 9999 + 1).alias("ps_availqty"),
        ((F.col("p_partkey") * 31 + i * 7) % 100000).alias("ps_supplycost_cents"),
        (((F.col("p_partkey") * 31 + i * 7) % 100000).cast("double") / 100.0).alias(
            "ps_supplycost"
        ),
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH {_PS_CTE},
    euro AS (
      SELECT ps_partkey, ps_suppkey, ps_supplycost,
             s_acctbal, s_name, n_name
      FROM ps JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    cheapest AS (
      SELECT ps_partkey, min(ps_supplycost) AS min_cost
      FROM euro GROUP BY ps_partkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_type, ps_supplycost
    FROM part JOIN euro ON p_partkey = ps_partkey
    JOIN cheapest USING (ps_partkey)
    WHERE p_size BETWEEN 10 AND 15 AND ps_supplycost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for each mid-size part, the European supplier(s)
    offering the minimum cost — the correlated-min shape.

    Plan: the correlation decorrelates to a per-part min aggregate
    over the region-restricted ps (one shuffle on partkey) joined back
    on (partkey, cost-equality); supplier/nation/region broadcast. The
    cost equality is safe: both sides of it come from the same derived
    doubles. Top-100 is fully tiebroken (acctbal, nation, supplier,
    part) so the LIMIT boundary is deterministic —
    TakeOrderedAndProject, no global sort.
    """
    ps = derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    ).select("r_regionkey")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 15)
    ).select("p_partkey", "p_type")

    euro = (
        ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
    )
    cheapest = euro.groupBy(F.col("ps_partkey").alias("cp_key")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        euro.join(F.broadcast(part), euro.ps_partkey == part.p_partkey)
        .join(cheapest, euro.ps_partkey == cheapest.cp_key)
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "ps_supplycost")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    WITH {_PS_CTE}
    SELECT n_name AS supp_nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           (CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100)
                  AS BIGINT)
            - CAST(sum(ps_supplycost_cents * CAST(l_quantity AS BIGINT))
                   AS BIGINT)) / 100.0 AS profit
    FROM lineitem
    JOIN ps ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY supp_nation, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit (revenue minus supply cost) on red parts, by
    supplier nation and year — the profit-attribution star with a
    composite (partkey, suppkey) join.

    Plan: the LIKE filter prunes part before anything joins it; the
    composite-key ps join and the orders join are the shuffles (ps is
    generate-on-read, so its side costs a part-scan, not a table);
    nation broadcasts. The revenue-minus-cost sum can land EXACTLY on
    a .005 boundary where the two engines' summation orders disagree in
    the deciding ulp (observed at sf0.01) — no rounding scheme fixes a
    boundary-straddling float sum. The aggregate is therefore SPLIT:
    the cost side sums as exact integer cents (supply cost is 2dp by
    construction; quantity integral), only the revenue side is a float
    sum under the usual rounding guard, and profit is their integer
    difference over 100.
    """
    ps = derived_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(
            (
                (
                    F.round(
                        F.sum(
                            F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        )
                        * 100
                    ).cast("bigint")
                    - F.sum(
                        F.col("ps_supplycost_cents")
                        * F.col("l_quantity").cast("bigint")
                    ).cast("bigint")
                )
                / 100.0
            ).alias("profit")
        )
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH {_PS_CTE},
    natps AS (
      SELECT ps_partkey, ps_supplycost * ps_availqty AS value
      FROM ps JOIN supplier ON s_suppkey = ps_suppkey
      WHERE s_nationkey % 5 = 0
    ),
    tot AS (SELECT sum(value) AS total FROM natps)
    SELECT ps_partkey, round(sum(value), 2) AS part_value
    FROM natps, tot
    GROUP BY ps_partkey, total
    HAVING round(sum(value) * 100) / 100
           > round(total * 0.002 * 100) / 100
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose stock value at one nation's suppliers
    exceeds a fraction of those suppliers' total (nation keys are a
    modular family so the filter is non-vacuous at every SF) — scalar-subquery
    threshold over an aggregate.

    Plan: the nation-restricted ps values aggregate per part (one
    shuffle); the grand total is a 1-row agg broadcast into the HAVING
    comparison. Both sides of the threshold are rounded to 2dp with
    the scale-then-round guard — the total's last ulps depend on
    summation order, and an unrounded threshold could flip parts
    sitting within an ulp of the cut.
    """
    ps = derived_partsupp(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") % 5 == 0
    ).select("s_suppkey")
    natps = ps.join(F.broadcast(supp), ps.ps_suppkey == supp.s_suppkey).select(
        "ps_partkey",
        (F.col("ps_supplycost") * F.col("ps_availqty")).alias("value"),
    )
    tot = natps.agg(F.sum("value").alias("total"))
    per_part = natps.groupBy("ps_partkey").agg(F.sum("value").alias("pv"))
    return (
        per_part.join(F.broadcast(tot))
        .filter(
            F.round(F.col("pv") * 100) / 100
            > F.round(F.col("total") * 0.002 * 100) / 100
        )
        .select("ps_partkey", (F.round(F.col("pv"), 2)).alias("part_value"))
    )


@query(
    "tpch_q16_supplier_relationships",
    oracle=f"""
    WITH {_PS_CTE}
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (5, 10, 15, 20, 25)
      AND ps_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many qualified suppliers can provide each
    (brand, type, size) — count-distinct after excluding a supplier
    blacklist (NOT IN; the reference blacklists by comment text, this
    schema by negative balance — same anti-join shape).

    Plan: part filters push to its scan; the blacklist is a broadcast
    LEFT ANTI join (NOT IN over a non-null key set compiles to
    anti-join semantics); count-distinct expands (brand, type, size,
    suppkey) then re-aggregates — two shuffles total.
    """
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(5, 10, 15, 20, 25)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_excess_stock_suppliers",
    oracle=f"""
    WITH {_PS_CTE},
    needed AS (
      SELECT l_partkey, l_suppkey, 0.5 * sum(l_quantity) AS half_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey = 3 AND s_suppkey IN (
      SELECT ps_suppkey
      FROM ps
      JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'red%'
      JOIN needed ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      WHERE ps_availqty > half_qty
    )
    """,
)
def tpch_q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: one nation's suppliers holding more than half a
    year's shipped quantity of red parts — the nested semi-join chain
    (supplier ← ps ← part, lineitem-aggregate).

    Plan: the lineitem aggregate reduces the fact to (part, supp)
    grain first; the availqty comparison is exact (integer vs
    0.5·integer-sum — halves are exact in binary); the IN compiles to
    a LEFT SEMI join on suppkey, so suppliers are never duplicated by
    multiple qualifying parts.
    """
    ps = derived_partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    needed = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    qualified = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(
            needed,
            (ps.ps_partkey == needed.l_partkey)
            & (ps.ps_suppkey == needed.l_suppkey),
        )
        .filter(F.col("ps_availqty") > F.col("half_qty"))
        .select("ps_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") == 3
    ).select("s_suppkey", "s_name")
    return supp.join(
        qualified, supp.s_suppkey == qualified.ps_suppkey, "left_semi"
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE (l_orderkey * 31 + l_linenumber) % 7 = 0
    ),
    all_supp AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier
    JOIN late l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F' AND s_nationkey % 5 = 1
      AND EXISTS (SELECT 1 FROM all_supp l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: suppliers who were the SOLE late supplier on a
    finished multi-supplier order — the exists + not-exists double
    self-correlation, the hardest subquery shape in the suite. The
    schema has no receipt/commit dates, so lateness is a deterministic
    modular flag (same derivation discipline as partsupp).

    Plan: the correlations decorrelate to one LEFT SEMI join (another
    supplier exists on the order) and one LEFT ANTI join (no OTHER
    late supplier) against the late/all (order, supp) key sets — each
    deduplicated BEFORE joining so multiplicity can't inflate counts;
    both join on orderkey. No nested-loop anywhere.
    """
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.filter((F.col("l_orderkey") * 31 + F.col("l_linenumber")) % 7 == 0)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    all_supp = li.select("l_orderkey", "l_suppkey").distinct()
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") % 5 == 1
    ).select("s_suppkey", "s_name")

    l1 = late
    others = all_supp.select(
        F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key")
    )
    return (
        l1.join(orders, l1.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), l1.l_suppkey == supp.s_suppkey)
        .join(
            others,
            (l1.l_orderkey == others.o2_key) & (l1.l_suppkey != others.s2_key),
            "left_semi",
        )
        .join(
            late_others,
            (l1.l_orderkey == late_others.o3_key)
            & (l1.l_suppkey != late_others.s3_key),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )
