"""Adapted TPC-H operator shapes beyond the corpus' classes.

SURVEY.md §2.2 notes the corpus omits EXISTS/NOT EXISTS, count
distinct, LIMIT/top-k and correlated subqueries "(Spark gives them
free anyway)" — this module claims that free coverage explicitly, one
oracle-checked query per shape, adapted to the driver testdata (which
has no partsupp/commitdate/phone columns; constants are chosen so
every query is non-empty at sf0.01).

Spark-first expression: EXISTS/NOT EXISTS become ``left_semi`` /
``left_anti`` joins, correlated scalar subqueries become grouped
aggregates joined back (Catalyst's own decorrelation strategy), and
global scalar subqueries become single-row broadcast cross joins — at
100 TB every one of these keeps the fact scan shuffle-free except for
its own group-by keys.

Determinism follows operators/common.py: decimal(18,6) before any
sum, double only at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import (
    O_REVENUE,
    davg,
    dsum,
    m,
    o_davg,
    revenue,
    o_dsum,
    o_m,
    t,
)

__all__ = ["QUERIES", "ORACLES"]


_revenue = revenue  # shared definition in operators/common.py


# --- Q4 shape: EXISTS -> left_semi join --------------------------------

def q4_exists_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders having ≥1 line item shipped >60 days after the order
    date, counted by priority (TPC-H Q4 with shipdate standing in for
    the missing commitdate). EXISTS = left_semi join on the fact —
    no row duplication, no distinct needed, shuffle only on o_orderkey.
    """
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    late = li.select("l_orderkey", "l_shipdate")
    sem = orders.join(
        late,
        (orders.o_orderkey == late.l_orderkey)
        & (late.l_shipdate > F.col("o_orderdate") + F.expr("interval 60 days")),
        "left_semi",
    )
    return (
        sem.where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("priority")
    )


ORACLE_Q4 = """
SELECT o_orderpriority AS priority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


# --- Q7 shape: nation-pair volume shipping -----------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue between two nations in both directions, by year — the
    OR-of-nation-pairs join filter (TPC-H Q7). Both nation dims
    broadcast; the supplier/customer joins shuffle once each."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")))
    n2 = F.broadcast(nation.select(F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == F.col("s_nkey"))
        .join(n2, cust.c_nationkey == F.col("c_nkey"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(dsum(_revenue(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


ORACLE_Q7 = f"""
SELECT supp_nation, cust_nation, l_year, {o_dsum('vol', 'revenue')}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         {O_REVENUE} AS vol
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


# --- Q8 shape: market-share ratio of conditional sums ------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3 suppliers' share of ECONOMY-part revenue per order
    year (TPC-H Q8): ratio of two conditional exact-decimal sums,
    divided once in double."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .where(F.col("p_type") == "ECONOMY")
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("n_name") == "NATION_3", _revenue()).otherwise(F.lit(0).cast("decimal(20,12)"))).cast("double")
                / F.sum(_revenue()).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


ORACLE_Q8 = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN n_name = 'NATION_3' THEN {O_REVENUE} ELSE CAST(0 AS DECIMAL(20,12)) END) AS DOUBLE)
         / CAST(SUM({O_REVENUE}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_type = 'ECONOMY'
GROUP BY 1
"""


# --- Q9 shape: LIKE filter + computed profit by nation/year ------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit (revenue − 0.5·retail·qty, standing in for the missing
    partsupp supplycost) for parts whose name contains 'ge' (gear/
    widget/gizmo), by supplier nation and year (TPC-H Q9)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    # retail has 1 decimal, qty is integral — (12,4) casts are exact and
    # keep the triple product inside 38 digits in BOTH engines (Spark
    # would silently drop scale past 38; DuckDB would overflow)
    cost = (
        F.col("p_retailprice").cast("decimal(12,4)")
        * F.lit(0.5).cast("decimal(2,1)")
        * F.col("l_quantity").cast("decimal(12,4)")
    ).cast("decimal(30,12)")
    profit = _revenue().cast("decimal(30,12)") - cost
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .where(F.col("p_name").contains("ge"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").cast("long").alias("o_year"))
        .agg(dsum(profit, "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


ORACLE_Q9 = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
       {o_dsum(f"CAST({O_REVENUE} AS DECIMAL(30,12)) - CAST(CAST(p_retailprice AS DECIMAL(12,4)) * CAST(0.5 AS DECIMAL(2,1)) * CAST(l_quantity AS DECIMAL(12,4)) AS DECIMAL(30,12))", 'sum_profit')}
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%ge%'
GROUP BY 1, 2
"""


# --- Q10 shape: top-k by aggregate (LIMIT) -----------------------------

def q10_returned_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue on returned items in one quarter
    (TPC-H Q10). Deterministic top-k: order by (revenue desc, custkey)
    — revenue is an exact-decimal sum so ties resolve identically in
    both engines. At scale Spark runs this as TakeOrderedAndProject —
    no global sort materialization."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .where(
            (F.col("l_returnflag") == "R")
            & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(dsum(_revenue(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("custkey"))
        .limit(20)
    )


ORACLE_Q10 = f"""
SELECT c_custkey AS custkey, c_name AS name, n_name AS nation,
       {o_dsum(O_REVENUE, 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, custkey
LIMIT 20
"""


# --- Q11 shape: HAVING vs global scalar subquery -----------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts carrying >0.05% of NATION_5 suppliers' total line value
    (TPC-H Q11). The global total is a 1-row DataFrame broadcast into
    the HAVING comparison — the Spark-native form of a scalar
    subquery, one extra stage, no driver collect."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    base = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .where(F.col("n_name") == "NATION_5")
        .select("l_partkey", m("l_extendedprice").alias("val"))
    )
    total = base.agg((F.sum("val") * F.lit(0.0005).cast("decimal(6,4)")).alias("threshold"))
    return (
        base.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum("val").alias("value_dec"))
        .crossJoin(F.broadcast(total))
        .where(F.col("value_dec") > F.col("threshold"))
        .select("partkey", F.col("value_dec").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), F.col("partkey"))
    )


ORACLE_Q11 = f"""
WITH base AS (
  SELECT l_partkey, {o_m('l_extendedprice')} AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
)
SELECT l_partkey AS partkey, CAST(SUM(val) AS DOUBLE) AS value
FROM base
GROUP BY l_partkey
HAVING SUM(val) > (SELECT SUM(val) * CAST(0.0005 AS DECIMAL(6,4)) FROM base)
"""


# --- Q13 shape: LEFT OUTER join + count distribution -------------------

def q13_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by number of non-urgent orders,
    including zero-order customers (TPC-H Q13's left-outer + double
    group-by). First group-by shuffles on custkey, the histogram
    group-by is tiny."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").where(~F.col("o_orderpriority").startswith("1"))
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


ORACLE_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '1%'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


# --- Q14 shape: conditional-sum percentage -----------------------------

def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent of one month's revenue from PROMO parts (TPC-H Q14):
    two exact-decimal sums, one double division."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(
            (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0).cast("decimal(20,12)"))).cast("double")
                / F.sum(_revenue()).cast("double")
            ).alias("promo_revenue")
        )
    )


ORACLE_Q14 = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {O_REVENUE} ELSE CAST(0 AS DECIMAL(20,12)) END) AS DOUBLE)
       / CAST(SUM({O_REVENUE}) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_shipdate < TIMESTAMP '1997-07-01'
"""


# --- Q15 shape: derived table joined to its own MAX --------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with max quarterly revenue (TPC-H Q15): the revenue
    view is computed once, its max broadcast back — equality on an
    exact-decimal sum, so "= MAX" is engine-stable."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_revenue()).alias("total_dec"))
    )
    mx = rev.agg(F.max("total_dec").alias("max_dec"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .where(F.col("total_dec") == F.col("max_dec"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.col("total_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("suppkey")
    )


ORACLE_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({O_REVENUE}) AS total_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey AS suppkey, s_name AS name, CAST(total_dec AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON supplier_no = s_suppkey
WHERE total_dec = (SELECT MAX(total_dec) FROM revenue)
"""


# --- Q16 shape: count(distinct) + NOT IN anti join ---------------------

def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier count per (brand, type, size∈list), excluding
    suppliers with negative balance via left_anti (TPC-H Q16's NOT IN
    subquery). count(distinct) expands to a two-phase exact distinct
    aggregation in Spark — no driver involvement."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    supp = t(spark, sf_dir, "supplier")
    bad = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .where(F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        .groupBy(F.col("p_brand").alias("brand"), F.col("p_type").alias("type"), F.col("p_size").cast("long").alias("size"))
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "brand", "type", "size")
    )


ORACLE_Q16 = """
SELECT p_brand AS brand, p_type AS type, CAST(p_size AS BIGINT) AS size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# --- Q17 shape: correlated scalar subquery (per-part average) ----------

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly revenue from Brand#3 line items below half their part's
    average quantity (TPC-H Q17). The correlated avg decorrelates into
    a per-part aggregate joined back — exactly what Catalyst would do
    to the SQL form, written explicitly."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    avg_qty = (
        li.groupBy(F.col("l_partkey").alias("ap_partkey"))
        .agg(davg("l_quantity", "avg_qty"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg((F.sum(m("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_weekly"))
    )


ORACLE_Q17 = f"""
SELECT CAST(SUM({o_m('l_extendedprice')}) AS DOUBLE) / 7.0 AS avg_weekly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (SELECT l_partkey AS ap_partkey, {o_davg(o_m('l_quantity'), 'avg_qty')}
      FROM lineitem GROUP BY l_partkey) a
  ON l_partkey = ap_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < 0.5 * avg_qty
"""


# --- Q18 shape: IN over grouped-HAVING subquery + top-k ----------------

def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with orders totalling >150 units (TPC-H Q18): the
    IN-subquery becomes a semi join against the grouped-HAVING keys;
    top 100 by (totalprice desc, orderkey)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(m("l_quantity")).alias("sum_qty_dec"))
        .where(F.col("sum_qty_dec") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            m("o_totalprice").cast("double").alias("totalprice"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("totalprice").desc(), F.col("orderkey"))
        .limit(100)
    )


ORACLE_Q18 = f"""
SELECT c_name AS name, c_custkey AS custkey, o_orderkey AS orderkey,
       o_orderdate AS orderdate,
       CAST({o_m('o_totalprice')} AS DOUBLE) AS totalprice,
       CAST(sum_qty_dec AS DOUBLE) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, SUM({o_m('l_quantity')}) AS sum_qty_dec
      FROM lineitem GROUP BY l_orderkey HAVING sum_qty_dec > 150) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY totalprice DESC, orderkey
LIMIT 100
"""


# --- Q19 shape: disjunction of conjunctive ranges ----------------------

def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under an OR of three (brand, size-range, qty-range)
    conjunctions (TPC-H Q19) — the whole predicate folds into one
    codegen'd filter over the broadcast part join."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 25) & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 40) & F.col("l_quantity").between(20, 40))
    )
    return j.where(cond).agg(dsum(_revenue(), "revenue"))


ORACLE_Q19 = f"""
SELECT {o_dsum(O_REVENUE, 'revenue')}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40 AND l_quantity BETWEEN 20 AND 40)
"""


# --- Q21 shape: EXISTS + NOT EXISTS with inequality correlation --------

def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_7 suppliers who were the latest shipper on a multi-
    supplier finished order (TPC-H Q21's EXISTS/NOT EXISTS pair):
    EXISTS(other supplier in order) = left_semi, NOT EXISTS(other
    supplier shipped later) = left_anti, both correlated on
    (l_orderkey, ≠ suppkey, shipdate inequality)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    l1 = li.alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_shipdate").alias("l3")
    waiting = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
            & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
            "left_anti",
        )
    )
    return (
        waiting.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey)
        .where(F.col("o_orderstatus") == "F")
        .join(supp, F.col("l1.l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .where(F.col("n_name") == "NATION_7")
        .groupBy(F.col("s_name").alias("name"))
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("name"))
    )


ORACLE_Q21 = """
SELECT s_name AS name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_7'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
"""


# --- Q22 shape: global-average comparison + NOT EXISTS -----------------

def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Well-funded customers with no orders since 2000, bucketed by
    name digit (TPC-H Q22: cntrycode = substring; the global positive-
    balance average is a broadcast scalar; NOT EXISTS(recent orders) =
    left_anti — every customer in the testdata has *some* order, so
    the anti-join subquery is date-filtered to stay non-degenerate)."""
    cust = t(spark, sf_dir, "customer")
    orders = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(davg("c_acctbal", "avg_bal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 1).alias("cntrycode"))
        .agg(F.count(F.lit(1)).alias("numcust"), dsum("c_acctbal", "totacctbal"))
        .orderBy("cntrycode")
    )


ORACLE_Q22 = f"""
SELECT substr(c_name, 10, 1) AS cntrycode, COUNT(*) AS numcust,
       {o_dsum(o_m('c_acctbal'), 'totacctbal')}
FROM customer
WHERE c_acctbal > (SELECT {o_davg(o_m('c_acctbal'), 'x')} FROM (SELECT c_acctbal FROM customer WHERE c_acctbal > 0))
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
"""


# --- Q2 shape: per-group MIN correlated subquery + join-back ----------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supplier per STANDARD part (TPC-H Q2 with unit sale
    price from lineitem standing in for the missing partsupp
    ps_supplycost). The correlated `cost = (SELECT min ...)` becomes a
    grouped MIN joined back on equality — Catalyst's own decorrelation
    shape, expressed directly. At 100 TB the only wide shuffle is the
    (partkey, suppkey) pre-aggregation; the part/supplier/nation/region
    dims broadcast, and the join-back runs on the already-reduced
    pair table. MIN over doubles is accumulation-order independent, so
    the double unit price needs no decimal detour.
    """
    part = t(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") < 15)
    )
    sup = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    li = t(spark, sf_dir, "lineitem")

    costs = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .join(F.broadcast(sup), F.col("l_suppkey") == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    best = costs.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        costs.join(
            best,
            (costs.l_partkey == best.bp) & (costs.cost == best.min_cost),
        )
        .select(
            "s_acctbal",
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("p_partkey").alias("partkey"),
            F.col("cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "nation", "s_name", "partkey"
        )
        .limit(100)
    )


ORACLE_Q2 = """
WITH costs AS (
    SELECT l_partkey, l_suppkey,
           MIN(l_extendedprice / l_quantity) AS cost
    FROM lineitem GROUP BY 1, 2
), eligible AS (
    SELECT s_acctbal, s_name, n_name AS nation, p_partkey AS partkey,
           cost, l_partkey
    FROM costs
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_type = 'STANDARD' AND p_size < 15 AND r_name = 'ASIA'
)
SELECT s_acctbal, s_name, nation, partkey, cost
FROM eligible e
WHERE cost = (SELECT MIN(cost) FROM eligible i WHERE i.l_partkey = e.l_partkey)
ORDER BY s_acctbal DESC, nation, s_name, partkey
LIMIT 100
"""


# --- Q12 shape: conditional two-way counts by derived category --------

def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority line counts per ship mode (TPC-H Q12; the testdata has
    no l_shipmode/commitdate, so the mode is derived deterministically
    from l_linenumber and the late-commit predicate becomes a 1997
    ship-year filter). The CASE-WHEN-inside-SUM pair is the corpus'
    'CASE WHEN (arith guard)' class (SURVEY §2.2) in aggregate
    position. One shuffle on a 3-value key; the orders join stays
    broadcast-free only at corpus scale — here orders is the smaller
    side of a fact-fact join, so shuffle hash on orderkey.
    """
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.element_at(
                F.array(F.lit("MAIL"), F.lit("RAIL"), F.lit("SHIP")),
                (F.col("l_linenumber") % 3 + 1).cast("int"),
            ).alias("ship_mode")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_mode")
    )


ORACLE_Q12 = """
SELECT (['MAIL', 'RAIL', 'SHIP'])[(l_linenumber % 3) + 1] AS ship_mode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY 1
"""


# --- Q20 shape: nested aggregate threshold + semi-join chain ----------

def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who moved >20% of a PROMO part's 1998 volume (TPC-H
    Q20: ps_availqty > 0.5 * sum(l_quantity) becomes pair-share vs
    part-total, both from lineitem since partsupp doesn't exist). Two
    stacked aggregates on the same shuffled (partkey[, suppkey]) keys,
    a broadcast threshold comparison, then EXISTS = left_semi onto
    supplier. Quantity sums use the exact-decimal convention and the
    0.2 factor is a decimal literal, so the threshold comparison is
    integer-exact in both engines.
    """
    part = t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    promo = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    pair = promo.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(m("l_quantity")).alias("pair_qty")
    )
    total = promo.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum(m("l_quantity")).alias("total_qty")
    )
    qualifying = pair.join(total, pair.l_partkey == total.tp).where(
        F.col("pair_qty")
        > F.col("total_qty") * F.lit("0.2").cast("decimal(2,1)")
    )
    sup = t(spark, sf_dir, "supplier")
    return (
        sup.join(
            qualifying.select("l_suppkey").distinct(),
            sup.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


ORACLE_Q20 = f"""
WITH promo AS (
    SELECT l_partkey, l_suppkey, {o_m('l_quantity')} AS qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1999-01-01'
), pair AS (
    SELECT l_partkey, l_suppkey, SUM(qty) AS pair_qty
    FROM promo GROUP BY 1, 2
), total AS (
    SELECT l_partkey, SUM(qty) AS total_qty FROM promo GROUP BY 1
)
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM pair JOIN total USING (l_partkey)
    WHERE pair_qty > total_qty * CAST(0.2 AS DECIMAL(2,1)))
ORDER BY s_name
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_exists_priority": q4_exists_priority,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_top20": q10_returned_top20,
    "q11_important_parts": q11_important_parts,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q13_count_distribution": q13_count_distribution,
    "q14_promo_effect": q14_promo_effect,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_count": q16_supplier_count,
    "q17_small_quantity": q17_small_quantity,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive": q19_disjunctive,
    "q20_potential_promotion": q20_potential_promotion,
    "q21_waiting_supplier": q21_waiting_supplier,
    "q22_idle_customers": q22_idle_customers,
}

ORACLES = {
    "q2_min_cost_supplier": ORACLE_Q2,
    "q4_exists_priority": ORACLE_Q4,
    "q7_volume_shipping": ORACLE_Q7,
    "q8_market_share": ORACLE_Q8,
    "q9_product_profit": ORACLE_Q9,
    "q10_returned_top20": ORACLE_Q10,
    "q11_important_parts": ORACLE_Q11,
    "q12_shipmode_priority": ORACLE_Q12,
    "q13_count_distribution": ORACLE_Q13,
    "q14_promo_effect": ORACLE_Q14,
    "q15_top_supplier": ORACLE_Q15,
    "q16_supplier_count": ORACLE_Q16,
    "q17_small_quantity": ORACLE_Q17,
    "q18_large_orders": ORACLE_Q18,
    "q19_disjunctive": ORACLE_Q19,
    "q20_potential_promotion": ORACLE_Q20,
    "q21_waiting_supplier": ORACLE_Q21,
    "q22_idle_customers": ORACLE_Q22,
}
