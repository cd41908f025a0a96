"""TPC-H-style headline queries over the driver testdata.

These are the batch "flagship" plans: scan → star join → filter →
aggregate → order, the same shape as the corpus' stream-static star
joins (SURVEY.md §2.2; e.g. emr-baseline-testing/queries/q3.sql:24-34).

Scale notes: every dimension side (region/nation/part/customer/
supplier) is orders of magnitude smaller than the fact tables
(orders/lineitem), so Catalyst broadcast-hash-joins them; the only
shuffles are the final aggregations on low-cardinality keys — the plan
that survives a 100 TB fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import O_REVENUE, davg, dsum, m, o_davg, o_dsum, o_m, revenue, t

__all__ = ["QUERIES", "ORACLES"]


# _revenue / O_REVENUE live in operators/common.py (one definition
# for both TPC-H modules)
_revenue = revenue


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-aggregate hash agg (sum/avg/count).

    Corpus parity: hash aggregation sum/avg/count(*) (SURVEY §2.2;
    q3.sql:27 SUM, q22.sql:28 avg). Partial aggregation (map-side
    combine) happens automatically; the shuffle carries only
    6 groups x 7 aggregates.
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(_revenue(), "sum_disc_price"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {o_dsum(o_m('l_quantity'), 'sum_qty')},
       {o_dsum(o_m('l_extendedprice'), 'sum_base_price')},
       {o_dsum(O_REVENUE, 'sum_disc_price')},
       {o_davg(o_m('l_quantity'), 'avg_qty')},
       {o_davg(o_m('l_extendedprice'), 'avg_price')},
       {o_davg(o_m('l_discount'), 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship star join: fact × 2 dims → filter → agg → order.

    Mirrors corpus q3 (queries/q3.sql:24-34): fact joined to item+date
    dims, SUM grouped by year/brand ordered by revenue. lineitem plays
    the fact, part the item dim, orders the date dim. Dims broadcast;
    the only shuffle is the final low-cardinality groupBy.
    """
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    orders = t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("p_type").startswith("STANDARD"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"), F.col("p_brand").alias("brand"))
        .agg(dsum(_revenue(), "sum_agg"))
        .orderBy(F.col("o_year"), F.col("sum_agg").desc(), F.col("brand"))
    )


ORACLE_Q3 = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, p_brand AS brand,
       {o_dsum(O_REVENUE, 'sum_agg')}
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_type LIKE 'STANDARD%'
GROUP BY 1, 2
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way snowflake join with co-nation constraint.

    Corpus parity: multi-dim star joins, 2-5 dims per query (SURVEY
    §2.2 "Stream-static inner equi-join"). All dims broadcast — at
    100 TB the fact scan never shuffles for the joins.
    """
    region = t(spark, sf_dir, "region")
    nation = t(spark, sf_dir, "nation")
    customer = t(spark, sf_dir, "customer")
    supplier = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .where(supplier.s_nationkey == customer.c_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(_revenue(), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


ORACLE_Q5 = f"""
SELECT n_name AS nation,
       {o_dsum(O_REVENUE, 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE s_nationkey = c_nationkey
GROUP BY n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate (no groupBy).

    Corpus parity: range/BETWEEN filters feeding an aggregate
    (q73.sql:36-47). The date+discount+quantity predicates all push to
    the parquet scan.
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(m("l_extendedprice") * m("l_discount"), "revenue"))
    )


ORACLE_Q6 = f"""
SELECT {o_dsum(o_m('l_extendedprice') + ' * ' + o_m('l_discount'), 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_star_revenue": q3_star_revenue,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
}

ORACLES = {
    "q1_pricing_summary": ORACLE_Q1,
    "q3_star_revenue": ORACLE_Q3,
    "q5_local_supplier": ORACLE_Q5,
    "q6_forecast_revenue": ORACLE_Q6,
}
