"""Operator classes exercised by the reference's 34-query streaming
TPC-DS corpus (SURVEY.md §2.2), re-expressed over the driver testdata.

One query per operator class, each with a DuckDB oracle twin:
rollup+grouping(), HAVING, DISTINCT, UNION ALL, INTERSECT, CASE WHEN,
derived-table re-join, scalar functions (substr/concat/cast/date
arithmetic), BETWEEN/IN/LIKE/OR filter combos, TUMBLING and HOPPING
windows (batch analogs of q100-q103), the q40 event-time interval
left-outer join, and Loghub-style JSON schema-on-read (S12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import davg, dsum, m, o_davg, o_dsum, o_m, t

__all__ = ["QUERIES", "ORACLES"]


# --- GROUP BY ROLLUP + grouping() (q18.sql:48, q22.sql:34, q27.sql:26-41)

def rollup_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (nation, mktsegment) with grouping() indicators."""
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.grouping("n_name").cast("long").alias("g_nation"),
            F.grouping("c_mktsegment").cast("long").alias("g_segment"),
            F.count(F.lit(1)).alias("cnt"),
            dsum("c_acctbal", "sum_bal"),
        )
    )


ORACLE_ROLLUP = f"""
SELECT n_name, c_mktsegment,
       CAST(grouping(n_name) AS BIGINT) AS g_nation,
       CAST(grouping(c_mktsegment) AS BIGINT) AS g_segment,
       COUNT(*) AS cnt,
       {o_dsum(o_m('c_acctbal'), 'sum_bal')}
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name, c_mktsegment)
"""


# --- HAVING (q8.sql:100 `HAVING count(*) > 10`)

def having_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("order_cnt"), dsum("o_totalprice", "total_spent"))
        .where(F.col("order_cnt") > 10)
    )


ORACLE_HAVING = f"""
SELECT o_custkey, COUNT(*) AS order_cnt, {o_dsum(o_m('o_totalprice'), 'total_spent')}
FROM orders GROUP BY o_custkey HAVING COUNT(*) > 10
"""


# --- DISTINCT (q8 inner block)

def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    return cust.select("c_mktsegment", F.col("c_nationkey").cast("long").alias("c_nationkey")).distinct()


ORACLE_DISTINCT = """
SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey FROM customer
"""


# --- UNION ALL of channel slices re-aggregated (q71.sql:39-49, q76)

def union_all_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    a = li.where(F.col("l_returnflag") == "A").select("l_partkey", "l_extendedprice", F.lit("ret_a").alias("channel"))
    b = li.where(F.col("l_returnflag") == "R").select("l_partkey", "l_extendedprice", F.lit("ret_r").alias("channel"))
    c = li.where(F.col("l_linestatus") == "O").select("l_partkey", "l_extendedprice", F.lit("open").alias("channel"))
    return (
        a.unionAll(b).unionAll(c)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("channel", F.col("p_brand").alias("brand"))
        .agg(dsum("l_extendedprice", "ext_price"), F.count(F.lit(1)).alias("cnt"))
    )


ORACLE_UNION_ALL = f"""
WITH u AS (
  SELECT l_partkey, l_extendedprice, 'ret_a' AS channel FROM lineitem WHERE l_returnflag = 'A'
  UNION ALL
  SELECT l_partkey, l_extendedprice, 'ret_r' AS channel FROM lineitem WHERE l_returnflag = 'R'
  UNION ALL
  SELECT l_partkey, l_extendedprice, 'open' AS channel FROM lineitem WHERE l_linestatus = 'O'
)
SELECT channel, p_brand AS brand, {o_dsum(o_m('l_extendedprice'), 'ext_price')}, COUNT(*) AS cnt
FROM u JOIN part ON l_partkey = p_partkey
GROUP BY channel, p_brand
"""


# --- INTERSECT (q8.sql:90)

def intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in BUILDING segment ∩ customers with an order > 200k."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    seg = cust.where(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    big = orders.where(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("custkey"))
    return seg.intersect(big)


ORACLE_INTERSECT = """
SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
"""


# --- CASE WHEN with conditional aggregation (q73.sql:43-46, 22 uses)

def case_when_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            dsum(F.when(F.col("o_orderpriority").startswith("1"), m("o_totalprice")).otherwise(F.lit(0).cast("decimal(18,6)")), "urgent_total"),
            F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0)).cast("long").alias("big_cnt"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


ORACLE_CASE_WHEN = f"""
SELECT o_orderstatus AS status,
       {o_dsum("CASE WHEN o_orderpriority LIKE '1%' THEN " + o_m('o_totalprice') + " ELSE CAST(0 AS DECIMAL(18,6)) END", 'urgent_total')},
       CAST(SUM(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END) AS BIGINT) AS big_cnt,
       COUNT(*) AS cnt
FROM orders GROUP BY o_orderstatus
"""


# --- Derived table (grouped subquery in FROM) re-joined (q73.sql:31-49)

def derived_table_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped subquery (orders per customer, count range) joined back
    to the customer dim — q73's `dj` pattern."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    dj = (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where((F.col("cnt") >= 5) & (F.col("cnt") <= 20))
    )
    return (
        dj.join(cust, dj.o_custkey == cust.c_custkey)
        .select(F.col("c_name"), F.col("c_mktsegment"), F.col("cnt"))
    )


ORACLE_DERIVED = """
SELECT c_name, c_mktsegment, cnt
FROM (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY o_custkey HAVING cnt BETWEEN 5 AND 20) dj
JOIN customer ON dj.o_custkey = c_custkey
"""


# --- Scalar functions: substr/concat/||/cast (q8.sql:31, q40.sql:38-40)

def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer")
    return cust.select(
        F.col("c_custkey"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_nationkey").cast("string")).alias("seg_tag"),
        F.length("c_name").cast("long").alias("name_len"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.col("c_acctbal").cast("decimal(12,2)").cast("string").alias("bal_str"),
    )


ORACLE_SCALAR = """
SELECT c_custkey,
       substr(c_name, 1, 9) AS name_prefix,
       c_mktsegment || '#' || CAST(c_nationkey AS VARCHAR) AS seg_tag,
       CAST(length(c_name) AS BIGINT) AS name_len,
       upper(c_mktsegment) AS seg_upper,
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS bal_str
FROM customer
"""


# --- Filter combos: BETWEEN / IN-list / LIKE / OR-of-equalities (q73.sql:36-47)

def filter_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.where(
            F.col("o_totalprice").between(50000, 300000)
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
            & ((F.col("o_orderstatus") == "O") | (F.col("o_orderstatus") == "F"))
        )
        .groupBy(F.col("o_orderpriority").alias("priority"), F.col("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice", "total"))
    )


ORACLE_FILTER_COMBO = f"""
SELECT o_orderpriority AS priority, o_orderstatus AS status,
       COUNT(*) AS cnt, {o_dsum(o_m('o_totalprice'), 'total')}
FROM orders
WHERE o_totalprice BETWEEN 50000 AND 300000
  AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
  AND (o_orderstatus = 'O' OR o_orderstatus = 'F')
GROUP BY 1, 2
"""


# --- Date arithmetic: cast ± INTERVAL 30 days (q40.sql:38-40, q8.sql)

def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    return (
        orders.where(
            (F.col("o_orderdate") >= F.expr("cast('1997-06-01' as timestamp) - interval 30 days"))
            & (F.col("o_orderdate") <= F.expr("cast('1997-06-01' as timestamp) + interval 30 days"))
        )
        .groupBy(F.year("o_orderdate").cast("long").alias("yr"), F.month("o_orderdate").cast("long").alias("mo"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


ORACLE_DATE_ARITH = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo, COUNT(*) AS cnt
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00' - INTERVAL 30 DAY
  AND o_orderdate <= TIMESTAMP '1997-06-01 00:00:00' + INTERVAL 30 DAY
GROUP BY 1, 2
"""


# --- TUMBLING window batch analog (q101.sql:33; F.window)

def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows over the events stream table (batch
    analog of CREATE TABLE ... GROUP BY TUMBLING(ts, interval 1 hour));
    streaming variant lives in streaming/windows.py."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").start.alias("window_start"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
    )


ORACLE_TUMBLING = f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS cnt, {o_dsum(o_m('value'), 'sum_value')}
FROM events GROUP BY 1, 2
"""


# --- HOPPING window batch analog (q100.sql:33: 1 min / 30 s slide)

def hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes — each event lands in
    exactly 2 windows."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").start.alias("window_start"))
        .agg(F.count(F.lit(1)).alias("cnt"), dsum("value", "sum_value"))
    )


ORACLE_HOPPING = f"""
WITH hopped AS (
  SELECT TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND * (CAST(floor(epoch(ts)/1800) AS BIGINT)*1800) AS window_start, value FROM events
  UNION ALL
  SELECT TIMESTAMP '1970-01-01' + INTERVAL 1 SECOND * (CAST(floor(epoch(ts)/1800) AS BIGINT)*1800 - 1800) AS window_start, value FROM events
)
SELECT window_start, COUNT(*) AS cnt, {o_dsum(o_m('value'), 'sum_value')}
FROM hopped GROUP BY 1
"""


# --- Event-time interval LEFT OUTER join (q40.sql:26-41 batch analog)

def interval_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view→purchase conversion pairs per user within 30 minutes —
    the q40 `cs_data_time <= cr_data_time + interval 30 seconds`
    pattern. Streaming variant (dual watermarks) in streaming/joins.py."""
    ev = t(spark, sf_dir, "events")
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    return (
        views.join(
            buys,
            (F.col("v_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("v_ts"))
            & (F.col("b_ts") <= F.col("v_ts") + F.expr("interval 30 minutes")),
            "left_outer",
        )
        .select("view_id", "buy_id")
    )


ORACLE_INTERVAL_JOIN = """
SELECT v.event_id AS view_id, b.event_id AS buy_id
FROM (SELECT * FROM events WHERE event_type = 'view') v
LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
  ON v.user_id = b.user_id
 AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 30 MINUTE
"""


# --- Loghub-style JSON schema-on-read (S12; LoghubSourceRDD.scala:95-180,
#     Utils.scala:101-152: string bag -> typed fields)

def json_schema_on_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events `props` column is a JSON bag (Loghub __value__
    analog); parse a typed field out and aggregate."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.select(F.col("event_id"), F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("k").alias("sum_k"))
    )


ORACLE_JSON = """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       COUNT(*) AS cnt, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY 1
"""


QUERIES = {
    "rollup_grouping": rollup_grouping,
    "having_count": having_count,
    "distinct_segments": distinct_segments,
    "union_all_channels": union_all_channels,
    "intersect_customers": intersect_customers,
    "case_when_agg": case_when_agg,
    "derived_table_join": derived_table_join,
    "scalar_functions": scalar_functions,
    "filter_combo": filter_combo,
    "date_arithmetic": date_arithmetic,
    "tumbling_window": tumbling_window,
    "hopping_window": hopping_window,
    "interval_left_join": interval_left_join,
    "json_schema_on_read": json_schema_on_read,
}

ORACLES = {
    "rollup_grouping": ORACLE_ROLLUP,
    "having_count": ORACLE_HAVING,
    "distinct_segments": ORACLE_DISTINCT,
    "union_all_channels": ORACLE_UNION_ALL,
    "intersect_customers": ORACLE_INTERSECT,
    "case_when_agg": ORACLE_CASE_WHEN,
    "derived_table_join": ORACLE_DERIVED,
    "scalar_functions": ORACLE_SCALAR,
    "filter_combo": ORACLE_FILTER_COMBO,
    "date_arithmetic": ORACLE_DATE_ARITH,
    "tumbling_window": ORACLE_TUMBLING,
    "hopping_window": ORACLE_HOPPING,
    "interval_left_join": ORACLE_INTERVAL_JOIN,
    "json_schema_on_read": ORACLE_JSON,
}
