"""TPC-DS-shaped table adapter over the driver testdata.

The reference executes its streaming-SQL corpus (emr-baseline-testing/
queries/*.sql) against TPC-DS tables: Kafka stream facts
(tables/kafka_store_sales.sql — Avro registry schema, append mode) and
static Hive dims loaded by bin/load.sh. This module derives every table
that corpus references **deterministically** from the TPC-H-ish driver
testdata (`lineitem ⋈ orders` for the sales facts and inventory, `part`/`supplier`/`customer` for the dims, a generated
calendar for `date_dim`), so the corpus' `INSERT INTO … SELECT`
statements execute **verbatim** — same table names, same column names,
same literal predicates — through plans/streaming_sql.py.

Design constraints honored:

- every derivation is a pure column expression (no UDFs, no collects
  except one scalar `customer.count()` used to keep foreign keys
  surjective), so facts stream through the JSON replay source and the
  same expressions serve as the batch twin;
- the constants are chosen so the corpus' literal predicates
  (`d_year = 2000`, `cd_education_status = 'College'`,
  `s_store_name = 'ese'`, `hd_buy_potential LIKE 'Unknown%'`, …)
  select non-empty subsets: order dates are shifted +3 years
  (1995-2001 → 1998-2004, covering every d_year the corpus filters
  on), demographic dims are the small cross-products TPC-DS defines,
  and fact FKs are pmod hashes into them (i_manager_id mod 29
  and i_manufact_id mod 200 keep the corpus' manager/manufact
  literals, 1/8/28 and 128, non-empty at small SF);
- at 100 TB the facts are a projection+join of the raw tables
  (shuffle-free on a co-partitioned layout; the dims are tiny and
  broadcast), so the adapter itself adds no scale hazard.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "DIM_BUILDERS",
    "FACT_BUILDERS",
    "build_table",
    "materialize_dims",
    "fact_ddl",
    "build_script",
    "referenced_tables",
]


def _arr(*vals: str):
    return F.array(*[F.lit(v) for v in vals])


def _pick(idx, *vals: str):
    """Deterministic element of vals by (idx mod len) — the adapter's
    stand-in for TPC-DS's categorical generators."""
    return F.element_at(_arr(*vals), (F.pmod(idx, F.lit(len(vals))) + 1).cast("int"))


def _shift3(col):
    """Shift a testdata date +3 years (1995-2001 → 1998-2004) so the
    corpus' d_year literals (1998…2002) land inside the data; Feb 29 of
    source leap years maps to Feb 28."""
    day = F.when((F.month(col) == 2) & (F.dayofmonth(col) == 29), F.lit(28)).otherwise(
        F.dayofmonth(col)
    )
    return F.make_date(F.year(col) + 3, F.month(col), day)


def _date_sk(col):
    return F.datediff(col, F.lit("1970-01-01").cast("date"))


# --------------------------------------------------------------------
# dims
# --------------------------------------------------------------------

N_CDEMO = 70  # 2 genders x 5 marital x 7 education
N_HDEMO = 72


def _date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    n_days = (2004 - 1998 + 1) * 366
    d = F.date_add(F.lit("1998-01-01").cast("date"), F.col("id").cast("int"))
    return (
        spark.range(n_days)
        .select(d.alias("d_date"))
        .where(F.year("d_date") <= 2004)
        .select(
            _date_sk(F.col("d_date")).alias("d_date_sk"),
            "d_date",
            F.year("d_date").alias("d_year"),
            F.month("d_date").alias("d_moy"),
            F.dayofmonth("d_date").alias("d_dom"),
            (F.dayofweek("d_date") - 1).alias("d_dow"),  # 0=Sunday, 6=Saturday
            F.quarter("d_date").alias("d_qoy"),
            ((F.year("d_date") - 1900) * 12 + F.month("d_date") - 1).alias("d_month_seq"),
            F.date_format("d_date", "EEEE").alias("d_day_name"),
        )
    )


def _item(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    k = F.col("p_partkey")
    return p.select(
        k.alias("i_item_sk"),
        F.concat(F.lit("ITEM"), F.lpad(k.cast("string"), 12, "0")).alias("i_item_id"),
        F.col("p_name").alias("i_product_name"),
        F.col("p_brand").alias("i_brand"),
        F.substring(F.col("p_brand"), 7, 2).cast("int").alias("i_brand_id"),
        F.col("p_type").alias("i_category"),
        F.pmod(F.hash(F.col("p_type")), F.lit(10)).cast("int").alias("i_category_id"),
        F.concat(F.lit("class_"), F.pmod(k, F.lit(8)).cast("string")).alias("i_class"),
        F.pmod(k * 7, F.lit(200)).cast("int").alias("i_manufact_id"),
        F.concat(F.lit("manufact_"), F.pmod(k * 7, F.lit(200)).cast("string")).alias("i_manufact"),
        F.pmod(k, F.lit(29)).cast("int").alias("i_manager_id"),
        F.round(F.col("p_retailprice") / 1000.0 + F.pmod(k * 37, F.lit(150)) / 100.0, 2).cast("double").alias("i_current_price"),
    )


def _store(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet"))
    k = F.col("s_suppkey")
    return s.select(
        k.alias("s_store_sk"),
        F.concat(F.lit("STORE"), F.lpad(k.cast("string"), 8, "0")).alias("s_store_id"),
        _pick(k, "ese", "ation", "bar", "ought", "able").alias("s_store_name"),
        _pick(k * 3, "Fairview", "Midway", "Edgewood", "Five Points", "Oak Grove").alias("s_city"),
        _pick(k, "Williamson County", "Franklin Parish", "Bronx County", "Orange County").alias("s_county"),
        _pick(k * 7, "TN", "TX", "OH", "OR", "CA").alias("s_state"),
        F.lpad((10000 + F.pmod(k * 117, F.lit(900))).cast("string"), 5, "0").alias("s_zip"),
        (F.lit(-5) - F.pmod(k, F.lit(2))).cast("int").alias("s_gmt_offset"),
        (200 + F.pmod(k * 7, F.lit(100))).cast("int").alias("s_number_employees"),
    )


def _n_customers(spark: SparkSession, sf_dir: str) -> int:
    return spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).count()


def _customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    n = _n_customers(spark, sf_dir)
    k = F.col("c_custkey")
    return c.select(
        k.alias("c_customer_sk"),
        F.concat(F.lit("CUST"), F.lpad(k.cast("string"), 10, "0")).alias("c_customer_id"),
        _pick(k, "James", "Mary", "Robert", "Patricia", "John", "Jennifer", "Michael", "Linda").alias(
            "c_first_name"
        ),
        F.concat(F.lit("Name"), F.substring(F.col("c_name"), 10, 9)).alias("c_last_name"),
        _pick(k * 3, "Mr.", "Mrs.", "Ms.", "Dr.", "Miss").alias("c_salutation"),
        _pick(k, "Y", "N").alias("c_preferred_cust_flag"),
        (F.pmod(k * 5, F.lit(12)) + 1).cast("int").alias("c_birth_month"),
        (1930 + F.pmod(k * 7, F.lit(60))).cast("int").alias("c_birth_year"),
        # +1 keeps the FK inside the 1-based address keys; the floor(k/2)
        # term mixes parity — a pure linear map of the even (preferred)
        # customers would reach only half the zip residues and starve
        # q8's literal zip list
        (F.pmod(k * 13 + F.floor(k / 2), F.lit(n)) + 1).alias("c_current_addr_sk"),
        F.pmod(k * 11, F.lit(N_CDEMO)).alias("c_current_cdemo_sk"),
        F.pmod(k * 11, F.lit(N_HDEMO)).alias("c_current_hdemo_sk"),
    )


def _customer_address(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    k = F.col("c_custkey")
    states = (
        "TX OH OR NM KY VA MS CA WA GA CO MN IN ND OK TN NY FL IL PA AZ NV UT ID MT"
    ).split()
    cities = (
        "Fairview Midway Edgewood Five_Points Oak_Grove Centerville Liberty Salem "
        "Greenville Bethel Clinton Marion Springfield Franklin Union Georgetown "
        "Ashland Milan Jackson Clifton"
    ).split()
    return c.select(
        k.alias("ca_address_sk"),
        F.regexp_replace(_pick(k * 3, *cities), "_", " ").alias("ca_city"),
        _pick(k, "Williamson County", "Franklin Parish", "Bronx County", "Orange County",
              "Walker County", "Daviess County", "Barrow County", "Luce County").alias("ca_county"),
        _pick(k * 17, *states).alias("ca_state"),
        F.lpad((10100 + F.pmod(k * 97, F.lit(50))).cast("string"), 5, "0").alias("ca_zip"),
        F.lit("United States").alias("ca_country"),
        (F.lit(-5) - F.pmod(k, F.lit(4))).cast("int").alias("ca_gmt_offset"),
    )


def _customer_demographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    i = F.col("id")
    educations = (
        "College", "4 yr Degree", "2 yr Degree", "Advanced Degree", "Unknown",
        "Primary", "Secondary",
    )
    return spark.range(N_CDEMO).select(
        i.alias("cd_demo_sk"),
        _pick(i, "M", "F").alias("cd_gender"),
        F.element_at(_arr("M", "S", "D", "W", "U"), (F.pmod(F.floor(i / 2), F.lit(5)) + 1).cast("int")).alias(
            "cd_marital_status"
        ),
        F.element_at(_arr(*educations), (F.pmod(F.floor(i / 10), F.lit(7)) + 1).cast("int")).alias(
            "cd_education_status"
        ),
        F.pmod(i, F.lit(10)).cast("int").alias("cd_dep_count"),
    )


def _household_demographics(spark: SparkSession, sf_dir: str) -> DataFrame:
    i = F.col("id")
    return spark.range(N_HDEMO).select(
        i.alias("hd_demo_sk"),
        F.pmod(i, F.lit(10)).cast("int").alias("hd_dep_count"),
        F.pmod(F.floor(i / 10), F.lit(5)).cast("int").alias("hd_vehicle_count"),
        _pick(i, ">10000", "unknown", "Unknown", "1001-5000", "501-1000", "0-500").alias(
            "hd_buy_potential"
        ),
        F.pmod(i, F.lit(20)).alias("hd_income_band_sk"),
    )


def _income_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    i = F.col("id")
    return spark.range(20).select(
        i.alias("ib_income_band_sk"),
        (i * 5000).cast("int").alias("ib_lower_bound"),
        (i * 5000 + 10000).cast("int").alias("ib_upper_bound"),
    )


def _promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    i = F.col("id")
    return spark.range(10).select(
        i.alias("p_promo_sk"),
        F.concat(F.lit("promo_"), i.cast("string")).alias("p_promo_name"),
        _pick(i, "Y", "N").alias("p_channel_email"),
        F.element_at(_arr("Y", "N"), (F.pmod(F.floor(i / 2), F.lit(2)) + 1).cast("int")).alias(
            "p_channel_event"
        ),
    )


def _warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    i = F.col("id")
    return spark.range(5).select(
        i.alias("w_warehouse_sk"),
        F.concat(F.lit("Warehouse number "), i.cast("string")).alias("w_warehouse_name"),
        _pick(i, "TN", "TX", "OH", "OR", "CA").alias("w_state"),
    )


def _ship_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    i = F.col("id")
    return spark.range(5).select(
        i.alias("sm_ship_mode_sk"),
        _pick(i, "EXPRESS", "OVERNIGHT", "REGULAR", "NEXT DAY", "LIBRARY").alias("sm_type"),
    )


def _web_site(spark: SparkSession, sf_dir: str) -> DataFrame:
    i = F.col("id")
    return spark.range(4).select(
        i.alias("web_site_sk"),
        F.concat(F.lit("site_"), i.cast("string")).alias("web_name"),
    )


def _call_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    i = F.col("id")
    return spark.range(4).select(
        i.alias("cc_call_center_sk"),
        F.concat(F.lit("AAAAAAAA"), i.cast("string")).alias("cc_call_center_id"),
        F.concat(F.lit("call center "), i.cast("string")).alias("cc_name"),
        F.concat(F.lit("Manager "), i.cast("string")).alias("cc_manager"),
    )


def _time_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    i = F.col("id")
    hour = F.floor(i / 60)
    return spark.range(1440).select(
        i.alias("t_time_sk"),
        hour.cast("int").alias("t_hour"),
        F.pmod(i, F.lit(60)).cast("int").alias("t_minute"),
        F.when(hour.between(6, 8), "breakfast")
        .when(hour.between(11, 13), "lunch")
        .when(hour.between(17, 20), "dinner")
        .alias("t_meal_time"),
    )


DIM_BUILDERS = {
    "date_dim": _date_dim,
    "item": _item,
    "store": _store,
    "customer": _customer,
    "customer_address": _customer_address,
    "customer_demographics": _customer_demographics,
    "household_demographics": _household_demographics,
    "income_band": _income_band,
    "promotion": _promotion,
    "warehouse": _warehouse,
    "ship_mode": _ship_mode,
    "web_site": _web_site,
    "call_center": _call_center,
    "time_dim": _time_dim,
}


# --------------------------------------------------------------------
# facts (streamed in the corpus; the same DataFrames serve as batch twins)
# --------------------------------------------------------------------


# q40 event-time columns: `data_time` is the reference's Kafka ingest
# timestamp (CatalogSales.avsc:39 cs_data_time / CatalogReturns.avsc:32
# cr_data_time, timestamp-millis — appended to every record by the
# replication simulator). Deterministic stand-in: per (order, item) the
# sale's data_time trails the return's by 0-44 s, so q40's interval
# join (cs_data_time within [cr_data_time, cr_data_time + 30 s]) has
# both matching and non-matching pairs; watermark sentinels (below)
# close append-mode state so the LOJ's null rows flush.
_DATA_EPOCH = 952_732_800  # 2000-03-11 00:00:00 UTC
_DATA_SPAN = 7_200  # real data_times spread over 2 h


def _data_time_secs():
    """Shared per-(order, item) second offset — both fact builders
    derive from it so join partners land within interval range."""
    return F.pmod(
        F.col("l_orderkey") * 17 + F.col("l_partkey") * 23, F.lit(_DATA_SPAN)
    )


def _sale_lag_secs():
    """Sale data_time − return data_time ∈ [0, 44]: ~70 % inside q40's
    30 s interval, the rest outside (exercises the LOJ's null path on
    matched keys too)."""
    return F.pmod(F.col("l_orderkey") * 3 + F.col("l_partkey") * 7, F.lit(45))


def _watermark_sentinels(spark: SparkSession, df: DataFrame, time_col: str, n: int = 2) -> DataFrame:
    """Rows that advance the stream's event-time watermark 1 h past
    every real data_time but can never reach the output (every FK is
    −1, matching no dim row and no opposite-side fact): with these in
    the replayed stream, the dual-watermark LOJ's unmatched-left state
    fully flushes before the harness compares streaming vs batch —
    the file-replay equivalent of the reference simulator's unbounded
    mode, where wall-clock ingest keeps watermarks moving after the
    historical replay ends. Batch twins read the same replayed JSON,
    so both sides see (and dim-filter away) the same sentinels."""
    closing = _DATA_EPOCH + _DATA_SPAN + 45 + 3_600
    cols = []
    for fld in df.schema.fields:
        if fld.name == time_col:
            cols.append(
                F.timestamp_seconds(F.lit(closing) + F.col("id")).alias(fld.name)
            )
        else:
            cols.append(F.lit(-1).cast(fld.dataType).alias(fld.name))
    return spark.range(n).select(*cols)


def _fact_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "_sold_date", _shift3(F.col("o_orderdate"))
    ).withColumn("_ship_date", _shift3(F.col("l_shipdate")))


def _money(expr):
    return F.round(expr, 2).cast("double")


BIG_TICKET_OFFSET = 2_000_000_000  # synthetic q34 tickets, disjoint key space
BIG_TICKET_EVERY = 199  # ~0.5% of orders become 15-20-item tickets


def _store_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _fact_base(spark, sf_dir)
    n = _n_customers(spark, sf_dir)
    n_store = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet")).count()
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    ext = F.col("l_extendedprice") / 10.0
    # store/address dims are 1-based (keyed by supplier/customer
    # keys), so their pmod FKs are shifted +1 to stay inside 1..n —
    # a bare pmod would emit dangling FK 0 and leave dim row n
    # unreachable (inner joins would silently drop those sales).
    # TPC-DS semantics: a ticket is one customer visit, so the
    # demographic / store / address FKs are constant per ticket
    # (= per order here); the occasional NULL store/addr rows feed
    # q76's channel-null branches, per line so both cases coexist
    # inside a ticket.
    base = b.select(
        _date_sk(F.col("_sold_date")).alias("ss_sold_date_sk"),
        F.pmod(ok * 59 + ln * 131, F.lit(1440)).alias("ss_sold_time_sk"),
        F.col("l_partkey").alias("ss_item_sk"),
        F.col("o_custkey").alias("ss_customer_sk"),
        F.pmod(F.col("o_custkey") * 11, F.lit(N_CDEMO)).alias("ss_cdemo_sk"),
        F.pmod(ok * 13, F.lit(N_HDEMO)).alias("ss_hdemo_sk"),
        F.when(F.pmod(ok + ln, F.lit(20)) == 0, F.lit(None).cast("bigint")).otherwise(
            F.pmod(F.col("o_custkey") * 13 + ok * 29, F.lit(n)) + 1
        ).alias("ss_addr_sk"),
        F.when(F.pmod(ok * 3 + ln, F.lit(25)) == 0, F.lit(None).cast("bigint")).otherwise(
            # multiplier must be coprime with the store count: ok*5
            # against 100 stores reaches only one residue class mod 5,
            # collapsing the _pick()ed store attributes (state/city)
            # onto a single value and emptying q27/q46/q68
            F.pmod(ok * 7, F.lit(n_store)) + 1
        ).alias("ss_store_sk"),
        F.pmod(F.col("l_partkey") + F.col("l_suppkey"), F.lit(10)).alias("ss_promo_sk"),
        ok.alias("ss_ticket_number"),
        F.col("l_quantity").cast("int").alias("ss_quantity"),
        _money(ext / F.col("l_quantity")).alias("ss_list_price"),
        _money(ext / F.col("l_quantity") * (1 - F.col("l_discount"))).alias("ss_sales_price"),
        _money(ext * (1 - F.col("l_discount"))).alias("ss_ext_sales_price"),
        _money(ext).alias("ss_ext_list_price"),
        _money(ext * F.col("l_tax")).alias("ss_ext_tax"),
        _money(ext * 0.8).alias("ss_ext_wholesale_cost"),
        _money(ext * F.col("l_discount")).alias("ss_coupon_amt"),
        _money(ext * (F.lit(0.2) - F.col("l_discount"))).alias("ss_net_profit"),
        # Kafka ingest event time (StoreSales.avsc:28 ss_data_time,
        # timestamp-millis) — q100-q103 window on it (TUMBLING/HOPPING/
        # delay()); same 2 h deterministic spread as the q40 facts
        F.timestamp_seconds(F.lit(_DATA_EPOCH) + _data_time_secs()).alias(
            "ss_data_time"
        ),
    )

    # --- q34 big-ticket slice (reference queries/q34.sql) -----------
    # TPC-H caps orders at 7 line items, so `cnt BETWEEN 15 AND 20`
    # over per-order tickets is structurally empty. A deterministic
    # ~0.5% slice of orders is re-keyed into a disjoint ticket space
    # and its items replicated ceil(15/c) times (c = items in the
    # order, 7-item orders excluded since no multiple of 7 lands in
    # 15..20), yielding 15-20-item tickets. Their date/store/hdemo FKs
    # are pinned to known q34-qualifying dim rows (d_dom=1 in 1999,
    # s_county='Williamson County' at store 4, hd 13 = 'unknown' with
    # dep/vehicle = 3 > 1.2) so the band is non-empty by construction,
    # not by data accident.
    from pyspark.sql import Window

    q34_date_sk = F.datediff(
        F.lit("1999-03-01").cast("date"), F.lit("1970-01-01").cast("date")
    )
    big_src = (
        b.where(F.pmod(ok, F.lit(BIG_TICKET_EVERY)) == 0)
        .withColumn(
            "_n_items", F.count(F.lit(1)).over(Window.partitionBy("l_orderkey"))
        )
        .where(F.col("_n_items") <= 6)
        .withColumn(
            "_rep",
            F.explode(
                F.sequence(
                    F.lit(1), F.ceil(F.lit(15) / F.col("_n_items")).cast("int")
                )
            ),
        )
    )
    big = big_src.select(
        q34_date_sk.alias("ss_sold_date_sk"),
        F.pmod(ok * 59 + ln * 131, F.lit(1440)).alias("ss_sold_time_sk"),
        F.col("l_partkey").alias("ss_item_sk"),
        F.col("o_custkey").alias("ss_customer_sk"),
        F.pmod(F.col("o_custkey") * 11, F.lit(N_CDEMO)).alias("ss_cdemo_sk"),
        F.lit(13).cast("bigint").alias("ss_hdemo_sk"),
        (F.pmod(F.col("o_custkey") * 13 + ok * 29, F.lit(n)) + 1).alias("ss_addr_sk"),
        F.lit(4).cast("bigint").alias("ss_store_sk"),
        F.pmod(F.col("l_partkey") + F.col("l_suppkey"), F.lit(10)).alias("ss_promo_sk"),
        (ok + F.lit(BIG_TICKET_OFFSET)).alias("ss_ticket_number"),
        F.col("l_quantity").cast("int").alias("ss_quantity"),
        _money(ext / F.col("l_quantity")).alias("ss_list_price"),
        _money(ext / F.col("l_quantity") * (1 - F.col("l_discount"))).alias("ss_sales_price"),
        _money(ext * (1 - F.col("l_discount"))).alias("ss_ext_sales_price"),
        _money(ext).alias("ss_ext_list_price"),
        _money(ext * F.col("l_tax")).alias("ss_ext_tax"),
        _money(ext * 0.8).alias("ss_ext_wholesale_cost"),
        _money(ext * F.col("l_discount")).alias("ss_coupon_amt"),
        _money(ext * (F.lit(0.2) - F.col("l_discount"))).alias("ss_net_profit"),
        F.timestamp_seconds(F.lit(_DATA_EPOCH) + _data_time_secs()).alias(
            "ss_data_time"
        ),
    )
    out = base.unionByName(big)
    # q102/q103 run append mode with delay(ss_data_time): the sentinels
    # flush the final windows exactly as for the q40 facts; every other
    # script drops them through its inner dim joins (all FKs are -1) on
    # stream and batch twin alike.
    return out.unionByName(_watermark_sentinels(spark, out, "ss_data_time"))


def _catalog_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _fact_base(spark, sf_dir)
    n = _n_customers(spark, sf_dir)
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    ext = F.col("l_extendedprice") / 10.0
    sales = b.select(
        _date_sk(F.col("_sold_date")).alias("cs_sold_date_sk"),
        _date_sk(F.col("_ship_date")).alias("cs_ship_date_sk"),
        F.pmod(ok * 37 + ln * 101, F.lit(1440)).alias("cs_sold_time_sk"),
        F.col("l_partkey").alias("cs_item_sk"),
        F.col("o_custkey").alias("cs_bill_customer_sk"),
        F.pmod(F.col("o_custkey") * 11, F.lit(N_CDEMO)).alias("cs_bill_cdemo_sk"),
        F.when(F.pmod(ok * 7 + ln, F.lit(20)) == 0, F.lit(None).cast("bigint")).otherwise(
            F.pmod(F.col("o_custkey") * 13 + ok * 29, F.lit(n)) + 1
        ).alias("cs_ship_addr_sk"),
        F.pmod(F.col("l_partkey") + F.col("l_suppkey"), F.lit(10)).alias("cs_promo_sk"),
        F.pmod(F.col("l_suppkey"), F.lit(5)).alias("cs_warehouse_sk"),
        F.pmod(ln, F.lit(5)).alias("cs_ship_mode_sk"),
        F.pmod(ok, F.lit(4)).alias("cs_call_center_sk"),
        ok.alias("cs_order_number"),
        F.col("l_quantity").cast("int").alias("cs_quantity"),
        _money(ext / F.col("l_quantity")).alias("cs_list_price"),
        _money(ext / F.col("l_quantity") * (1 - F.col("l_discount"))).alias("cs_sales_price"),
        _money(ext * (1 - F.col("l_discount"))).alias("cs_ext_sales_price"),
        _money(ext * F.col("l_discount")).alias("cs_coupon_amt"),
        _money(ext * (F.lit(0.2) - F.col("l_discount"))).alias("cs_net_profit"),
        F.timestamp_seconds(
            F.lit(_DATA_EPOCH) + _data_time_secs() + _sale_lag_secs()
        ).alias("cs_data_time"),
    )
    return sales.unionByName(_watermark_sentinels(spark, sales, "cs_data_time"))


def _web_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _fact_base(spark, sf_dir)
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber")
    ext = F.col("l_extendedprice") / 10.0
    return b.select(
        _date_sk(F.col("_sold_date")).alias("ws_sold_date_sk"),
        _date_sk(F.col("_ship_date")).alias("ws_ship_date_sk"),
        F.pmod(ok * 43 + ln * 89, F.lit(1440)).alias("ws_sold_time_sk"),
        F.col("l_partkey").alias("ws_item_sk"),
        F.when(F.pmod(ok + ln * 3, F.lit(20)) == 0, F.lit(None).cast("bigint")).otherwise(
            F.col("o_custkey")
        ).alias("ws_ship_customer_sk"),
        F.pmod(ok, F.lit(4)).alias("ws_web_site_sk"),
        F.pmod(F.col("l_suppkey"), F.lit(5)).alias("ws_warehouse_sk"),
        F.pmod(ln, F.lit(5)).alias("ws_ship_mode_sk"),
        _money(ext * (1 - F.col("l_discount"))).alias("ws_ext_sales_price"),
    )


def _inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the testdata carries no partsupp table; lineitem (partkey,
    # suppkey, quantity) is the inventory-shaped surrogate
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    anchor = 11027  # datediff('2000-03-11', '1970-01-01')
    return li.select(
        (F.lit(anchor) + F.pmod(F.col("l_orderkey") * 7 + F.col("l_partkey") * 3, F.lit(121)) - 60).alias(
            "inv_date_sk"
        ),
        F.col("l_partkey").alias("inv_item_sk"),
        F.pmod(F.col("l_suppkey"), F.lit(5)).alias("inv_warehouse_sk"),
        (F.col("l_quantity") * 10).cast("int").alias("inv_quantity_on_hand"),
    )


def _returns_base(spark: SparkSession, sf_dir: str, recent: bool = False) -> DataFrame:
    # l_returnflag = 'R' only exists on early lineitems (TPC-H sets it
    # for receipts before 1995-06, i.e. shifted dates ≤ 1998); q40's
    # interval join probes sales around 2000-03, so catalog_returns
    # additionally marks a deterministic ~8 % slice of ALL lineitems as
    # returned (`recent=True`), keeping the join non-vacuous in every
    # corpus date window.
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    flag = F.col("l_returnflag") == "R"
    if recent:
        flag = flag | (
            F.pmod(F.col("l_orderkey") * 31 + F.col("l_linenumber") * 17, F.lit(13))
            == 0
        )
    li = li.where(flag)
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey"
    )
    # no l_receiptdate in the testdata: return date = ship date + a
    # deterministic 1-30 day lag
    return li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "_return_date",
        F.date_add(
            _shift3(F.col("l_shipdate")),
            (F.pmod(F.col("l_orderkey") * 3 + F.col("l_linenumber"), F.lit(30)) + 1).cast("int"),
        ),
    )


def _store_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _returns_base(spark, sf_dir)
    ext = F.col("l_extendedprice") / 10.0
    return b.select(
        _date_sk(F.col("_return_date")).alias("sr_returned_date_sk"),
        F.col("l_partkey").alias("sr_item_sk"),
        F.col("o_custkey").alias("sr_customer_sk"),
        F.pmod(F.col("o_custkey") * 11, F.lit(N_CDEMO)).alias("sr_cdemo_sk"),
        F.col("l_orderkey").alias("sr_ticket_number"),
        _money(ext * (1 - F.col("l_discount"))).alias("sr_return_amt"),
    )


def _catalog_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _returns_base(spark, sf_dir, recent=True)
    ext = F.col("l_extendedprice") / 10.0
    ret = b.select(
        _date_sk(F.col("_return_date")).alias("cr_returned_date_sk"),
        F.col("l_partkey").alias("cr_item_sk"),
        F.col("o_custkey").alias("cr_returning_customer_sk"),
        F.pmod(F.col("l_orderkey"), F.lit(4)).alias("cr_call_center_sk"),
        F.col("l_orderkey").alias("cr_order_number"),
        _money(ext * F.col("l_discount") + 50).alias("cr_net_loss"),
        F.timestamp_seconds(F.lit(_DATA_EPOCH) + _data_time_secs()).alias(
            "cr_data_time"
        ),
    )
    return ret.unionByName(_watermark_sentinels(spark, ret, "cr_data_time"))


FACT_BUILDERS = {
    "kafka_store_sales": _store_sales,
    "kafka_catalog_sales": _catalog_sales,
    "kafka_web_sales": _web_sales,
    "kafka_inventory": _inventory,
    "kafka_store_returns": _store_returns,
    "kafka_catalog_returns": _catalog_returns,
}


def build_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    builder = DIM_BUILDERS.get(name) or FACT_BUILDERS.get(name)
    if builder is None:
        raise KeyError(name)
    return builder(spark, sf_dir)


def materialize_dims(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, str]:
    """Write every dim as parquet under out_dir; returns name → path.
    (Dims are tiny — the corpus registers them as static tables.)"""
    paths = {}
    for name in DIM_BUILDERS:
        path = os.path.join(out_dir, f"{name}.parquet")
        if not os.path.exists(path):
            build_table(spark, sf_dir, name).write.mode("overwrite").parquet(path)
        paths[name] = path
    return paths


def fact_ddl(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Column DDL string for a fact's stream-table declaration (the
    stand-in for the Avro registry schema the reference attaches to its
    Kafka stream tables)."""
    df = build_table(spark, sf_dir, name)
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)


# --------------------------------------------------------------------
# verbatim script construction
# --------------------------------------------------------------------

_WORD = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def referenced_tables(select_sql: str) -> tuple[list[str], list[str]]:
    """(facts, dims) actually referenced by a corpus SELECT."""
    words = set(_WORD.findall(select_sql))
    facts = [t for t in FACT_BUILDERS if t in words]
    dims = [t for t in DIM_BUILDERS if t in words]
    return facts, dims


def extract_insert_statement(script_text: str) -> tuple[str, str, str]:
    """From a reference corpus script: (sink_table, output_mode,
    full INSERT statement text — verbatim)."""
    from aliyun_emapreduce_datasources_spark.plans.streaming_sql import split_statements

    mode = "complete"
    m = re.search(r"output\.mode\s*=\s*'(\w+)'", script_text)
    if m:
        mode = m.group(1)
    for stmt in split_statements(script_text):
        im = re.match(r"INSERT\s+INTO\s+([\w.]+)\b", stmt, re.IGNORECASE)
        if im:
            return im.group(1), mode, stmt
    raise ValueError("no INSERT INTO statement in script")


def build_preamble(
    query_sql: str,
    fact_ddls: dict[str, str],
    fact_stream_dirs: dict[str, str],
    dim_paths: dict[str, str],
) -> str:
    """The source-registration script a corpus statement needs before
    it can run: stream-table declarations for the facts it references
    (JSON replay dirs standing in for the Kafka topics — the reference
    creates these via tables/kafka_*.sql) and parquet registrations for
    the dims (the reference's bin/load.sh step)."""
    facts, dims = referenced_tables(query_sql)
    parts = ["SET spark.sql.shuffle.partitions=8"]
    for f in facts:
        parts.append(
            f"CREATE TABLE {f} ({fact_ddls[f]}) USING stream "
            f"OPTIONS (path '{fact_stream_dirs[f]}', maxFilesPerTrigger '1')"
        )
    for d in dims:
        parts.append(f"CREATE TABLE {d} USING parquet OPTIONS (path '{dim_paths[d]}')")
    return ";\n".join(parts)


def build_script(
    insert_stmt: str,
    sink: str,
    mode: str,
    fact_ddls: dict[str, str],
    fact_stream_dirs: dict[str, str],
    dim_paths: dict[str, str],
) -> str:
    """Compose a runnable front-end script around a verbatim corpus
    INSERT statement: the source preamble plus the sink-table
    declaration carrying the reference's output.mode."""
    return ";\n".join(
        [
            build_preamble(insert_stmt, fact_ddls, fact_stream_dirs, dim_paths),
            f"CREATE TABLE {sink} USING kafka OPTIONS (output.mode '{mode}')",
            insert_stmt,
        ]
    )


def extract_select(script_text: str) -> str:
    """The SELECT inside a corpus script's INSERT INTO … SELECT or
    CREATE TABLE … AS SELECT (q103.sql:11-32) — for batch twins."""
    m = re.search(
        r"INSERT\s+INTO\s+[\w.]+\s+(SELECT\b.*)", script_text, re.IGNORECASE | re.DOTALL
    ) or re.search(r"\)\s*AS\s+(SELECT\b.*)", script_text, re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError("no INSERT/CTAS SELECT in script")
    return m.group(1).rstrip().rstrip(";")
