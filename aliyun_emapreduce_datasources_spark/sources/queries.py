"""Oracle-checked catalog entries exercising the connector-semantics
layer: KV catalog scan with pushdown filter tree, CDC merge-apply,
ots_col_parser, DTS-record decode, LR scoring.

Each derives its connector-shaped input deterministically from the
driver testdata so the DuckDB oracle can reproduce it in plain SQL.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.udfs import from_dts_record, score_dataframe
from aliyun_emapreduce_datasources_spark.operators.common import dsum, m, o_dsum, o_m, t
from aliyun_emapreduce_datasources_spark.sources.cdc import apply_cdc, ots_col_parser
from aliyun_emapreduce_datasources_spark.sources.kv import KVCatalog, KVTable

__all__ = ["QUERIES", "ORACLES"]


# --- KV catalog scan + filter-tree pushdown (S1-S3) --------------------

KV_CUSTOMER_CATALOG = """
{"table": "customer",
 "columns": {"c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
             "c_acctbal": "double", "c_mktsegment": "string"},
 "primary_keys": ["c_custkey"]}
"""


def kv_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned+filtered KV scan through the connector filter tree:
    And(Or(eq,eq), Not(startswith), ge, in) — the TableStoreFilter
    node set under composition."""
    table = KVTable(KVCatalog.from_json(KV_CUSTOMER_CATALOG), os.path.join(sf_dir, "customer.parquet"))
    filters = [
        (
            "and",
            ("or", ("eq", "c_mktsegment", "BUILDING"), ("eq", "c_mktsegment", "MACHINERY")),
            ("not", ("startswith", "c_name", "Customer#0000001")),
        ),
        ("ge", "c_acctbal", 0.0),
        ("in", "c_nationkey", [1, 3, 5, 7, 9, 11]),
    ]
    return table.scan(spark, ["c_custkey", "c_name", "c_acctbal"], filters)


ORACLE_KV = """
SELECT c_custkey, c_name, c_acctbal
FROM customer
WHERE (c_mktsegment = 'BUILDING' OR c_mktsegment = 'MACHINERY')
  AND NOT (c_name LIKE 'Customer#0000001%')
  AND c_acctbal >= 0.0
  AND c_nationkey IN (1, 3, 5, 7, 9, 11)
"""


# --- CDC merge-apply (S27 Kudu merge / Delta CDC) ----------------------

def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic change batch from orders (key%10==0 →
    DELETE, key%10∈{1,2,3} → UPDATE doubling the price), apply it to
    the snapshot, aggregate the merged state."""
    orders = t(spark, sf_dir, "orders")
    mod = F.col("o_orderkey") % 10
    changes = (
        orders.where(mod <= 3)
        .withColumn(
            "__ots_record_type__",
            F.when(mod == 0, F.lit("DELETE")).otherwise(F.lit("UPDATE")),
        )
        .withColumn("__ots_record_timestamp__", F.lit(1).cast("long"))
        .withColumn(
            "o_totalprice",
            F.when(mod == 0, F.col("o_totalprice")).otherwise(F.col("o_totalprice") * 2),
        )
    )
    merged = apply_cdc(orders, changes, ["o_orderkey"])
    return merged.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("cnt"), dsum("o_totalprice", "total")
    )


ORACLE_CDC_MERGE = f"""
WITH merged AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 10 IN (1,2,3) THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 10 != 0
)
SELECT o_orderstatus AS status, COUNT(*) AS cnt, {o_dsum(o_m('o_totalprice'), 'total')}
FROM merged GROUP BY 1
"""


# --- ots_col_parser (U1) ----------------------------------------------

def ots_col_parser_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-stream column resolution: per-column op types null out
    deleted values (ResolveTableStoreBinlogUDF semantics)."""
    ev = t(spark, sf_dir, "events")
    col_type = (
        F.when(F.col("event_type") == "error", F.lit("DELETE_ONE_VERSION"))
        .when(F.col("event_type") == "click", F.lit("DELETE_ALL_VERSION"))
        .otherwise(F.lit("PUT"))
    )
    parsed = ev.withColumn("__ots_column_type_value", col_type).withColumn(
        "parsed_value", ots_col_parser("value", "__ots_column_type_value")
    )
    return parsed.groupBy("event_type").agg(
        F.count("parsed_value").alias("n_put"),
        F.count(F.lit(1)).alias("n_total"),
        dsum(F.coalesce(m("parsed_value"), F.lit(0).cast("decimal(18,6)")), "sum_put"),
    )


ORACLE_OTS_PARSER = f"""
WITH parsed AS (
  SELECT event_type,
         CASE WHEN event_type IN ('error', 'click') THEN NULL ELSE value END AS parsed_value
  FROM events
)
SELECT event_type, COUNT(parsed_value) AS n_put, COUNT(*) AS n_total,
       {o_dsum("COALESCE(" + o_m('parsed_value') + ", CAST(0 AS DECIMAL(18,6)))", 'sum_put')}
FROM parsed GROUP BY 1
"""


# --- DTS record decode (U2) -------------------------------------------

def dts_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode orders as CDC wire records, decode with the 9-field DTS
    record schema, aggregate by record type (decode∘encode == id, so
    the oracle computes the plain equivalent)."""
    # single-file input → one scan partition; spread the (CPU-bound)
    # JSON encode/decode chain across cores before it runs
    orders = t(spark, sf_dir, "orders").repartition(
        spark.sparkContext.defaultParallelism
    )
    mod = F.col("o_orderkey") % 10
    wire = orders.select(
        F.to_json(
            F.struct(
                F.col("o_orderkey").alias("recordID"),
                F.lit("mysql").alias("source"),
                F.lit("tpch.orders").alias("dbTable"),
                F.when(mod == 0, "DELETE").when(mod <= 3, "UPDATE").otherwise("INSERT").alias("recordType"),
                F.col("o_orderdate").alias("recordTimestamp"),
                F.lit("{}").alias("extraTags"),
                F.lit(None).cast("string").alias("fields"),
                F.lit(None).cast("string").alias("beforeImages"),
                F.to_json(F.struct("o_totalprice", "o_orderstatus")).alias("afterImages"),
            )
        ).alias("value")
    )
    decoded = wire.select(from_dts_record("value").alias("r")).select("r.*")
    return decoded.groupBy(F.col("recordType").alias("record_type")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("recordID").alias("max_id"),
        dsum(m(F.get_json_object("afterImages", "$.o_totalprice")), "sum_after_price"),
    )


ORACLE_DTS_DECODE = f"""
SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'DELETE'
            WHEN o_orderkey % 10 <= 3 THEN 'UPDATE'
            ELSE 'INSERT' END AS record_type,
       COUNT(*) AS cnt, MAX(o_orderkey) AS max_id,
       {o_dsum(o_m('o_totalprice'), 'sum_after_price')}
FROM orders GROUP BY 1
"""


# --- Loghub record wrap/parse round trip (S12) -------------------------

def loghub_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap events in the Loghub record shape (system columns + JSON
    __value__ bag), then schema-on-read parse the bag back to typed
    fields and aggregate — wrap∘parse must be the identity, so the
    oracle is the plain aggregation (LoghubSourceProvider.scala:249-268
    record shape; Utils.scala:101-152 typed converters)."""
    from pyspark.sql import types as T

    from aliyun_emapreduce_datasources_spark.streaming.sources import (
        parse_loghub_value,
        with_loghub_columns,
    )

    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    wrapped = with_loghub_columns(ev, project="p1", store="events")
    user_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    parsed = parse_loghub_value(wrapped, user_schema)
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max("event_id").alias("max_id"),
        dsum("value", "sum_value"),
    )


ORACLE_LOGHUB = f"""
SELECT event_type, COUNT(*) AS cnt, MAX(event_id) AS max_id,
       {o_dsum(o_m('value'), 'sum_value')}
FROM events GROUP BY 1
"""


# --- LR scoring (U3) ---------------------------------------------------

LR_COEF = [((i * 37) % 17 - 8) / 10.0 for i in range(64)]
LR_INTERCEPT = 0.1


def lr_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF logistic scoring over the embedding column; class
    counts per label (sign of the linear term is oracle-checkable
    without libm exp differences)."""
    emb = t(spark, sf_dir, "embeddings")
    scored = score_dataframe(emb, "embedding", LR_COEF, LR_INTERCEPT)
    return scored.groupBy(F.col("label").cast("long").alias("label")).agg(
        F.sum("pred_class").alias("n_pos"), F.count(F.lit(1)).alias("cnt")
    )


_O_COEF = "[" + ", ".join(str(c) for c in LR_COEF) + "]"

ORACLE_LR = f"""
SELECT CAST(label AS BIGINT) AS label,
       CAST(SUM(CASE WHEN list_dot_product(embedding::DOUBLE[], {_O_COEF}::DOUBLE[]) + {LR_INTERCEPT} >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       COUNT(*) AS cnt
FROM embeddings GROUP BY 1
"""


# --- Python DataSource scan (S1-S3 on the pyspark.sql.datasource API) --

def pyds_kv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan documents through the registered ``emrkv`` Python
    DataSource with a JSON-catalog-declared subset schema and two
    pushable predicates (compiled to pyarrow expressions inside the
    reader, so filtering happens at the Arrow scan, not post-hoc),
    then aggregate per language. The residual-split contract is
    unit-tested in tests/test_pyds.py; this entry proves the e2e path
    under the driver's vanilla session."""
    from aliyun_emapreduce_datasources_spark.sources.pyds import register_all

    register_all(spark)
    catalog = (
        '{"columns": {"doc_id": {"type": "bigint"}, "lang": {"type": "string"},'
        ' "source": {"type": "string"}, "n_chars": {"type": "bigint"}}}'
    )
    df = (
        spark.read.format("emrkv")
        .option("path", os.path.join(sf_dir, "documents.parquet"))
        .option("catalog", catalog)
        .load()
    )
    return (
        df.where(F.col("lang").isin("en", "de", "fr") & (F.col("n_chars") > 100))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("lang")
    )


ORACLE_PYDS = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM documents
WHERE lang IN ('en', 'de', 'fr') AND n_chars > 100
GROUP BY lang
ORDER BY lang
"""


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history over the events change log: each non-error event
    opens a version of (user_id, value); any later event (errors act
    as tombstones) closes it. Restricted to user_id < 200 to keep the
    gate result bounded."""
    from aliyun_emapreduce_datasources_spark.sources.cdc import scd2_history

    ev = t(spark, sf_dir, "events").where(F.col("user_id") < 200)
    changes = ev.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(F.col("event_type") == "error", F.lit("DELETE"))
        .otherwise(F.lit("UPSERT"))
        .alias("op"),
    )
    hist = scd2_history(changes, ["user_id"], "op", "ts", tiebreak_col="event_id")
    return hist.select(
        "user_id", "event_id", "valid_from", "valid_to", "is_current", "value"
    )


ORACLE_SCD2 = """
WITH ch AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPSERT' END AS op
  FROM events WHERE user_id < 200
), v AS (
  SELECT user_id, event_id, ts AS valid_from, value, op,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
  FROM ch
)
SELECT user_id, event_id, valid_from, valid_to,
       valid_to IS NULL AS is_current, value
FROM v WHERE op != 'DELETE'
"""


QUERIES = {
    "kv_filter_pushdown": kv_filter_pushdown,
    "pyds_kv_scan": pyds_kv_scan,
    "cdc_merge_apply": cdc_merge_apply,
    "cdc_scd2_history": cdc_scd2_history,
    "ots_col_parser": ots_col_parser_query,
    "dts_decode": dts_decode,
    "loghub_roundtrip": loghub_roundtrip,
    "lr_scoring": lr_scoring,
}

ORACLES = {
    "kv_filter_pushdown": ORACLE_KV,
    "pyds_kv_scan": ORACLE_PYDS,
    "cdc_merge_apply": ORACLE_CDC_MERGE,
    "cdc_scd2_history": ORACLE_SCD2,
    "ots_col_parser": ORACLE_OTS_PARSER,
    "dts_decode": ORACLE_DTS_DECODE,
    "loghub_roundtrip": ORACLE_LOGHUB,
    "lr_scoring": ORACLE_LR,
}
