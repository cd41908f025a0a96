"""Connector-semantics unit tests: filter compiler (incl. De Morgan
normalization, mirroring TableStoreFilterSuite's composite coverage),
pushdown reaching the parquet scan, unhandled-filter split, CDC
merge-apply, DTS decode, LR scoring."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.udfs import from_dts_record, score_dataframe
from aliyun_emapreduce_datasources_spark.sources.cdc import apply_cdc
from aliyun_emapreduce_datasources_spark.sources.kv import (
    KVCatalog,
    KVTable,
    compile_filter,
    split_supported,
)
from aliyun_emapreduce_datasources_spark.sources.queries import KV_CUSTOMER_CATALOG


def test_catalog_json_schema(spark):
    cat = KVCatalog.from_json(KV_CUSTOMER_CATALOG)
    assert cat.primary_keys == ["c_custkey"]
    assert [f.name for f in cat.schema().fields] == [
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
    ]


@pytest.mark.parametrize(
    "node,keep_ids",
    [
        (("not", ("eq", "x", 1)), {2, 3}),
        # De Morgan: Not(And(a,b)) -> Or(Not a, Not b)
        (("not", ("and", ("gt", "x", 1), ("le", "y", 20))), {1, 3}),
        (("not", ("or", ("isnull", "y"), ("eq", "x", 2))), {1, 3}),
        (("not", ("not", ("ge", "x", 2))), {2, 3}),
        (("and", ("in", "x", [1, 2]), ("startswith", "s", "a")), {1}),
        (("not", ("startswith", "s", "a")), {2, 3}),
    ],
)
def test_filter_compiler_semantics(spark, node, keep_ids):
    df = spark.createDataFrame(
        [(1, 10, "ab"), (2, 20, "bc"), (3, 30, "cd")], "x int, y int, s string"
    )
    got = {r.x for r in df.where(compile_filter(node)).collect()}
    assert got == keep_ids


def test_filter_compiler_de_morgan_structure(spark):
    # a negated composite must compile to dual leaves, not a NOT wrapper
    # (TableStoreFilter pushes Not through — the store can't evaluate NOT)
    col = compile_filter(("not", ("and", ("gt", "x", 1), ("le", "y", 2))))
    assert "!" not in str(col) and "NOT" not in str(col).upper()


def test_split_supported_residual():
    good = ("and", ("eq", "a", 1), ("in", "b", [1, 2]))
    bad = ("and", ("eq", "a", 1), ("regex", "b", ".*"))
    pushable, residual = split_supported([good, bad])
    assert pushable == [good] and residual == [bad]


def test_kv_scan_pushdown_reaches_parquet(spark, sf_dir):
    table = KVTable(
        KVCatalog.from_json(KV_CUSTOMER_CATALOG), os.path.join(sf_dir, "customer.parquet")
    )
    df = table.scan(
        spark,
        ["c_custkey", "c_acctbal"],
        [("ge", "c_acctbal", 0.0), ("eq", "c_mktsegment", "BUILDING")],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(c_acctbal,0.0)" in plan
    assert "EqualTo(c_mkts" in plan  # plan text truncates long filter lists
    # column pruning: scan schema must not include unprojected columns
    assert "c_name" not in plan.split("ReadSchema")[1][:200]
    # and the whole pipeline stays in whole-stage codegen
    assert "*(1)" in plan


def test_apply_cdc_semantics(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, name string, v double"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 21.0, "UPDATE", 5),   # update wins
            (2, "bX", 99.0, "UPDATE", 3),   # stale, ignored
            (3, "c", 30.0, "DELETE", 1),    # delete drops
            (4, "d", 40.0, "PUT", 1),       # insert
        ],
        "k long, name string, v double, __ots_record_type__ string, __ots_record_timestamp__ long",
    )
    out = {r.k: (r.name, r.v) for r in apply_cdc(snap, changes, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 4: ("d", 40.0)}


def test_from_dts_record_roundtrip(spark):
    df = spark.createDataFrame([(1,)], "id long").select(
        F.to_json(
            F.struct(
                F.lit(7).cast("long").alias("recordID"),
                F.lit("mysql").alias("source"),
                F.lit("db.t").alias("dbTable"),
                F.lit("UPDATE").alias("recordType"),
                F.lit("2024-01-01 00:00:00").cast("timestamp").alias("recordTimestamp"),
                F.lit("{}").alias("extraTags"),
                F.lit(None).cast("string").alias("fields"),
                F.lit('{"x": 1}').alias("beforeImages"),
                F.lit('{"x": 2}').alias("afterImages"),
            )
        ).alias("value")
    )
    r = df.select(from_dts_record("value").alias("r")).select("r.*").head()
    assert (r.recordID, r.source, r.dbTable, r.recordType) == (7, "mysql", "db.t", "UPDATE")
    assert r.beforeImages == '{"x": 1}' and r.afterImages == '{"x": 2}'


def test_lr_scorer_matches_manual(spark):
    coef = [0.5, -0.25]
    df = spark.createDataFrame([(1, [2.0, 4.0]), (2, [-2.0, 0.0])], "id long, f array<double>")
    rows = {r.id: r for r in score_dataframe(df, "f", coef, 0.1).collect()}
    z1 = 2.0 * 0.5 + 4.0 * -0.25 + 0.1
    assert abs(rows[1].prob - 1 / (1 + math.exp(-z1))) < 1e-12
    assert rows[1].pred_class == 1 and rows[2].pred_class == 0


def test_json_ingest_permissive_corrupt_records(spark, tmp_path):
    """Malformed-line handling on the Loghub-style JSON read path
    (LoghubSourceRDD parse behavior: bad wire records must not kill
    the batch): PERMISSIVE mode parks unparseable lines in
    _corrupt_record, DROPMALFORMED yields only the clean rows, and
    counts reconcile."""
    import json as _json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    p = tmp_path / "mixed.json"
    good = [{"k": i, "v": f"r{i}"} for i in range(8)]
    lines = [_json.dumps(g) for g in good]
    bad = ['{"k": 3, "v": unquoted}', "not json at all", '{"k": }']
    for i, b in enumerate(bad):
        lines.insert(2 * i + 1, b)
    p.write_text("\n".join(lines) + "\n")

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    ).cache()  # SPARK-21610: corrupt-record queries need the full scan
    try:
        n_bad = df.where(F.col("_corrupt_record").isNotNull()).count()
        n_good = df.where(F.col("_corrupt_record").isNull()).count()
        assert n_bad == len(bad)
        assert n_good == len(good)
        got = {
            (r.k, r.v)
            for r in df.where(F.col("_corrupt_record").isNull()).collect()
        }
        assert got == {(g["k"], g["v"]) for g in good}
    finally:
        df.unpersist()

    dropped = (
        spark.read.schema(T.StructType(schema.fields[:2]))
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert dropped.count() == len(good)
