"""Avro wire-format + schema-registry contract tests (SURVEY.md §7
hard parts (c) decimal round-trip and (e) subset-schema validation)."""

from __future__ import annotations

import decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.streaming.avro_codec import (
    avro_schema_for,
    decode_avro,
    encode_avro,
    spark_schema_for,
)
from aliyun_emapreduce_datasources_spark.streaming.schema_registry import (
    SchemaRegistry,
    SchemaValidationError,
    validate_subset_schema,
)

MONEY_SCHEMA = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType(), False),
        T.StructField("o_totalprice", T.DecimalType(18, 2), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_orderdate", T.TimestampType(), True),
    ]
)


def test_schema_mapping_round_trip():
    avro = avro_schema_for(MONEY_SCHEMA, "Orders")
    assert spark_schema_for(avro) == MONEY_SCHEMA
    assert '"logicalType": "decimal"' in avro
    assert '"logicalType": "timestamp-millis"' in avro


def test_decimal_money_round_trip(spark, sf_dir):
    """decimal-in-Avro: encode orders money as decimal(18,2) bytes,
    decode, values must be exactly equal (no float detour)."""
    orders = (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("o_totalprice"),
            "o_orderstatus",
            "o_orderdate",
        )
        .limit(200)
    )
    avro = avro_schema_for(MONEY_SCHEMA, "Orders")
    decoded = decode_avro(encode_avro(orders, avro), avro)
    want = {r.o_orderkey: r for r in orders.collect()}
    got = {r.o_orderkey: r for r in decoded.collect()}
    assert want.keys() == got.keys() and len(want) == 200
    for k, w in want.items():
        g = got[k]
        assert isinstance(g.o_totalprice, decimal.Decimal)
        assert g.o_totalprice == w.o_totalprice, k
        assert g.o_orderstatus == w.o_orderstatus
        # timestamp-millis truncates micros — orders dates are whole days
        assert g.o_orderdate == w.o_orderdate


def test_nullable_union_encodes_nulls(spark):
    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    df = spark.createDataFrame([(1, "a"), (2, None), (3, "c")], schema)
    avro = avro_schema_for(schema, "KV")
    got = {r.k: r.v for r in decode_avro(encode_avro(df, avro), avro).collect()}
    assert got == {1: "a", 2: None, 3: "c"}


def test_registry_versioning_and_subset(tmp_path):
    reg = SchemaRegistry(str(tmp_path / "registry.json"))
    v1 = avro_schema_for(MONEY_SCHEMA, "Orders")
    assert reg.register("orders-value", v1) == 1
    assert reg.register("orders-value", v1) == 1  # idempotent
    wider = T.StructType(list(MONEY_SCHEMA.fields) + [T.StructField("extra", T.LongType(), True)])
    assert reg.register("orders-value", avro_schema_for(wider, "Orders")) == 2
    assert reg.latest_spark_schema("orders-value") == wider

    # persisted across reopen
    reg2 = SchemaRegistry(str(tmp_path / "registry.json"))
    assert reg2.latest_spark_schema("orders-value") == wider

    # user schema may be a column subset
    user = T.StructType([T.StructField("o_orderkey", T.LongType(), False)])
    reg2.check_user_schema("orders-value", user)


def test_avro_wire_stream_end_to_end(spark, sf_dir, tmp_path):
    """Corpus S31 shape on the file transport: rows → Avro binary
    payloads (registry-validated schema) → micro-batch stream →
    decode_avro → windowless agg converges to the batch answer with
    exact decimal money."""
    import base64
    import uuid

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DecimalType(18, 2), True),
        ]
    )
    avro = avro_schema_for(schema, "Events")
    reg = SchemaRegistry()
    reg.register("events-value", avro)
    reg.check_user_schema("events-value", schema)

    ev = t(spark, sf_dir, "events").select(
        "event_id", "event_type", F.col("value").cast("decimal(18,2)").alias("value")
    )
    payloads = [bytes(r.value) for r in encode_avro(ev, avro).collect()]
    import json as _json
    import os

    d = str(tmp_path / "avro_stream")
    os.makedirs(d)
    n_chunks = 3
    chunk = (len(payloads) + n_chunks - 1) // n_chunks
    for i in range(0, len(payloads), chunk):
        p = os.path.join(d, f"c{i // chunk:04d}.json")
        with open(p, "w") as fh:
            fh.write(
                "\n".join(
                    _json.dumps({"value": base64.b64encode(v).decode()})
                    for v in payloads[i : i + chunk]
                )
            )
        os.utime(p, (1_700_000_000 + i // chunk, 1_700_000_000 + i // chunk))

    wire_schema = T.StructType([T.StructField("value", T.StringType())])
    stream = (
        spark.readStream.schema(wire_schema)
        .option("maxFilesPerTrigger", "1")
        .json(d)
        .select(F.unbase64("value").alias("value"))
    )
    decoded = decode_avro(stream, reg.latest("events-value"))
    agg = decoded.groupBy("event_type").agg(
        F.sum("value").alias("total"), F.count(F.lit(1)).alias("cnt")
    )
    name = f"avro_{uuid.uuid4().hex[:8]}"
    q = agg.writeStream.format("memory").queryName(name).outputMode("complete").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.event_type: (r.total, r.cnt) for r in spark.table(name).collect()}
    want = {
        r.event_type: (r.total, r.cnt)
        for r in ev.groupBy("event_type")
        .agg(F.sum("value").alias("total"), F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_subset_validation_rejects():
    registered = MONEY_SCHEMA
    with pytest.raises(SchemaValidationError, match="not in registered"):
        validate_subset_schema(
            T.StructType([T.StructField("nope", T.LongType())]), registered
        )
    with pytest.raises(SchemaValidationError, match="declared"):
        validate_subset_schema(
            T.StructType([T.StructField("o_totalprice", T.DoubleType())]), registered
        )
    with pytest.raises(SchemaValidationError, match="NOT NULL"):
        validate_subset_schema(
            T.StructType([T.StructField("o_totalprice", T.DecimalType(18, 2), False)]),
            registered,
        )


def test_timestamp_millis_is_instant_under_non_utc_session_tz(spark):
    """The wire payload's timestamp-millis must be true epoch millis
    under ANY session timezone (the reference Avro schemas define an
    instant), and decode must round-trip the instant."""
    import io

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from aliyun_emapreduce_datasources_spark.streaming.avro_codec import _read_varint

    epoch_s = 1_704_110_400  # 2024-01-01T12:00:00Z
    schema = T.StructType([T.StructField("ts", T.TimestampType())])
    avro = avro_schema_for(schema, "TsRec")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = spark.range(1).select(F.timestamp_seconds(F.lit(epoch_s)).alias("ts"))
        raw = encode_avro(df, avro).collect()[0].value
        # field is a nullable union: branch varint then the millis
        buf = io.BytesIO(bytes(raw))
        _read_varint(buf)  # union branch
        assert _read_varint(buf) == epoch_s * 1000, "wire value is not epoch millis"
        back = decode_avro(encode_avro(df, avro), avro).collect()[0].ts
        assert int(back.timestamp()) == epoch_s
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
