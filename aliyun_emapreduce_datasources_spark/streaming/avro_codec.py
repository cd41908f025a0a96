"""Avro binary codec for stream-table payloads.

The reference corpus moves every stream record as Avro with a schema
registry: nullable unions for every field, money as ``bytes`` +
``logicalType: decimal(7,2)``, event time as ``long`` + ``logicalType:
timestamp-millis`` (emr-baseline-testing/src/main/resources/avro/.../
StoreSales.avsc; SURVEY.md §1.2). SURVEY.md §7 hard part (c) is the
decimal-in-Avro round trip.

This container has no spark-avro jar (and no network), so the wire
format is implemented here as a pure-Python minimal Avro binary codec
(zigzag varints, length-prefixed bytes, IEEE doubles, two's-complement
big-endian decimals — Apache Avro spec §Binary Encoding) running in
``mapInPandas``. Schema generation (Spark StructType → Avro record
schema with nullable unions + logical types) is the part that carries
over unchanged to a real deployment; on a cluster with spark-avro
loaded, swap ``encode_avro``/``decode_avro`` for ``to_avro``/
``from_avro`` and keep ``avro_schema_for`` output as the registry
schema. The codec is NOT a 100 TB hot path — it is the correctness
reference for the wire semantics (and the test harness transport).

Supported Spark types (the corpus' surface): long/int, string, double,
boolean, binary, decimal(p,s) ≤ 38 digits, timestamp (micros ↔
timestamp-millis with truncation like the corpus schemas).
"""

from __future__ import annotations

import decimal
import io
import json
import struct
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["avro_schema_for", "spark_schema_for", "encode_avro", "decode_avro"]


# --- schema mapping ----------------------------------------------------

def _avro_type(f: T.StructField) -> object:
    dt = f.dataType
    if isinstance(dt, T.LongType):
        base: object = "long"
    elif isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        base = "int"
    elif isinstance(dt, T.StringType):
        base = "string"
    elif isinstance(dt, T.DoubleType):
        base = "double"
    elif isinstance(dt, T.FloatType):
        base = "float"
    elif isinstance(dt, T.BooleanType):
        base = "boolean"
    elif isinstance(dt, T.BinaryType):
        base = "bytes"
    elif isinstance(dt, T.DecimalType):
        base = {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    elif isinstance(dt, T.TimestampType):
        base = {"type": "long", "logicalType": "timestamp-millis"}
    else:
        raise TypeError(f"unsupported Spark type for Avro: {dt}")
    return ["null", base] if f.nullable else base


def avro_schema_for(schema: T.StructType, name: str, namespace: str = "engine.streams") -> str:
    """Avro record schema JSON for a Spark schema — corpus style:
    every nullable field becomes a ["null", T] union."""
    return json.dumps(
        {
            "type": "record",
            "name": name,
            "namespace": namespace,
            "fields": [{"name": f.name, "type": _avro_type(f)} for f in schema.fields],
        }
    )


def spark_schema_for(avro_json: str) -> T.StructType:
    """Inverse mapping: Avro record schema → Spark StructType."""
    rec = json.loads(avro_json)
    fields = []
    for f in rec["fields"]:
        ft = f["type"]
        nullable = isinstance(ft, list)
        if nullable:
            ft = next(t0 for t0 in ft if t0 != "null")
        if isinstance(ft, dict):
            if ft.get("logicalType") == "decimal":
                dt: T.DataType = T.DecimalType(ft["precision"], ft["scale"])
            elif ft.get("logicalType") == "timestamp-millis":
                dt = T.TimestampType()
            else:
                raise TypeError(f"unsupported Avro type: {ft}")
        else:
            dt = {
                "long": T.LongType(),
                "int": T.IntegerType(),
                "string": T.StringType(),
                "double": T.DoubleType(),
                "float": T.FloatType(),
                "boolean": T.BooleanType(),
                "bytes": T.BinaryType(),
            }[ft]
        fields.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(fields)


# --- binary encoding (Avro spec) ---------------------------------------

def _write_varint(buf: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)  # zigzag
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
            return


def _read_varint(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _encode_value(buf: io.BytesIO, ft: object, v: object) -> None:
    if isinstance(ft, list):  # nullable union: branch index then value
        if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NaT:
            _write_varint(buf, ft.index("null"))
            return
        branch = next(i for i, t0 in enumerate(ft) if t0 != "null")
        _write_varint(buf, branch)
        _encode_value(buf, ft[branch], v)
        return
    if isinstance(ft, dict):
        lt = ft.get("logicalType")
        if lt == "decimal":
            unscaled = int(decimal.Decimal(v).scaleb(ft["scale"]).to_integral_value())
            raw = unscaled.to_bytes((unscaled.bit_length() + 8) // 8 or 1, "big", signed=True)
            _write_varint(buf, len(raw))
            buf.write(raw)
        elif lt == "timestamp-millis":
            if isinstance(v, pd.Timestamp):
                ms = v.value // 1_000_000
            elif isinstance(v, datetime):
                ms = int(v.replace(tzinfo=v.tzinfo or timezone.utc).timestamp() * 1000)
            else:
                ms = int(v)
            _write_varint(buf, ms)
        else:
            raise TypeError(f"unsupported logical type {ft}")
    elif ft in ("long", "int"):
        _write_varint(buf, int(v))
    elif ft == "string":
        raw = str(v).encode("utf-8")
        _write_varint(buf, len(raw))
        buf.write(raw)
    elif ft == "bytes":
        raw = bytes(v)
        _write_varint(buf, len(raw))
        buf.write(raw)
    elif ft == "double":
        buf.write(struct.pack("<d", float(v)))
    elif ft == "float":
        buf.write(struct.pack("<f", float(v)))
    elif ft == "boolean":
        buf.write(b"\x01" if v else b"\x00")
    else:
        raise TypeError(f"unsupported Avro type {ft}")


def _decode_value(buf: io.BytesIO, ft: object) -> object:
    if isinstance(ft, list):
        branch = _read_varint(buf)
        if ft[branch] == "null":
            return None
        return _decode_value(buf, ft[branch])
    if isinstance(ft, dict):
        lt = ft.get("logicalType")
        if lt == "decimal":
            n = _read_varint(buf)
            unscaled = int.from_bytes(buf.read(n), "big", signed=True)
            return decimal.Decimal(unscaled).scaleb(-ft["scale"])
        if lt == "timestamp-millis":
            ms = _read_varint(buf)
            return pd.Timestamp(ms, unit="ms")
        raise TypeError(f"unsupported logical type {ft}")
    if ft in ("long", "int"):
        return _read_varint(buf)
    if ft == "string":
        n = _read_varint(buf)
        return buf.read(n).decode("utf-8")
    if ft == "bytes":
        n = _read_varint(buf)
        return buf.read(n)
    if ft == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if ft == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if ft == "boolean":
        return buf.read(1) == b"\x01"
    raise TypeError(f"unsupported Avro type {ft}")


# --- DataFrame-level encode/decode -------------------------------------

def encode_avro(df: DataFrame, avro_json: str) -> DataFrame:
    """DataFrame → single ``value: binary`` column of Avro records
    (the Kafka wire payload shape, S31).

    mapInPandas delivers timestamps tz-NAIVE in the *session* timezone,
    while Avro timestamp-millis is an instant (epoch millis). Localize
    to the session TZ before taking epoch values, so the wire payload
    carries true instants under any session TZ (not just UTC)."""
    rec = json.loads(avro_json)
    field_types = [(f["name"], f["type"]) for f in rec["fields"]]
    out_schema = T.StructType([T.StructField("value", T.BinaryType())])
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    ts_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.TimestampType)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for c in ts_cols:
                if pdf[c].dt.tz is None:
                    # DST transitions: the fall-back hour is genuinely
                    # ambiguous in wall-clock form (pick the DST side
                    # deterministically), spring-forward gaps shift
                    # forward — pandas' default is to CRASH the task
                    pdf[c] = pdf[c].dt.tz_localize(
                        session_tz, ambiguous=True, nonexistent="shift_forward"
                    )
            vals = []
            for row in pdf.itertuples(index=False):
                buf = io.BytesIO()
                for (name, ft), v in zip(field_types, row):
                    _encode_value(buf, ft, v)
                vals.append(buf.getvalue())
            yield pd.DataFrame({"value": pd.Series(vals, dtype=object)})

    cols = [f["name"] for f in rec["fields"]]
    return df.select(*cols).mapInPandas(run, out_schema)


def decode_avro(df: DataFrame, avro_json: str, value_col: str = "value") -> DataFrame:
    """``value: binary`` Avro payloads → typed columns per the schema
    (the from_avro equivalent).

    Inverse TZ handling of :func:`encode_avro`: decoded epoch millis
    are rendered as session-TZ wall-clock naive timestamps, which is
    what Spark expects back from mapInPandas — so decode(encode(x)) is
    the identity on instants under any session TZ."""
    rec = json.loads(avro_json)
    field_types = [(f["name"], f["type"]) for f in rec["fields"]]
    out_schema = spark_schema_for(avro_json)
    session_tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    ts_fields = {f.name for f in out_schema.fields if isinstance(f.dataType, T.TimestampType)}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {name: [] for name, _ in field_types}
            for raw in pdf[value_col]:
                buf = io.BytesIO(bytes(raw))
                for name, ft in field_types:
                    rows[name].append(_decode_value(buf, ft))
            out = pd.DataFrame({k: pd.Series(v, dtype=object) for k, v in rows.items()})
            for c in ts_fields & set(out.columns):
                out[c] = (
                    pd.to_datetime(out[c], utc=True)
                    .dt.tz_convert(session_tz)
                    .dt.tz_localize(None)
                )
            yield out

    return df.select(value_col).mapInPandas(run, out_schema)


