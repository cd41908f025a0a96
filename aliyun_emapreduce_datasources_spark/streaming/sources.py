"""Stream-table abstraction: the reference's `CREATE TABLE ... USING
kafka OPTIONS(...)` registration (S31; emr-baseline-testing/tables/
kafka_store_sales.sql:1-14) re-expressed over public readStream
sources, plus the connector record shapes:

- Loghub system columns (S12; LoghubSourceProvider.scala:249-268):
  every record carries __logProject__/__logStore__/__shard__/__time__/
  __topic__/__source__ plus the user payload — here synthesized from
  the file-source metadata and a JSON `__value__` bag, with
  schema-on-read typed extraction like Utils.makeConverter
  (Utils.scala:101-152).
- TableStore CDC schema augmentation (S6; TableStoreSource.scala:
  214-229): user schema + __ots_record_type__/__ots_record_timestamp__
  + per-column __ots_column_type_<c>.

The Kafka wire format itself is unavailable in this container (no
spark-sql-kafka jar), so the transport is the file source — the
micro-batch semantics (offset tracking, replay, maxFilesPerTrigger
rate limiting mirroring S9's maxOffsetsPerTrigger) are identical.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["StreamTable", "loghub_schema", "with_loghub_columns", "cdc_schema", "replay_to_json_dir"]


LOGHUB_SYSTEM_COLUMNS = [
    "__logProject__",
    "__logStore__",
    "__shard__",
    "__time__",
    "__topic__",
    "__source__",
]


def loghub_schema() -> T.StructType:
    """Default Loghub record schema: all-string system columns + JSON
    bag (LoghubSourceProvider.scala:249-268)."""
    return T.StructType(
        [T.StructField(c, T.StringType()) for c in LOGHUB_SYSTEM_COLUMNS]
        + [T.StructField("__value__", T.StringType())]
    )


def with_loghub_columns(df: DataFrame, project: str, store: str) -> DataFrame:
    """Wrap a payload DataFrame in the Loghub record shape: system
    columns + the payload as a JSON `__value__` bag."""
    payload = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.select(
        F.lit(project).alias("__logProject__"),
        F.lit(store).alias("__logStore__"),
        (F.spark_partition_id().cast("string")).alias("__shard__"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd HH:mm:ss").alias("__time__"),
        F.lit("").alias("__topic__"),
        F.lit("file://local").alias("__source__"),
        payload.alias("__value__"),
    )


def parse_loghub_value(df: DataFrame, user_schema: T.StructType) -> DataFrame:
    """Schema-on-read typed extraction of the JSON bag — the public
    equivalent of Loghub's per-field makeConverter (Utils.scala:
    101-152): from_json + casts, all JVM-side."""
    parsed = df.withColumn("_p", F.from_json("__value__", user_schema))
    return parsed.select(
        *[F.col(c) for c in df.columns if c != "__value__"],
        *[F.col(f"_p.{f.name}").alias(f.name) for f in user_schema.fields],
    )


def cdc_schema(user_schema: T.StructType) -> T.StructType:
    """TableStore CDC stream schema: user columns + record-level and
    per-column op-type metadata (TableStoreSource.scala:214-229)."""
    fields = list(user_schema.fields)
    fields.append(T.StructField("__ots_record_type__", T.StringType()))
    fields.append(T.StructField("__ots_record_timestamp__", T.LongType()))
    for f in user_schema.fields:
        fields.append(T.StructField(f"__ots_column_type_{f.name}", T.StringType()))
    return T.StructType(fields)


@dataclass
class StreamTable:
    """A registered stream table (S31 DDL equivalent).

    options mirror the reference DDL: `path` (transport location),
    `maxFilesPerTrigger` (rate limit, S9's maxOffsetsPerTrigger),
    `watermark.column`/`watermark.delay` (delay() declaration),
    `output.mode` for the sink half.
    """

    name: str
    schema: T.StructType
    path: str
    options: dict[str, str] = field(default_factory=dict)

    def read_stream(self, spark: SparkSession) -> DataFrame:
        reader = spark.readStream.schema(self.schema).format("json")
        if "maxFilesPerTrigger" in self.options:
            reader = reader.option("maxFilesPerTrigger", self.options["maxFilesPerTrigger"])
        df = reader.load(self.path)
        wm_col = self.options.get("watermark.column")
        if wm_col:
            df = df.withWatermark(wm_col, self.options.get("watermark.delay", "0 seconds"))
        return df

    def read_batch(self, spark: SparkSession) -> DataFrame:
        """Bounded read of the same table (Loghub batch relation S11)."""
        return spark.read.schema(self.schema).json(self.path)


def replay_to_json_dir(
    df: DataFrame,
    out_dir: str,
    n_chunks: int = 4,
    order_col: str | None = None,
    late_fraction: float = 0.0,
    late_chunk_shift: int = 1,
    max_rows_per_chunk: int | None = None,
) -> list[str]:
    """Materialize a batch DataFrame as n_chunks JSON files so the file
    source replays it as micro-batches (the test-harness equivalent of
    the reference's Kafka replication simulator, Utils.toRdd).

    ``late_fraction`` mirrors the simulator's late-data profile
    (emr-baseline-testing Utils.toRdd: `rand1 < 5` marks ≤5% of rows
    late, delivered up to 300 s behind): that share of rows keeps its
    event time but is *delivered* ``late_chunk_shift`` micro-batches
    after its event-time position — arriving behind the watermark the
    on-time rows have advanced. Lateness is a deterministic md5 coin
    on the row payload, so the same input always produces the same
    late set (the simulator uses an RNG; a differential-test harness
    cannot). Stragglers past the final chunk create trailing chunks.

    ``max_rows_per_chunk`` mirrors the simulator's per-partition
    ``ThroughputThrottler`` (Utils.scala replicateToKafka: producer
    capped at `throughput` records/sec): any chunk above the cap is
    split into consecutive same-order files, so with
    ``maxFilesPerTrigger 1`` the file source's per-trigger intake is
    rate-bounded the way the Kafka consumer's was — deterministically,
    instead of by wall clock.

    Timestamps are written as ISO strings readable by the JSON source.
    """
    os.makedirs(out_dir, exist_ok=True)
    rows = df.toJSON().collect()
    if order_col is not None:
        # (is-null, stringified value) key: `or ""` would coerce falsy
        # numerics (0, 0.0) to "" — a TypeError against int keys and a
        # silent misorder even for strings; str() keeps one comparable
        # type with nulls sorted first
        def _key(r: str):
            v = json.loads(r).get(order_col)
            return (v is None, "" if v is None else str(v))

        rows = sorted(rows, key=_key)
    chunk = max(1, (len(rows) + n_chunks - 1) // n_chunks)
    by_chunk: dict[int, list[str]] = {}
    for pos, r in enumerate(rows):
        ci = pos // chunk
        if late_fraction > 0.0:
            coin = int(hashlib.md5(r.encode()).hexdigest()[:8], 16) % 1000
            if coin < late_fraction * 1000:
                ci += late_chunk_shift
        by_chunk.setdefault(ci, []).append(r)
    paths = []
    base_mtime = int(os.path.getmtime(out_dir))
    seq = 0
    for ci in sorted(by_chunk):
        rows_ci = by_chunk[ci]
        cap = max_rows_per_chunk or len(rows_ci) or 1
        for part0 in range(0, max(len(rows_ci), 1), cap):
            p = os.path.join(out_dir, f"chunk-{ci:04d}-{part0 // cap:03d}.json")
            with open(p, "w") as fh:
                fh.write("\n".join(rows_ci[part0 : part0 + cap]))
            # FileStreamSource batches files by MODIFICATION TIME, not
            # name: strictly increasing mtimes make replay order =
            # chunk order (otherwise same-second writes replay in
            # arbitrary order and "earlier" chunks arrive behind the
            # watermark).
            mt = base_mtime + seq
            os.utime(p, (mt, mt))
            paths.append(p)
            seq += 1
    return paths
