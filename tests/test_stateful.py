"""Custom stateful operator test: applyInPandasWithState session
windows must agree with the batch lag-gap sessionization on every
CLOSED session (open sessions legitimately stay in state at
end-of-stream)."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.streaming.sources import StreamTable, replay_to_json_dir
from aliyun_emapreduce_datasources_spark.streaming.stateful import sessionize_stream
from tests.test_streaming import EVENTS_SCHEMA

GAP = "30 minutes"


def batch_sessions(spark, sf_dir):
    """(user_id, session_start, session_end, n_events) via lag-gap.

    ts floored to millis — the stream side reads the JSON replay,
    whose toJSON serialization floors timestamps to milliseconds.
    """
    ev = t(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_millis(F.unix_millis("ts"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > 30 * 60, 1).otherwise(0),
    ).withColumn("sess_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return flagged.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="sess-stream-")
    replay_to_json_dir(t(spark, sf_dir, "events"), d, n_chunks=4, order_col="ts")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_sessionize_stream_matches_batch_closed_sessions(spark, sf_dir, stream_dir):
    st = StreamTable("events", EVENTS_SCHEMA, stream_dir, {"maxFilesPerTrigger": "1"})
    sessions = sessionize_stream(st.read_stream(spark), gap=GAP, watermark_delay="1 minute")
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = sessions.writeStream.format("memory").queryName(name).outputMode("append").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table(name).collect()
    }
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in batch_sessions(spark, sf_dir).collect()
    }
    # every emitted (closed) session must be a real batch session
    assert got, "no sessions emitted"
    assert got <= want, f"spurious sessions: {sorted(got - want)[:5]}"
    # and most sessions should have closed by end-of-stream (only the
    # per-user trailing session may remain open)
    n_users = len({u for u, *_ in want})
    assert len(got) >= len(want) - n_users
