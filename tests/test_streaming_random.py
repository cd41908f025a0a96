"""Randomized streaming-vs-batch differential: hypothesis composes a
windowed aggregation (tumbling/hopping × agg function × group key ×
filter), runs it once as a Structured Streaming query over the
chunked replay and once as a batch plan over the same parquet, and
the complete-mode result must equal the batch answer exactly.

Extends the randomized differential family (filter trees →
aggregation plans → join trees → window functions) to *incremental
execution*: any divergence here is a streaming-semantics bug
(partial-state merge, window assignment, filter pushdown into the
stream), not a plan-shape preference. Sums use the decimal-exact
convention so equality is exact; timestamps replay at millisecond
precision, which hour-aligned windows absorb.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F
from pyspark.sql import types as T

from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.streaming.sources import (
    StreamTable,
    replay_to_json_dir,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

WINDOWS = [("2 hours", None), ("1 hour", None), ("2 hours", "1 hour")]
KEYS = {"none": None, "type": "event_type", "user_mod": "user_mod"}
FILTERS = {
    "none": None,
    "views": lambda: F.col("event_type") == "view",
    "big": lambda: F.col("value") > 5.0,
}
AGGS = {
    "cnt": lambda: F.count(F.lit(1)).alias("v"),
    "sum_val": lambda: F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"),
    "min_val": lambda: F.min("value").alias("v"),
    "max_ev": lambda: F.max("event_id").alias("v"),
}

_case = st.builds(
    lambda w, k, f, a: (w, k, f, a),
    w=st.sampled_from(range(len(WINDOWS))),
    k=st.sampled_from(sorted(KEYS)),
    f=st.sampled_from(sorted(FILTERS)),
    a=st.sampled_from(sorted(AGGS)),
)


@pytest.fixture(scope="module")
def replay_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="rand-stream-")
    replay_to_json_dir(t(spark, sf_dir, "events"), d, n_chunks=3, order_col="ts")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _plan(df, wi, key, filt, agg):
    dur, slide = WINDOWS[wi]
    if FILTERS[filt] is not None:
        df = df.where(FILTERS[filt]())
    df = df.withColumn("user_mod", (F.col("user_id") % 10).cast("long"))
    win = F.window("ts", dur, slide) if slide else F.window("ts", dur)
    keys = [win.start.alias("ws")]
    if KEYS[key]:
        keys.append(F.col(KEYS[key]))
    return df.groupBy(*keys).agg(AGGS[agg]())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=_case)
def test_random_streaming_agg_matches_batch(case, spark, sf_dir, replay_dir):
    wi, key, filt, agg = case
    stream = StreamTable("events", EVENTS_SCHEMA, replay_dir, {"maxFilesPerTrigger": "1"}).read_stream(spark)
    name = f"rs_{uuid.uuid4().hex[:8]}"
    q = (
        _plan(stream, wi, key, filt, agg)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r[:-1]): r[-1] for r in spark.table(name).collect()}

    # batch twin on ms-truncated timestamps (the replay wire format)
    ev = t(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_millis((F.unix_micros("ts") / 1000).cast("long"))
    )
    want = {tuple(r[:-1]): r[-1] for r in _plan(ev, wi, key, filt, agg).collect()}
    assert got == want
    assert len(got) > 0
