"""Streaming EWMA anomaly detector vs a sequential pure-Python
reference over the same (ts, event_id)-ordered event history —
byte-exact because the recursion is integer arithmetic.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.streaming.ewma import (
    ewma_anomaly_stream,
    ewma_step,
)
from aliyun_emapreduce_datasources_spark.streaming.sources import (
    StreamTable,
    replay_to_json_dir,
)
from tests.test_stateful import EVENTS_SCHEMA


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="ewma-stream-")
    replay_to_json_dir(t(spark, sf_dir, "events"), d, n_chunks=4, order_col="ts")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_ewma_stream_matches_sequential_reference(spark, sf_dir, stream_dir):
    st = StreamTable("events", EVENTS_SCHEMA, stream_dir, {"maxFilesPerTrigger": "1"})
    out = ewma_anomaly_stream(st.read_stream(spark))
    name = f"ewma_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.format("memory").queryName(name).outputMode("update").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r.event_id: (r.val_milli, r.ewma_milli, r.adev_milli, r.is_anomaly)
        for r in spark.table(name).collect()
    }

    # sequential reference over the globally-ordered history per key
    hist = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            "ts",
            F.col("event_id").cast("long").alias("event_id"),
            (F.col("value").cast("decimal(18,6)") * 1000).cast("long").alias("x"),
        )
        .orderBy("ts", "event_id")
        .collect()
    )
    state: dict = {}
    want: dict = {}
    for r in hist:
        n, e, d = state.get(r.event_type, (0, 0, 0))
        n2, e2, d2, flag = ewma_step(n, e, d, r.x)
        want[r.event_id] = (r.x, e, d, flag)
        state[r.event_type] = (n2, e2, d2)

    assert len(got) == len(want)
    assert got == want
    # the detector actually fires on this data, and only after warmup
    assert any(v[3] for v in got.values())


def test_ewma_step_semantics():
    # seed: first observation becomes the baseline, never anomalous
    assert ewma_step(0, 0, 0, 1000) == (1, 1000, 0, False)
    # warmup (n < 8) never flags even on a huge deviation
    n, e, d, flag = ewma_step(3, 1000, 1, 10_000_000)
    assert not flag
    # post-warmup large deviation flags, judged on PRE-update baseline
    n, e, d, flag = ewma_step(20, 1000, 10, 1000 + 4 * 10 + 1)
    assert flag
    n, e, d, flag = ewma_step(20, 1000, 10, 1000 + 4 * 10)
    assert not flag
