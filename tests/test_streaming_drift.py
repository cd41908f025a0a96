"""Streaming drift-monitor counts == batch recomputation, and the TV
distance computed from the streamed histogram == the batch TV between
the two halves of the month (the events_drift_tv semantics)."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.streaming.sources import (
    StreamTable,
    replay_to_json_dir,
)
from aliyun_emapreduce_datasources_spark.streaming.windows import (
    windowed_value_histogram,
)
from tests.test_stateful import EVENTS_SCHEMA


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="drift-stream-")
    replay_to_json_dir(t(spark, sf_dir, "events"), d, n_chunks=4, order_col="ts")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streamed_histogram_matches_batch_and_tv(spark, sf_dir, stream_dir):
    st = StreamTable("events", EVENTS_SCHEMA, stream_dir, {"maxFilesPerTrigger": "1"})
    # startTime 13 days re-anchors the epoch-aligned 15-day grid onto
    # [Jan 1, Jan 16) / [Jan 16, Jan 31) — the batch monitor's boundary
    hist = windowed_value_histogram(
        st.read_stream(spark), duration="15 days", start_time="13 days"
    )
    name = f"drift_{uuid.uuid4().hex[:8]}"
    q = (
        hist.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.table(name)

    batch = windowed_value_histogram(
        t(spark, sf_dir, "events"), duration="15 days", start_time="13 days"
    )
    got = {(r.window_start, r.event_type, r.bucket): r.n for r in streamed.collect()}
    want = {(r.window_start, r.event_type, r.bucket): r.n for r in batch.collect()}
    assert got == want

    # fold the streamed histogram into per-type TV between the two
    # 15-day windows and compare against the catalog batch monitor
    # (whose reference boundary 2024-01-16 == the second window start)
    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES

    rows = streamed.collect()
    starts = sorted({r.window_start for r in rows})
    assert len(starts) == 2
    per_type: dict = {}
    for r in rows:
        a, b = per_type.setdefault((r.event_type, r.bucket), [0, 0])
        if r.window_start == starts[0]:
            per_type[(r.event_type, r.bucket)][0] = r.n
        else:
            per_type[(r.event_type, r.bucket)][1] = r.n
    tv: dict = {}
    for et in {k[0] for k in per_type}:
        ta = sum(v[0] for k, v in per_type.items() if k[0] == et)
        tb = sum(v[1] for k, v in per_type.items() if k[0] == et)
        num = sum(abs(v[0] * tb - v[1] * ta) for k, v in per_type.items() if k[0] == et)
        tv[et] = (1000 * num) // (2 * ta * tb)
    batch_tv = {
        r.event_type: r.tv_milli
        for r in QUERIES["events_drift_tv"](spark, sf_dir).collect()
    }
    assert tv == batch_tv
