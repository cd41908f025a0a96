"""Bounded-state evidence for the space-saving heavy hitters and the
TWS sessionizer (r10 verdict ask #8) — the same engine-metrics
protocol as tests/test_interval_join_state.py, including its fixed
drain-polling rule: never assert on the instantaneous final listener
event (the eviction happens in post-watermark no-data batches and the
listener bus is async); poll the collector's snapshot with a bounded
deadline, re-nudging the engine each lap.

Correctness twins live in tests/test_heavy_hitters.py and
tests/test_stateful.py / test_streaming_random.py; the 100 TB risk
pinned HERE is different — state that silently grows with total input
instead of with the operator's own bound (summary capacity x shards;
gap+delay horizon)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.streaming.heavy_hitters import (
    heavy_hitters_stream,
)
from aliyun_emapreduce_datasources_spark.streaming.metrics import (
    StreamingMetricsCollector,
)
from aliyun_emapreduce_datasources_spark.streaming.sources import (
    replay_to_json_dir,
)
from aliyun_emapreduce_datasources_spark.streaming.tws import sessionize_tws


def _observe(spark, q, mc, drain_of=None, deadline_s=120.0):
    """processAllAvailable, then poll the listener snapshot until the
    drain condition holds (or, with no drain condition, until the
    event stream goes quiet), re-nudging the engine each lap."""
    q.processAllAvailable()

    def states():
        return [
            r[9]
            for r in mc.snapshot()
            if r[0] == str(q.id) and r[9] is not None
        ]

    deadline = time.monotonic() + deadline_s
    prev_len = -1
    quiet = 0
    while time.monotonic() < deadline:
        s = states()
        if drain_of is not None:
            if s and s[-1] <= drain_of(s):
                break
        else:
            # no drain to wait for — stop once no new progress events
            # arrive for a few laps (the listener bus has caught up)
            quiet = quiet + 1 if len(s) == prev_len else 0
            prev_len = len(s)
            if quiet >= 3:
                break
        q.processAllAvailable()
        time.sleep(0.5)
    return states()


def test_heavy_hitters_state_is_capacity_bound(spark, tmp_path):
    """numRowsTotal must track n_shards (one summary row per shard),
    NOT the key universe: the replay feeds ~40x more distinct keys
    than the summary capacity and state stays flat."""
    n_chunks, keys_per_chunk, n_shards, capacity = 16, 40, 4, 8
    rows = [
        (f"k{c * keys_per_chunk + j}", float(c * 10 + j % 7))
        for c in range(n_chunks)
        for j in range(keys_per_chunk)
    ]
    df = spark.createDataFrame(rows, "event_type string, v double").select(
        "event_type",
        (F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(
            secs=F.col("v")
        )).alias("ts"),
    )
    d = str(tmp_path / "hh")
    replay_to_json_dir(df, d, n_chunks=n_chunks, order_col="ts")
    stream = (
        spark.readStream.schema("event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(d)
    )
    out = heavy_hitters_stream(
        stream, key_col="event_type", capacity=capacity, n_shards=n_shards
    )
    mc = StreamingMetricsCollector.install(spark)
    q = out.writeStream.format("memory").queryName(
        "hh_state_probe"
    ).outputMode("update").start()
    try:
        states = _observe(spark, q, mc)
    finally:
        q.stop()
        mc.uninstall(spark)

    assert len(states) >= n_chunks - 2, f"too few batches: {len(states)}"
    peak = max(states)
    assert 0 < peak <= n_shards, (peak, states)
    # plateau: once every shard has been touched the count is CONSTANT
    # — any growth with the 640-key universe fails here
    third = len(states) // 3
    assert max(states[2 * third :]) <= max(states[third : 2 * third]), states


N_CHUNKS = 24
USERS_PER_CHUNK = 10
EVENTS_PER_USER = 3
CHUNK_SPACING_S = 1200  # event-time distance between chunks
GAP = "30 minutes"  # 1800 s
DELAY = "10 minutes"  # 600 s
# eviction horizon: a user's session row + gap timer live until the
# watermark (max_ts - delay) passes end + gap -> (1800 + 600) s = 2
# chunks of event time; x3 slack for batch-boundary raggedness
STATE_BOUND = 3 * 2 * USERS_PER_CHUNK  # = 60


def test_tws_sessionizer_state_plateaus_and_drains(spark, tmp_path):
    """Each chunk brings a FRESH cohort of users (state would grow
    linearly with total users if gap-timer eviction broke); the
    far-future flush row advances the watermark past everything so the
    remaining open sessions must close and drain."""
    rows = []
    for c in range(N_CHUNKS):
        for u in range(USERS_PER_CHUNK):
            uid = c * USERS_PER_CHUNK + u
            for j in range(EVENTS_PER_USER):
                rows.append((uid, float(c * CHUNK_SPACING_S + j * 30 + u)))
    rows.append((10**6, float(N_CHUNKS * CHUNK_SPACING_S + 86_400)))
    df = spark.createDataFrame(rows, "user_id long, off double").select(
        "user_id",
        (F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(
            secs=F.col("off")
        )).alias("ts"),
    )
    d = str(tmp_path / "tws")
    replay_to_json_dir(df, d, n_chunks=N_CHUNKS + 1, order_col="ts")
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .json(d)
    )
    out = sessionize_tws(stream, gap=GAP, delay=DELAY)
    # transformWithState requires the RocksDB state store (SPARK-46815)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    mc = StreamingMetricsCollector.install(spark)
    q = out.writeStream.format("memory").queryName(
        "tws_state_probe"
    ).outputMode("append").start()
    try:
        states = _observe(spark, q, mc, drain_of=lambda s: max(s) // 2)
    finally:
        q.stop()
        mc.uninstall(spark)
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    assert len(states) >= 15, f"too few batches: {len(states)}"
    total_users = N_CHUNKS * USERS_PER_CHUNK + 1
    assert total_users > 2 * STATE_BOUND  # the bound is sublinear proof

    peak = max(states)
    assert 0 < peak <= STATE_BOUND, (peak, STATE_BOUND, states)

    third = len(states) // 3
    mid_peak = max(states[third : 2 * third])
    late_peak = max(states[2 * third :])
    # one cohort of slack separates batch raggedness from the failure
    # mode (state growing with total users)
    assert late_peak <= mid_peak + USERS_PER_CHUNK, states

    # flush chunk passed the watermark over every real session: most
    # of the peak must be evicted by the end
    assert states[-1] <= peak // 2, (states[-1], peak, states)

    # and sessions were actually emitted (probe isn't a no-op plan)
    assert spark.table("tws_state_probe").count() > 0
