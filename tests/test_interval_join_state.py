"""Bounded-state evidence for the q40-class stream-stream interval
join (r09 verdict ask #5).

Correctness of the dual-watermark interval LEFT OUTER join is pinned
by the verbatim q40 suite; the 100 TB RISK is different — UNBOUNDED
STATE. If the watermarks or the interval condition stopped informing
state eviction (a condition rewrite, a watermark dropped by a
refactor), results could stay right for a while as state grew with
total input until executors died. This suite replays a LONG two-sided
stream (30 event-time chunks per side, 5% deterministic late tail)
one file per trigger and asserts, from the engine's own
stateOperators metrics (streaming/metrics.py):

1. peak state stays under a WATERMARK-DERIVED bound — rows inside the
   eviction horizon times a slack factor, NOT a function of total
   input (total input is > 2x the bound, so linear growth fails
   loudly);
2. state PLATEAUS: the maximum over the last third of batches does
   not exceed the mid-stream maximum (still-growing state fails);
3. state DRAINS once a far-future flush chunk advances the watermark
   past everything.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.streaming.joins import interval_join
from aliyun_emapreduce_datasources_spark.streaming.metrics import (
    StreamingMetricsCollector,
)
from aliyun_emapreduce_datasources_spark.streaming.sources import (
    replay_to_json_dir,
)

N_CHUNKS = 30
ROWS_PER_CHUNK = 20
CHUNK_SPACING_S = 20  # event-time distance between consecutive chunks
LEFT_DELAY = "30 seconds"
RIGHT_DELAY = "60 seconds"
INTERVAL = "30 seconds"
# eviction horizon: a row is evictable once the watermark passes its
# event time + the join's temporal reach. Condition right in
# [left, left+30s] + delays 30s/60s -> reach <= 30+60+30 = 120 s of
# event time = 6 chunks either side; x2 slack for batch-boundary
# raggedness (watermark advances one batch behind the data).
HORIZON_CHUNKS = 120 // CHUNK_SPACING_S
STATE_BOUND = 2 * 2 * HORIZON_CHUNKS * ROWS_PER_CHUNK  # = 480


def _side(spark, offset_s: float):
    rows = []
    for c in range(N_CHUNKS):
        for j in range(ROWS_PER_CHUNK):
            ts = c * CHUNK_SPACING_S + j * 0.5 + offset_s
            rows.append((c * ROWS_PER_CHUNK + j, j % 10, float(ts)))
    # far-future flush: advances the watermark past every real row so
    # end-of-replay state must drain
    rows.append((10**6, 99, float(N_CHUNKS * CHUNK_SPACING_S + 3600)))
    return spark.createDataFrame(rows, "row_id long, k int, off double").select(
        "row_id",
        "k",
        (F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(
            secs=F.col("off")
        )).alias("ts"),
    )


def test_interval_join_state_plateaus_and_drains(spark, tmp_path):
    ldir, rdir = str(tmp_path / "left"), str(tmp_path / "right")
    for df, d in ((_side(spark, 0.0), ldir), (_side(spark, 5.0), rdir)):
        replay_to_json_dir(
            df, d, n_chunks=N_CHUNKS + 1, order_col="ts", late_fraction=0.05
        )
    schema = "row_id long, k int, ts timestamp"
    left = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(ldir)
        .withColumnRenamed("row_id", "l_id")
        .withColumnRenamed("k", "l_k")
        .withColumnRenamed("ts", "l_ts")
    )
    right = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(rdir)
        .withColumnRenamed("row_id", "r_id")
        .withColumnRenamed("k", "r_k")
        .withColumnRenamed("ts", "r_ts")
    )
    joined = interval_join(
        left,
        right,
        "l_ts",
        "r_ts",
        [("l_k", "r_k")],
        INTERVAL,
        LEFT_DELAY,
        RIGHT_DELAY,
    )
    mc = StreamingMetricsCollector.install(spark)
    q = (
        joined.writeStream.format("memory")
        .queryName("ivj_state_probe")
        .outputMode("append")
        .start()
    )

    def _states() -> list[int]:
        return [
            r[9]
            for r in mc.snapshot()
            if r[0] == str(q.id) and r[9] is not None
        ]

    try:
        q.processAllAvailable()
        # The drain is asynchronous twice over (r10 verdict, in-suite
        # flake): (a) the post-watermark eviction happens in NO-DATA
        # micro-batches that Spark schedules AFTER processAllAvailable
        # returns — under suite load they may not have fired yet; and
        # (b) the StreamingQueryListener bus is async, so even a fired
        # batch's progress event can land after this thread looks.
        # Poll the collector's snapshot for the drain condition with a
        # bounded deadline, re-nudging the engine each lap, instead of
        # asserting on the instantaneous final event.
        deadline = time.monotonic() + 120.0
        while time.monotonic() < deadline:
            states = _states()
            if states and states[-1] <= max(states) // 2:
                break
            q.processAllAvailable()
            time.sleep(0.5)
    finally:
        q.stop()
        mc.uninstall(spark)

    states = _states()
    assert len(states) >= 20, f"too few batches to judge: {len(states)}"
    total_input = 2 * (N_CHUNKS * ROWS_PER_CHUNK + 1)
    assert total_input > 2 * STATE_BOUND  # the bound is sublinear proof

    peak = max(states)
    assert peak <= STATE_BOUND, (peak, STATE_BOUND, states)
    assert peak > 0, "state never materialized — probe is vacuous"

    third = len(states) // 3
    mid_peak = max(states[third : 2 * third])
    late_peak = max(states[2 * third :])
    # the 5% late tail legitimately re-buffers a few rows behind the
    # watermark late in the replay (observed wobble: ±1-2 rows on a
    # ~190-row plateau); one chunk of slack separates that from the
    # failure mode this guards — state GROWING with total input, which
    # would put late_peak a multiple of mid_peak, not rows above it
    assert late_peak <= mid_peak + ROWS_PER_CHUNK, (
        "state still growing late in the replay",
        states,
    )

    # the flush chunk advanced the watermark past every real row —
    # the tail of the replay must evict most of the peak
    assert states[-1] <= peak // 2, (states[-1], peak, states)

    # and the join actually joined (the probe isn't a no-op plan)
    assert spark.table("ivj_state_probe").count() > 0
