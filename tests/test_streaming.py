"""Streaming-semantics tests, mirroring the reference's StreamTest
suites (LoghubMicroBatchSourceSuite.scala:128-498 — watermark windowed
agg :381-425, self-join :427-469; TableStoreSinkSuite.scala:80-295):
a replayed micro-batch stream must converge to the batch answer.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.streaming.joins import interval_join, stream_static_join
from aliyun_emapreduce_datasources_spark.streaming.sinks import IdempotentBatchSink, SQLiteExactlyOnceSink
from aliyun_emapreduce_datasources_spark.streaming.sources import StreamTable, replay_to_json_dir
from aliyun_emapreduce_datasources_spark.streaming.windows import windowed_agg

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


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="events-stream-")
    replay_to_json_dir(t(spark, sf_dir, "events"), d, n_chunks=4, order_col="ts")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_to_memory(df, mode: str):
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return name


def _stream_table(events_stream_dir, **options):
    return StreamTable("events", EVENTS_SCHEMA, events_stream_dir, options)


def test_tumbling_agg_stream_matches_batch(spark, sf_dir, events_stream_dir):
    """TUMBLING windowed agg in complete mode == batch answer."""
    st = _stream_table(events_stream_dir, maxFilesPerTrigger="1")
    stream = st.read_stream(spark)
    agg = windowed_agg(
        stream, "ts", "1 hour", "event_type", aggs=[F.count(F.lit(1)).alias("cnt")]
    )
    name = _run_to_memory(agg, "complete")
    got = {
        (r.window_start, r.event_type): r.cnt for r in spark.table(name).collect()
    }
    batch = windowed_agg(
        t(spark, sf_dir, "events"), "ts", "1 hour", "event_type", aggs=[F.count(F.lit(1)).alias("cnt")]
    )
    want = {(r.window_start, r.event_type): r.cnt for r in batch.collect()}
    assert got == want


def test_hopping_agg_with_watermark_append(spark, sf_dir, events_stream_dir):
    """HOPPING + delay() watermark in append mode: emitted windows are
    exactly the closed ones, and every emitted row matches batch."""
    st = _stream_table(events_stream_dir, maxFilesPerTrigger="1")
    stream = st.read_stream(spark)
    agg = windowed_agg(
        stream, "ts", "1 hour", aggs=[F.count(F.lit(1)).alias("cnt")], slide="30 minutes", watermark="10 minutes"
    )
    name = _run_to_memory(agg, "append")
    got = {(r.window_start, r.window_end): r.cnt for r in spark.table(name).collect()}
    batch = windowed_agg(
        t(spark, sf_dir, "events"), "ts", "1 hour", aggs=[F.count(F.lit(1)).alias("cnt")], slide="30 minutes"
    )
    want = {(r.window_start, r.window_end): r.cnt for r in batch.collect()}
    assert got, "append mode emitted nothing"
    for k, v in got.items():
        assert want[k] == v, f"window {k}: stream {v} != batch {want[k]}"


def test_stream_static_broadcast_join(spark, sf_dir, events_stream_dir):
    """Stream-static star join (30 corpus queries): counts per nation
    via events->customer dim must match batch."""
    st = _stream_table(events_stream_dir)
    stream = st.read_stream(spark)
    cust = t(spark, sf_dir, "customer")
    joined = stream_static_join(stream, cust, stream.user_id == cust.c_custkey)
    agg = joined.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("cnt"))
    name = _run_to_memory(agg, "complete")
    got = {(r.c_nationkey): r.cnt for r in spark.table(name).collect()}
    ev = t(spark, sf_dir, "events")
    want = {
        r.c_nationkey: r.cnt
        for r in ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


def test_stream_stream_interval_join(spark, sf_dir, events_stream_dir):
    """q40-shaped dual-watermark interval join (inner for exact
    convergence): stream result == batch result."""
    st = _stream_table(events_stream_dir, maxFilesPerTrigger="2")
    s1 = st.read_stream(spark)
    views = s1.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts")
    )
    s2 = st.read_stream(spark)
    buys = s2.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"), F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts")
    )
    j = interval_join(
        views, buys, "v_ts", "b_ts", [("v_user", "b_user")], "30 minutes", "60 seconds", "30 seconds", how="inner"
    ).select("view_id", "buy_id")
    name = _run_to_memory(j, "append")
    got = {(r.view_id, r.buy_id) for r in spark.table(name).collect()}

    ev = t(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").select(F.col("event_id").alias("view_id"), F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
    b = ev.where(F.col("event_type") == "purchase").select(F.col("event_id").alias("buy_id"), F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
    want = {
        (r.view_id, r.buy_id)
        for r in v.join(
            b,
            (v.v_user == b.b_user) & (b.b_ts >= v.v_ts) & (b.b_ts <= v.v_ts + F.expr("interval 30 minutes")),
        ).select("view_id", "buy_id").collect()
    }
    assert got == want
    assert len(got) > 0


def test_rate_limit_offset_progression(spark, sf_dir, events_stream_dir):
    """S9 rate-limit semantics (maxOffsetsPerTrigger → file-source
    maxFilesPerTrigger): one chunk per micro-batch, offsets advance
    monotonically, total rows conserved (LoghubMicroBatchSourceSuite's
    offset-progression/rate-limit tests)."""
    st = _stream_table(events_stream_dir, maxFilesPerTrigger="1")
    agg = st.read_stream(spark).groupBy().count()
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = agg.writeStream.format("memory").queryName(name).outputMode("complete").start()
    try:
        q.processAllAvailable()
        progress = [p for p in q.recentProgress if p["numInputRows"] > 0]
    finally:
        q.stop()
    total = t(spark, sf_dir, "events").count()
    assert len(progress) == 4, f"expected 4 rate-limited batches, got {len(progress)}"
    assert sum(p["numInputRows"] for p in progress) == total
    assert max(p["numInputRows"] for p in progress) < total, "rate limit not applied"
    assert spark.table(name).collect()[0]["count"] == total


def test_idempotent_sink_skips_replayed_batch(spark):
    writes = []
    sink = IdempotentBatchSink(lambda df, bid: writes.append((bid, df.count())))
    df = spark.range(5)
    sink(df, 0)
    sink(df, 0)  # replay
    sink(df, 1)
    assert [w[0] for w in writes] == [0, 1]


def test_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Stop/restart recovery (S5's checkpointed offsets + S23's sink
    protocol): a query killed and restarted from its checkpoint — with
    new data arriving in between — must deliver every row exactly
    once through the commit-log sink."""
    import json
    import os

    from aliyun_emapreduce_datasources_spark.operators.common import t as load

    ev = load(spark, sf_dir, "events").select("event_id").limit(200)
    rows = [r.event_id for r in ev.collect()]
    d = str(tmp_path / "stream")
    os.makedirs(d)

    def write_chunk(idx: int, ids: list[int]) -> None:
        p = os.path.join(d, f"c{idx:04d}.json")
        with open(p, "w") as fh:
            fh.write("\n".join(json.dumps({"event_id": i}) for i in ids))
        os.utime(p, (1_700_000_000 + idx, 1_700_000_000 + idx))

    write_chunk(0, rows[:50])
    write_chunk(1, rows[50:100])

    cp = str(tmp_path / "ckpt")
    db = str(tmp_path / "sink.db")
    sink = SQLiteExactlyOnceSink(db, "out", ["event_id"])
    schema = "event_id long"

    def start():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .json(d)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", cp)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    assert len(sink.read_all()) == 100

    # new data lands while the query is down; restart from checkpoint
    write_chunk(2, rows[100:150])
    write_chunk(3, rows[150:200])
    q = start()
    q.processAllAvailable()
    q.stop()
    got = [int(v[0]) for v in sink.read_all()]
    assert len(got) == 200, "restart must not duplicate or drop batches"
    assert sorted(got) == sorted(rows)

    # immediate restart with no new data: nothing re-delivered
    q = start()
    q.processAllAvailable()
    q.stop()
    assert len(sink.read_all()) == 200


def test_sqlite_exactly_once_sink_replay_and_partial(spark, tmp_path):
    db = str(tmp_path / "sink.db")
    sink = SQLiteExactlyOnceSink(db, "out", ["id"])
    df = spark.range(3).select(F.col("id"))
    sink(df, 0)
    sink(df, 0)  # exact replay → no duplicates
    assert len(sink.read_all()) == 3

    # simulate a crash mid-batch: UNCOMMITTED log entry + partial rows
    import sqlite3

    con = sqlite3.connect(db)
    con.execute("INSERT INTO out__stream_log VALUES (1, 'UNCOMMITTED')")
    con.execute("INSERT INTO out VALUES (1, '999')")
    con.commit()
    con.close()
    sink(df, 1)  # replay of batch 1 must purge the partial write
    rows = sink.read_all()
    assert len(rows) == 6
    assert ("999",) not in rows


def test_executor_exactly_once_sink_restart_and_partial(spark, sf_dir, tmp_path):
    """Crash-replay of the executor-side two-phase sink: the data path
    is foreachPartition (no driver collect); a kill-and-restart from
    checkpoint with new data in between delivers every row exactly
    once, and a simulated mid-batch crash (UNCOMMITTED log + partial
    rows) is purged on replay."""
    import functools
    import json
    import os
    import sqlite3

    from aliyun_emapreduce_datasources_spark.operators.common import t as load
    from aliyun_emapreduce_datasources_spark.streaming.sinks import (
        ExecutorExactlyOnceSink,
        sqlite_connection,
    )

    ev = load(spark, sf_dir, "events").select("event_id").limit(200)
    rows = [r.event_id for r in ev.collect()]
    d = str(tmp_path / "stream")
    os.makedirs(d)

    def write_chunk(idx: int, ids: list[int]) -> None:
        p = os.path.join(d, f"c{idx:04d}.json")
        with open(p, "w") as fh:
            fh.write("\n".join(json.dumps({"event_id": i}) for i in ids))
        os.utime(p, (1_700_000_000 + idx, 1_700_000_000 + idx))

    write_chunk(0, rows[:50])
    write_chunk(1, rows[50:100])

    cp = str(tmp_path / "ckpt")
    db = str(tmp_path / "sink.db")
    sink = ExecutorExactlyOnceSink(
        functools.partial(sqlite_connection, db), "out", ["event_id"]
    )

    def start():
        return (
            spark.readStream.schema("event_id long")
            .option("maxFilesPerTrigger", "1")
            .json(d)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", cp)
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()
    assert len(sink.read_all()) == 100

    # new data lands while the query is down; restart from checkpoint
    write_chunk(2, rows[100:150])
    write_chunk(3, rows[150:200])
    q = start()
    q.processAllAvailable()
    q.stop()
    got = [int(v[0]) for v in sink.read_all()]
    assert len(got) == 200, "restart must not duplicate or drop batches"
    assert sorted(got) == sorted(rows)

    # simulated mid-batch crash: UNCOMMITTED log entry + partial rows
    con = sqlite3.connect(db)
    con.execute("INSERT INTO out__stream_log VALUES (99, 'UNCOMMITTED')")
    con.execute("INSERT INTO out VALUES (99, 0, '999999')")
    con.commit()
    con.close()
    sink(spark.range(3).select(F.col("id").alias("event_id")), 99)
    all_rows = sink.read_all()
    assert len(all_rows) == 203
    assert ("999999",) not in all_rows


def test_streaming_dedup_within_watermark(spark, sf_dir, events_stream_dir):
    """Streaming twin of exact dedup: duplicate events arriving within
    the watermark horizon are dropped by key (state expires past the
    horizon, so memory is bounded — the scale-path of dedup-on-ingest).
    The replayed stream re-appends chunk files, so we synthesize dups
    by unioning the stream with itself key-wise via a second read."""
    st = _stream_table(events_stream_dir, maxFilesPerTrigger="2")
    stream = st.read_stream(spark)
    deduped = (
        stream.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id")
    )
    name = _run_to_memory(deduped, "append")
    got = spark.table(name)
    n_events = t(spark, sf_dir, "events").count()
    # every key exactly once, none lost
    assert got.count() == n_events
    assert got.distinct().count() == n_events


def test_streaming_metrics_collector(spark, sf_dir, tmp_path):
    """Per-batch progress (rows, rates, durations) lands in the
    metrics DataFrame — the queryable-monitoring surface standing in
    for the reference's client metrics reporter (S29)."""
    import json as _json

    from aliyun_emapreduce_datasources_spark.streaming.metrics import (
        StreamingMetricsCollector,
    )

    src = tmp_path / "mstream"
    src.mkdir()
    for chunk in range(3):
        with open(src / f"c{chunk}.jsonl", "w") as fh:
            for i in range(20):
                fh.write(_json.dumps({"k": chunk * 100 + i}) + "\n")

    mc = StreamingMetricsCollector.install(spark)
    try:
        df = (
            spark.readStream.schema("k bigint")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = (
            df.groupBy((F.col("k") % 10).alias("b"))
            .count()
            .writeStream.format("memory")
            .queryName("metrics_probe")
            .outputMode("complete")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
        # listener delivery is async; wait for the rows to arrive
        import time as _time

        deadline = _time.time() + 30
        while _time.time() < deadline:
            rows = [r for r in mc.snapshot() if r[1] == "metrics_probe" and r[4] > 0]
            if len(rows) >= 3:
                break
            _time.sleep(0.25)
        mdf = mc.to_df(spark).where("query_name = 'metrics_probe' AND num_input_rows > 0")
        got = mdf.collect()
        assert len(got) >= 3  # one progress event per file-trigger batch
        assert sum(r.num_input_rows for r in got) == 60
        assert all(r.trigger_execution_ms is not None for r in got)
        assert all(r.num_state_rows >= 0 for r in got)
    finally:
        mc.uninstall(spark)


def test_watermark_late_window_semantics_with_metrics(spark, tmp_path):
    """Pin the public-Spark late-data contract the `delay()` rewrite
    inherits (reference simulator: 5% of rows up to 5 min late).
    Append-mode windowed agg in this Spark build: a row arriving
    *after* the watermark passed its window still creates that window
    and is finalized at the end of its own batch — but it can NEVER
    retract or amend an already-emitted window, and open-window state
    never grows from late data. The metrics collector exposes the
    per-batch accounting (inputs vs state rows) used to monitor the
    late fraction."""
    import json as _json
    import os as _os
    import time as _time

    from aliyun_emapreduce_datasources_spark.streaming.metrics import (
        StreamingMetricsCollector,
    )

    src = tmp_path / "latestream"
    src.mkdir()
    # batch 0: fresh rows advance the watermark far past the late rows
    with open(src / "a_fresh.jsonl", "w") as fh:
        for i in range(10):
            fh.write(_json.dumps({"ts": f"2024-01-01 12:00:{i:02d}", "k": i}) + "\n")
    # batch 1: hours-late rows — beyond the 10s horizon, must be dropped
    with open(src / "b_late.jsonl", "w") as fh:
        for i in range(5):
            fh.write(_json.dumps({"ts": f"2024-01-01 01:00:{i:02d}", "k": i}) + "\n")
    # batch 2: later fresh row closes the 12:00 window so append emits it
    with open(src / "c_close.jsonl", "w") as fh:
        fh.write(_json.dumps({"ts": "2024-01-01 12:05:00", "k": 99}) + "\n")
    _os.utime(src / "a_fresh.jsonl", (1, 1))
    _os.utime(src / "b_late.jsonl", (2_000_000_000, 2_000_000_000))
    _os.utime(src / "c_close.jsonl", (2_000_000_100, 2_000_000_100))

    mc = StreamingMetricsCollector.install(spark)
    try:
        df = (
            spark.readStream.schema("ts timestamp, k bigint")
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
            .withWatermark("ts", "10 seconds")
        )
        q = (
            df.groupBy(F.window("ts", "1 minute"))
            .count()
            .writeStream.format("memory")
            .queryName("late_probe")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        emitted = {
            (r.window.start.strftime("%H:%M"), r["count"])
            for r in spark.table("late_probe").collect()
        }
        # the on-time window holds exactly the 10 on-time rows — the 5
        # late rows were finalized separately (their own window) and
        # could not amend it; nothing was double-counted
        assert emitted == {("12:00", 10), ("01:00", 5)}, emitted

        deadline = _time.time() + 30
        rows = []
        while _time.time() < deadline:
            rows = sorted(
                (r for r in mc.snapshot() if r[1] == "late_probe" and r[4] > 0),
                key=lambda r: r[2],
            )
            if len(rows) >= 3:
                break
            _time.sleep(0.25)
        assert len(rows) >= 3
        fresh, late = rows[0], rows[1]
        assert fresh[4] == 10 and fresh[9] == 1  # 10 inputs -> one open window
        # late batch: 5 inputs, instant finalize => no lingering state
        assert late[4] == 5 and late[9] == 1
    finally:
        mc.uninstall(spark)


def test_late_data_replay_profile_converges(spark, sf_dir):
    """Reference-simulator late-data profile (Utils.toRdd: ≤5% rows
    late, bounded delay): the replay harness delivers a deterministic
    ~5% of rows behind their event-time position; row totals are
    conserved, stragglers form trailing chunks, and a complete-mode
    windowed agg over the disordered stream still converges to the
    batch answer."""
    ev = t(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix="late-replay-")
    try:
        paths = replay_to_json_dir(
            ev, d, n_chunks=4, order_col="ts", late_fraction=0.05, late_chunk_shift=2
        )
        n_rows = sum(1 for p in paths for line in open(p) if line.strip())
        assert n_rows == ev.count()
        # stragglers shifted past the last on-time chunk
        assert any(int(p.split("chunk-")[1][:4]) >= 4 for p in paths)

        st = StreamTable("events", EVENTS_SCHEMA, d, {"maxFilesPerTrigger": "1"})
        agg = windowed_agg(
            st.read_stream(spark), "ts", "1 hour", "event_type",
            aggs=[F.count(F.lit(1)).alias("cnt")],
        )
        name = _run_to_memory(agg, "complete")
        got = {(r.window_start, r.event_type): r.cnt for r in spark.table(name).collect()}
        batch = windowed_agg(
            ev, "ts", "1 hour", "event_type", aggs=[F.count(F.lit(1)).alias("cnt")]
        )
        want = {(r.window_start, r.event_type): r.cnt for r in batch.collect()}
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_throttled_replay_bounds_per_trigger_intake(spark, sf_dir):
    """Reference-simulator ThroughputThrottler parity (Utils.scala
    replicateToKafka: producer capped at `throughput` rec/s): the
    replay harness's max_rows_per_chunk splits oversize chunks into
    consecutive same-order files, so maxFilesPerTrigger=1 bounds every
    micro-batch's intake; totals and delivery order are conserved."""
    ev = t(spark, sf_dir, "events").limit(500)
    d = tempfile.mkdtemp(prefix="throttle-replay-")
    try:
        paths = replay_to_json_dir(
            ev, d, n_chunks=2, order_col="ts", max_rows_per_chunk=100
        )
        sizes = [sum(1 for line in open(p) if line.strip()) for p in paths]
        assert sum(sizes) == 500
        assert max(sizes) <= 100
        assert len(paths) >= 5  # 2 chunks of 250 -> >= 3 files each... >= 5 total
        # mtimes strictly increasing => replay order == write order
        mts = [os.path.getmtime(p) for p in paths]
        assert mts == sorted(mts) and len(set(mts)) == len(mts)
        # delivered rows in order-col order within the throttled stream
        import json as _json

        ts_seq = [
            _json.loads(line)["ts"]
            for p in paths
            for line in open(p)
            if line.strip()
        ]
        assert ts_seq == sorted(ts_seq)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_continuous_trigger_rate_source_map_only(spark, tmp_path):
    """S10 conformance: the continuous trigger executes a map-only plan
    (rate source -> filter/projection -> sink) with epoch-based
    checkpointing; rows flow with no micro-batch boundary."""
    import time
    import uuid

    from aliyun_emapreduce_datasources_spark.streaming.continuous import start_continuous

    # continuous mode pins one LONG-RUNNING task per source partition;
    # keep numPartitions small so the validation job still gets cores
    # (at 32 partitions on local[32] the count() below would starve)
    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "50")
        .option("numPartitions", "2")
        .load()
        .where(F.col("value") % 2 == 0)
        .select((F.col("value") * 2).alias("doubled"))
    )
    name = f"cont_{uuid.uuid4().hex[:8]}"
    q = start_continuous(
        src,
        queryName=name,
        checkpointLocation=str(tmp_path / "cont-ckpt"),
        interval="1 second",
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and spark.table(name).count() == 0:
            time.sleep(0.5)
        rows = spark.table(name).collect()
        assert rows, "continuous query produced no rows in 30 s"
        assert all(r.doubled % 4 == 0 for r in rows)
    finally:
        q.stop()


def test_async_buffered_producer_delivers_all_rows(spark, sf_dir, tmp_path):
    """S20 async-writer shape: bounded-buffer async flushes must
    deliver every row exactly once across partitions, and a failing
    flush must fail the task (at-least-once, never silent loss)."""
    import glob
    import json

    import pytest as _pytest

    from aliyun_emapreduce_datasources_spark.streaming.sinks import AsyncBufferedProducer

    out_dir = str(tmp_path)

    def send_chunk(chunk, ctx):
        # closure: cloudpickle ships it by value to the workers
        path = f"{out_dir}/p{ctx['partition']:03d}_f{ctx['flush']:04d}.json"
        with open(path, "w") as f:
            json.dump([list(r) for r in chunk], f)

    df = spark.range(0, 5000).selectExpr("id", "id * 2 AS v").repartition(4)
    df.foreachPartition(AsyncBufferedProducer(send_chunk, buffer_rows=256, max_inflight=2))

    rows = []
    for f in glob.glob(f"{out_dir}/p*_f*.json"):
        rows.extend(tuple(r) for r in json.load(open(f)))
    assert sorted(rows) == [(i, 2 * i) for i in range(5000)]
    # chunking actually happened (not one monolithic flush)
    assert len(glob.glob(f"{out_dir}/p*_f*.json")) >= 5000 // 256

    def send_fail(chunk, ctx):
        raise RuntimeError("service down")

    with _pytest.raises(Exception, match="service down"):
        spark.range(0, 10).foreachPartition(
            AsyncBufferedProducer(send_fail, buffer_rows=4)
        )


def test_executor_sink_partition_task_retry_is_idempotent(spark, tmp_path):
    """A retried / speculative partition task must not duplicate rows:
    the partition writer purges its own (batch, partition) slice in
    the same transaction as its insert, so running it twice (what
    Spark does on task rerun after an executor loss) leaves exactly
    one copy."""
    import functools

    from aliyun_emapreduce_datasources_spark.streaming.sinks import (
        ExecutorExactlyOnceSink,
        _write_sink_partition,
        sqlite_connection,
    )

    db = str(tmp_path / "retry.db")
    factory = functools.partial(sqlite_connection, db)
    sink = ExecutorExactlyOnceSink(factory, "out_retry", ["event_id"])
    rows = [(i,) for i in range(20)]

    def run_twice(_):
        # simulate the task rerun: same rows, same TaskContext partition
        _write_sink_partition(list(rows), factory, "out_retry", ["event_id"], 1)
        _write_sink_partition(list(rows), factory, "out_retry", ["event_id"], 1)

    spark.sparkContext.parallelize([0], 1).foreachPartition(run_twice)
    got = sorted(int(v[0]) for v in sink.read_all())
    assert got == list(range(20)), got


def test_streaming_gopher_rules_matches_batch(spark, sf_dir, tmp_path):
    """Streaming twin of the Gopher quality pre-filter: the SAME
    gopher_signals expression tree (stateless scan→project, no sort,
    no state) applied to a chunked document stream in append mode
    yields row-for-row the batch answer — the shape of rule-filtering
    ON INGEST, where quality verdicts attach before a doc ever lands
    in the lake."""
    import json as _json

    from aliyun_emapreduce_datasources_spark.functions.text import gopher_signals

    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    src = tmp_path / "docstream"
    src.mkdir()
    import os as _os
    import time as _time

    chunk_size = (len(docs) + 3) // 4
    base_mt = int(_time.time()) - 100
    for chunk in range(4):
        p = src / f"c{chunk}.jsonl"
        with open(p, "w") as fh:
            for r in docs[chunk * chunk_size : (chunk + 1) * chunk_size]:
                fh.write(_json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        _os.utime(p, (base_mt + chunk, base_mt + chunk))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    name = _run_to_memory(gopher_signals(stream), "append")
    got = spark.table(name).orderBy("doc_id").collect()
    want = gopher_signals(
        t(spark, sf_dir, "documents").select("doc_id", "text")
    ).orderBy("doc_id").collect()
    assert len(got) == len(want) == len(docs)
    assert got == want


def test_streaming_dau_matches_batch(spark, sf_dir, events_stream_dir):
    """Streaming twin of events_rolling_wau's DAU leg: the scale path
    for distinct-actives on ingest is dedupe-to-(user, day) within the
    watermark horizon (bounded state), then a plain per-day count —
    complete mode must equal the batch distinct count per day."""
    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES

    st = _stream_table(events_stream_dir, maxFilesPerTrigger="2")
    stream = st.read_stream(spark).withColumn("day", F.to_date("ts"))
    daily = (
        stream.withWatermark("ts", "48 hours")
        .dropDuplicatesWithinWatermark(["user_id", "day"])
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("dau"))
    )
    name = _run_to_memory(daily, "complete")
    got = {str(r["day"]): r["dau"] for r in spark.table(name).collect()}
    want = {
        r["day"]: r["dau"]
        for r in QUERIES["events_rolling_wau"](spark, sf_dir)
        .select("day", "dau")
        .collect()
    }
    assert got == want


def test_streaming_growth_accounting_matches_batch(spark, sf_dir, events_stream_dir):
    """Streaming twin of events_growth_accounting: the per-user
    classifier (ONE int64 of state per user) replayed over ts-ordered
    chunks emits each (user, week) flow exactly once; counting the
    emitted records by (week, cls) must reproduce the batch entry's
    weekly new/retained/resurrected/active columns exactly."""
    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES
    from aliyun_emapreduce_datasources_spark.streaming.stateful import (
        growth_classify_stream,
    )

    st = _stream_table(events_stream_dir, maxFilesPerTrigger="1")
    classified = growth_classify_stream(st.read_stream(spark))
    name = _run_to_memory(classified, "append")
    got = {
        int(r["week"]): (
            int(r["n_new"]),
            int(r["n_retained"]),
            int(r["n_resurrected"]),
            int(r["n_active"]),
        )
        for r in spark.table(name)
        .groupBy("week")
        .agg(
            F.sum(F.when(F.col("cls") == "new", 1).otherwise(0)).alias("n_new"),
            F.sum(F.when(F.col("cls") == "retained", 1).otherwise(0)).alias(
                "n_retained"
            ),
            F.sum(F.when(F.col("cls") == "resurrected", 1).otherwise(0)).alias(
                "n_resurrected"
            ),
            F.count(F.lit(1)).alias("n_active"),
        )
        .collect()
    }
    want = {
        int(r["m"]): (
            int(r["n_new"]),
            int(r["n_retained"]),
            int(r["n_resurrected"]),
            int(r["n_active"]),
        )
        for r in QUERIES["events_growth_accounting"](spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_scd2_matches_batch(spark, sf_dir, events_stream_dir):
    """Streaming twin of cdc_scd2_history: the change log replayed in
    event-time order is maintained INCREMENTALLY via foreachBatch —
    close the open version of every key touched, insert non-DELETE
    rows as new open versions (the MERGE INTO a warehouse dimension
    runs per micro-batch) — and the maintained table must equal the
    one-shot batch lead() window over the full log."""
    import pandas as pd

    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES

    st = _stream_table(events_stream_dir, maxFilesPerTrigger="1")
    stream = (
        st.read_stream(spark)
        .where(F.col("user_id") < 200)
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.when(F.col("event_type") == "error", F.lit("DELETE"))
            .otherwise(F.lit("UPSERT"))
            .alias("op"),
        )
    )

    versions = []   # the maintained dimension (driver-side test store)
    open_idx = {}   # user_id -> index of the open version

    def merge_batch(df, batch_id):
        pdf = df.toPandas().sort_values(["ts", "event_id"])
        for r in pdf.itertuples():
            prev = open_idx.pop(r.user_id, None)
            if prev is not None:
                versions[prev]["valid_to"] = pd.Timestamp(r.ts)
            if r.op != "DELETE":
                versions.append(
                    {
                        "user_id": r.user_id,
                        "event_id": r.event_id,
                        "valid_from": pd.Timestamp(r.ts),
                        "valid_to": None,
                        "value": r.value,
                    }
                )
                open_idx[r.user_id] = len(versions) - 1

    q = stream.writeStream.foreachBatch(merge_batch).start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    got = sorted(
        (
            v["user_id"],
            v["event_id"],
            v["valid_from"],
            v["valid_to"] if v["valid_to"] is not None else pd.Timestamp.max,
            v["valid_to"] is None,
            v["value"],
        )
        for v in versions
    )
    want = sorted(
        (
            r["user_id"],
            r["event_id"],
            # the JSON replay carries millisecond timestamps; floor the
            # batch side's micros to compare like with like (no per-user
            # same-millisecond collisions exist in the corpus)
            pd.Timestamp(r["valid_from"]).floor("ms"),
            pd.Timestamp(r["valid_to"]).floor("ms") if r["valid_to"] is not None else pd.Timestamp.max,
            bool(r["is_current"]),
            r["value"],
        )
        for r in QUERIES["cdc_scd2_history"](spark, sf_dir).collect()
    )
    assert len(got) == len(want) > 0
    assert got == want


def test_streaming_dedup_on_ingest_matches_batch_prefix(spark, sf_dir, tmp_path):
    """Streaming twin of near-dup dedup-on-ingest: documents replayed
    in doc_id order; each micro-batch's docs are matched against a
    maintained shingle store (every PREVIOUSLY ingested doc) by exact
    integer-micro Jaccard, best match kept. Must equal the batch
    retrospective pass — the prefix-pair self-join where every doc
    matches only strictly-earlier doc_ids. Pins that ingest-order
    incremental dedup and the one-shot batch job agree decision for
    decision (the store is driver-side here; in production it's the
    standing-corpus postings table of dedup_incremental)."""
    import json as _json

    from pyspark.sql import Window

    from aliyun_emapreduce_datasources_spark.dedup.incremental import (
        MIN_JACC_MICRO,
        _postings,
    )

    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())

    # --- batch reference: best strictly-earlier match per doc (Spark)
    a = _postings(docs, "earlier_id", "n_earlier")
    b = _postings(docs, "doc_id", "n_doc")
    shared = (
        a.join(b, "s")
        .where(F.col("earlier_id") < F.col("doc_id"))
        .groupBy("doc_id", "earlier_id", "n_doc", "n_earlier")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ranked = shared.select(
        "doc_id",
        "earlier_id",
        F.expr("(1000000 * shared) div (n_doc + n_earlier - shared)").alias(
            "jacc_micro"
        ),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.col("jacc_micro").desc(), "earlier_id"
            )
        ),
    )
    want = {
        r["doc_id"]: (r["earlier_id"], r["jacc_micro"])
        for r in ranked.where(
            (F.col("rn") == 1) & (F.col("jacc_micro") >= MIN_JACC_MICRO)
        ).collect()
    }

    # --- streaming ingest: doc_id-ordered chunks, driver-side store
    rows = docs.select("doc_id", "text").orderBy("doc_id").collect()
    src = tmp_path / "ingest"
    src.mkdir()
    import os as _os
    import time as _time

    chunk = (len(rows) + 3) // 4
    base_mt = int(_time.time()) - 100
    for c in range(4):
        p = src / f"c{c}.jsonl"
        with open(p, "w") as fh:
            for r in rows[c * chunk : (c + 1) * chunk]:
                fh.write(_json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")
        # FileStreamSource orders by mtime: strictly increasing stamps
        # pin delivery order = chunk order (same-millisecond writes
        # otherwise replay in arbitrary order — observed flake)
        _os.utime(p, (base_mt + c, base_mt + c))

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    store = {}   # doc_id -> frozenset of shingle hashes
    got = {}     # doc_id -> (match_id, jacc_micro)

    def ingest(df, batch_id):
        sh = _postings(df, "doc_id", "n").collect()
        by_doc = {}
        for r in sh:
            by_doc.setdefault(r["doc_id"], set()).add(r["s"])
        for did in sorted(by_doc):
            s = by_doc[did]
            best = None
            for prev_id, prev_s in store.items():
                inter = len(s & prev_s)
                if inter == 0:
                    continue
                jacc = (1_000_000 * inter) // (len(s) + len(prev_s) - inter)
                cand = (-jacc, prev_id)
                if best is None or cand < best:
                    best = cand
            if best is not None and -best[0] >= MIN_JACC_MICRO:
                got[did] = (best[1], -best[0])
            store[did] = frozenset(s)

    q = stream.writeStream.foreachBatch(ingest).start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)

    assert len(want) > 0, "corpus should contain near-dup prefix pairs"
    assert got == want


def test_streaming_dau_late_replay_matches_batch(spark, sf_dir, tmp_path):
    """DAU twin under the simulator's late profile (≤5% of rows
    delivered a micro-batch late): with a watermark horizon far wider
    than the delivery delay, dropDuplicatesWithinWatermark keeps every
    late row, so the per-day distinct counts still equal the batch
    answer exactly — the contract that makes dedupe-on-ingest safe
    under real delivery jitter."""
    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES
    from aliyun_emapreduce_datasources_spark.streaming.sources import (
        replay_to_json_dir,
    )

    d = tmp_path / "late-events"
    d.mkdir()
    replay_to_json_dir(
        t(spark, sf_dir, "events"),
        str(d),
        n_chunks=4,
        order_col="ts",
        late_fraction=0.05,
    )
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(str(d))
        .withColumn("day", F.to_date("ts"))
    )
    daily = (
        stream.withWatermark("ts", "72 hours")
        .dropDuplicatesWithinWatermark(["user_id", "day"])
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("dau"))
    )
    name = _run_to_memory(daily, "complete")
    got = {str(r["day"]): r["dau"] for r in spark.table(name).collect()}
    want = {
        r["day"]: r["dau"]
        for r in QUERIES["events_rolling_wau"](spark, sf_dir)
        .select("day", "dau")
        .collect()
    }
    assert got == want


def test_streaming_seasonality_matches_batch(spark, sf_dir, events_stream_dir):
    """Streaming twin of events_hourly_seasonality (round-7 verdict ask
    #7): the ≤ 7×24-cell seasonality matrix maintained on ingest —
    per-cell event counts as a plain complete-mode agg, per-cell
    distinct users as dedupe-to-(user, dow, hod) within the watermark
    then count (the bounded-state distinct pattern of the DAU twin).
    The horizon here spans the whole replay so the comparison is
    exact; production picks the horizon it is willing to re-count a
    returning (user, cell) after — that is the state-size knob. The
    share column is the cell count over the matrix total, a 168-row
    post-processing divide, recomputed on the collected cells with the
    same IEEE division the batch plan uses."""
    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES

    st = _stream_table(events_stream_dir, maxFilesPerTrigger="1")

    def cells(stream):
        return stream.select(
            (F.dayofweek("ts") - 1).cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hod"),
            "user_id",
            "ts",
        )

    counts = (
        cells(st.read_stream(spark))
        .groupBy("dow", "hod")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    users = (
        cells(st.read_stream(spark))
        .withWatermark("ts", "800 hours")
        .dropDuplicatesWithinWatermark(["user_id", "dow", "hod"])
        .groupBy("dow", "hod")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    n_ev = {
        (r.dow, r.hod): r.n_events
        for r in spark.table(_run_to_memory(counts, "complete")).collect()
    }
    n_us = {
        (r.dow, r.hod): r.n_users
        for r in spark.table(_run_to_memory(users, "complete")).collect()
    }
    total = sum(n_ev.values())
    got = {
        c: (n_ev[c], n_us[c], float(n_ev[c]) / float(total)) for c in n_ev
    }
    want = {
        (r.dow, r.hod): (r.n_events, r.n_users, r.share)
        for r in QUERIES["events_hourly_seasonality"](spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_ab_lift_matches_batch(spark, sf_dir, events_stream_dir):
    """Streaming twin of events_ab_lift (round-7 verdict ask #7): the
    experiment readout maintained on ingest under the SAME md5 coin —
    event/purchase tallies as one stateless complete-mode agg per
    variant; the two distinct-user terms (population, converters) as
    dedupe-within-watermark then count. The derived rates are single
    IEEE divisions of exact streamed integers/decimals, so the batch
    doubles must be reproduced BIT-exactly, not approximately."""
    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES
    from aliyun_emapreduce_datasources_spark.operators.common import m, md5_bucket

    st = _stream_table(events_stream_dir, maxFilesPerTrigger="1")

    def assigned(stream):
        return stream.withColumn(
            "variant", md5_bucket(F.col("user_id").cast("string"), 2)
        )

    is_purchase = F.col("event_type") == "purchase"
    tallies = (
        assigned(st.read_stream(spark))
        .groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(is_purchase, 1).otherwise(0))
            .cast("long")
            .alias("n_purchases"),
            F.count(F.when(is_purchase, F.col("value")))
            .cast("long")
            .alias("n_valued"),
            F.sum(F.when(is_purchase, m("value"))).alias("vsum"),
        )
    )
    population = (
        assigned(st.read_stream(spark))
        .withWatermark("ts", "800 hours")
        .dropDuplicatesWithinWatermark(["user_id", "variant"])
        .groupBy("variant")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    converters = (
        assigned(st.read_stream(spark))
        .where(is_purchase)
        .withWatermark("ts", "800 hours")
        .dropDuplicatesWithinWatermark(["user_id", "variant"])
        .groupBy("variant")
        .agg(F.count(F.lit(1)).cast("long").alias("n_converted"))
    )
    tal = {
        r.variant: r
        for r in spark.table(_run_to_memory(tallies, "complete")).collect()
    }
    pop = {
        r.variant: r.n_users
        for r in spark.table(_run_to_memory(population, "complete")).collect()
    }
    conv = {
        r.variant: r.n_converted
        for r in spark.table(_run_to_memory(converters, "complete")).collect()
    }
    got = {}
    for v, r in tal.items():
        n_users = pop.get(v, 0)
        n_conv = conv.get(v, 0)
        conv_rate = float(n_conv) / float(n_users) if n_users > 0 else 0.0
        avg_val = (
            float(r.vsum) / float(r.n_valued) if r.n_valued > 0 else 0.0
        )
        got[v] = (n_users, r.n_events, n_conv, conv_rate, r.n_purchases, avg_val)
    want = {
        r.variant: (
            r.n_users,
            r.n_events,
            r.n_converted,
            r.conv_rate,
            r.n_purchases,
            r.avg_purchase_value,
        )
        for r in QUERIES["events_ab_lift"](spark, sf_dir).collect()
    }
    assert got == want
