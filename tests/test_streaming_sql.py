"""End-to-end test of the streaming-SQL dialect front-end: a
corpus-shaped script (SET / CREATE TABLE USING / INSERT INTO SELECT
with TUMBLING + delay()) runs on public Spark and converges to the
batch answer — the public-engine replacement for the closed-source
EMR streaming SQL parser (emr-baseline-testing/queries/q101.sql)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.plans.streaming_sql import (
    StreamingSqlSession,
    rewrite_streaming_sql,
    split_statements,
)
from aliyun_emapreduce_datasources_spark.streaming.sources import replay_to_json_dir


def test_rewrite_tumbling_hopping_delay():
    sql = (
        "SELECT window.start, count(*) FROM s "
        "WHERE delay(ts) < '1 minute' AND x > 0 "
        "GROUP BY TUMBLING(ts, interval 1 hour)"
    )
    out, wm = rewrite_streaming_sql(sql)
    assert "window(ts, '1 hour')" in out
    assert "TRUE AND x > 0" in out
    assert wm == [("ts", "1 minute")]

    out2, _ = rewrite_streaming_sql("GROUP BY HOPPING(ts, interval 1 minute, interval 30 seconds)")
    assert "window(ts, '1 minute', '30 seconds')" in out2


def test_split_statements_skips_comments():
    script = "-- header\nSET a=1;\nSELECT 1;\n"
    assert split_statements(script) == ["SET a=1", "SELECT 1"]


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="sqlstream-")
    replay_to_json_dir(t(spark, sf_dir, "events"), d, n_chunks=3, order_col="ts")
    yield d
    shutil.rmtree(d, ignore_errors=True)


CORPUS_SCRIPT = """
-- q101-shaped: tumbling window agg over a registered stream table
SET spark.sql.shuffle.partitions=8;
CREATE TABLE ev_stream (event_id bigint, ts timestamp, user_id bigint,
                        event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '1');
CREATE TABLE result_q101 USING kafka OPTIONS (output.mode 'complete');
INSERT INTO result_q101
SELECT window.start AS window_start, event_type, count(*) AS cnt
FROM ev_stream
WHERE delay(ts) < '5 minutes'
GROUP BY TUMBLING(ts, interval 1 hour), event_type
"""


def test_corpus_dialect_script_end_to_end(spark, sf_dir, stream_dir):
    sess = StreamingSqlSession(spark)
    sess.execute_script(CORPUS_SCRIPT.format(path=stream_dir))
    q = sess.queries["result_q101"]
    q.processAllAvailable()
    q.stop()
    got = {(r.window_start, r.event_type): r.cnt for r in spark.table("result_q101").collect()}

    ev = t(spark, sf_dir, "events")
    want = {
        (r.ws, r.event_type): r.cnt
        for r in ev.groupBy(F.window("ts", "1 hour").start.alias("ws"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


Q40_SCRIPT = """
-- q40-shaped: stream-stream event-time interval join, delay() on BOTH
-- sides with alias-qualified columns (q40.sql:26-41)
CREATE TABLE ev_views (event_id bigint, ts timestamp, user_id bigint,
                       event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '2');
CREATE TABLE ev_buys (event_id bigint, ts timestamp, user_id bigint,
                      event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '2');
CREATE TABLE result_q40 USING kafka OPTIONS (output.mode 'append');
INSERT INTO result_q40
SELECT a.event_id AS view_id, b.event_id AS buy_id
FROM ev_views a JOIN ev_buys b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts AND b.ts <= a.ts + interval 30 minutes
WHERE a.event_type = 'view' AND b.event_type = 'purchase'
  AND delay(a.ts) < '60 seconds' AND delay(b.ts) < '30 seconds'
"""


def test_q40_dual_watermark_interval_join_script(spark, sf_dir, stream_dir):
    sess = StreamingSqlSession(spark)
    sess.execute_script(Q40_SCRIPT.format(path=stream_dir))
    q = sess.queries["result_q40"]
    q.processAllAvailable()
    q.stop()
    got = {(r.view_id, r.buy_id) for r in spark.table("result_q40").collect()}

    ev = t(spark, sf_dir, "events")
    v = ev.where(F.col("event_type") == "view").alias("a")
    b = ev.where(F.col("event_type") == "purchase").alias("b")
    want = {
        (r.view_id, r.buy_id)
        for r in v.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("interval 30 minutes")),
        )
        .select(F.col("a.event_id").alias("view_id"), F.col("b.event_id").alias("buy_id"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


# --- full lifecycle on our own connectors (SURVEY §3.1 end to end) ----

CONNECTOR_SCRIPT = """
CREATE TABLE log_src (k bigint, v string) USING emrlog
    OPTIONS (path '{src}', maxOffsetsPerTrigger '60');
CREATE TABLE kv_sink USING emrkv
    OPTIONS (path '{dst}', output.mode 'append', checkpointLocation '{ckpt}');
INSERT INTO kv_sink SELECT k, upper(v) AS v FROM log_src WHERE k % 2 = 0
"""


def test_connector_lifecycle_sql_script(spark, tmp_path):
    import json as _json
    import time as _time

    src = tmp_path / "shards"
    dst = tmp_path / "sink"
    src.mkdir()
    dst.mkdir()
    for shard in range(2):
        with open(src / f"shard-{shard}.jsonl", "w") as fh:
            for i in range(50):
                fh.write(_json.dumps({"k": shard * 100 + i, "v": f"r{i}"}) + "\n")

    sess = StreamingSqlSession(spark)
    sess.execute_script(
        CONNECTOR_SCRIPT.format(src=src, dst=dst, ckpt=tmp_path / "ckpt")
    )
    q = sess.queries["kv_sink"]
    try:
        deadline = _time.time() + 30
        while _time.time() < deadline:
            q.processAllAvailable()
            files = [f for f in dst.iterdir() if f.name.endswith(".parquet")]
            if files and spark.read.parquet(f"{dst}/*.parquet").count() >= 50:
                break
            _time.sleep(0.3)
    finally:
        q.stop()
    got = spark.read.parquet(f"{dst}/*.parquet")
    rows = {(r.k, r.v) for r in got.collect()}
    assert len(rows) == 50  # 50 even keys across both shards
    assert all(k % 2 == 0 for k, _ in rows)
    assert {v for _, v in rows} <= {f"R{i}" for i in range(50)}


# --- q3-shape: stream-static star join + complete-mode ORDER BY -------

Q3_SHAPE_SCRIPT = """
SET spark.sql.shuffle.partitions=8;
CREATE TABLE ev_stream3 (event_id bigint, ts timestamp, user_id bigint,
                         event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '1');
CREATE TABLE customer_dim USING parquet OPTIONS (path '{dim}');
CREATE TABLE result_q3s USING kafka OPTIONS (output.mode 'complete');
INSERT INTO result_q3s
SELECT c_mktsegment, count(*) AS cnt, sum(value) AS total_value
FROM ev_stream3, customer_dim
WHERE user_id = c_custkey AND event_type IN ('view', 'purchase')
GROUP BY c_mktsegment
ORDER BY total_value DESC, c_mktsegment
"""


def test_q3_shape_stream_static_star_script(spark, sf_dir, stream_dir):
    sess = StreamingSqlSession(spark)
    sess.execute_script(
        Q3_SHAPE_SCRIPT.format(path=stream_dir, dim=f"{sf_dir}/customer.parquet")
    )
    q = sess.queries["result_q3s"]
    q.processAllAvailable()
    q.stop()
    got = [
        (r.c_mktsegment, r.cnt, round(r.total_value, 6))
        for r in spark.table("result_q3s").collect()
    ]

    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer")
    want = [
        (r.c_mktsegment, r.cnt, round(r.total_value, 6))
        for r in ev.where(F.col("event_type").isin("view", "purchase"))
        .join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .orderBy(F.col("total_value").desc(), "c_mktsegment")
        .collect()
    ]
    # complete-mode ORDER BY is respected in the materialized result
    assert got == want
    assert len(got) > 0


# --- q100-shape: HOPPING window declared via CTAS (q103 statement form)

Q100_SHAPE_SCRIPT = """
SET spark.sql.shuffle.partitions=8;
CREATE TABLE ev_stream100 (event_id bigint, ts timestamp, user_id bigint,
                           event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '1');
CREATE TABLE result_q100 USING kafka OPTIONS (output.mode 'complete') AS
SELECT window.start AS window_start, event_type, count(*) AS cnt
FROM ev_stream100
WHERE delay(ts) < '5 minutes'
GROUP BY HOPPING(ts, interval 2 hours, interval 1 hour), event_type
"""


def test_q100_shape_hopping_ctas_script(spark, sf_dir, stream_dir):
    sess = StreamingSqlSession(spark)
    sess.execute_script(Q100_SHAPE_SCRIPT.format(path=stream_dir))
    q = sess.queries["result_q100"]
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.event_type): r.cnt
        for r in spark.table("result_q100").collect()
    }

    ev = t(spark, sf_dir, "events")
    want = {
        (r.ws, r.event_type): r.cnt
        for r in ev.groupBy(
            F.window("ts", "2 hours", "1 hour").start.alias("ws"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


# --- q102-shape: append-mode windowed agg finalized by delay() --------

Q102_SHAPE_SCRIPT = """
SET spark.sql.shuffle.partitions=8;
CREATE TABLE ev_stream102 (event_id bigint, ts timestamp, user_id bigint,
                           event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '1');
CREATE TABLE result_q102 USING kafka OPTIONS (output.mode 'append');
INSERT INTO result_q102
SELECT window.start AS window_start, event_type, count(*) AS cnt
FROM ev_stream102
WHERE delay(ts) < '10 minutes'
GROUP BY TUMBLING(ts, interval 1 hour), event_type
"""


def test_q102_shape_append_watermark_script(spark, sf_dir, stream_dir):
    """q102.sql:16,33 — output mode append with a delay() watermark:
    only windows the watermark has passed are emitted, each exactly
    once with its final (batch-equal) count; the stream's still-open
    tail window is withheld."""
    sess = StreamingSqlSession(spark)
    sess.execute_script(Q102_SHAPE_SCRIPT.format(path=stream_dir))
    q = sess.queries["result_q102"]
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.event_type): r.cnt
        for r in spark.table("result_q102").collect()
    }

    ev = t(spark, sf_dir, "events")
    want = {
        (r.ws, r.event_type): r.cnt
        for r in ev.groupBy(F.window("ts", "1 hour").start.alias("ws"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert len(got) > 0
    # every emitted (finalized) window carries its complete batch count
    assert all(want[k] == v for k, v in got.items())
    # the open tail window(s) are withheld until the watermark passes
    assert len(got) < len(want)
    max_ws = max(ws for ws, _ in want)
    assert all(ws < max_ws for ws, _ in got)


# --- q71-shape: UNION ALL of two stream channels joined to a dim ------

Q71_SHAPE_SCRIPT = """
SET spark.sql.shuffle.partitions=8;
CREATE TABLE ev_web71 (event_id bigint, ts timestamp, user_id bigint,
                       event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '2');
CREATE TABLE ev_store71 (event_id bigint, ts timestamp, user_id bigint,
                         event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '2');
CREATE TABLE customer_dim71 USING parquet OPTIONS (path '{dim}');
CREATE TABLE result_q71 USING kafka OPTIONS (output.mode 'complete');
INSERT INTO result_q71
SELECT c_mktsegment, channel, count(*) AS cnt
FROM (SELECT user_id, 'web' AS channel FROM ev_web71 WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, 'store' AS channel FROM ev_store71 WHERE event_type = 'purchase') u,
     customer_dim71
WHERE u.user_id = c_custkey
GROUP BY c_mktsegment, channel
"""


def test_q71_shape_union_all_channels_script(spark, sf_dir, stream_dir):
    sess = StreamingSqlSession(spark)
    sess.execute_script(
        Q71_SHAPE_SCRIPT.format(path=stream_dir, dim=f"{sf_dir}/customer.parquet")
    )
    q = sess.queries["result_q71"]
    q.processAllAvailable()
    q.stop()
    got = {
        (r.c_mktsegment, r.channel): r.cnt
        for r in spark.table("result_q71").collect()
    }

    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer")
    web = ev.where(F.col("event_type") == "view").select("user_id", F.lit("web").alias("channel"))
    store = ev.where(F.col("event_type") == "purchase").select("user_id", F.lit("store").alias("channel"))
    want = {
        (r.c_mktsegment, r.channel): r.cnt
        for r in web.unionAll(store)
        .join(cust, F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "channel")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


# --- q27-shape: GROUP BY ROLLUP + grouping() in complete mode ---------
# (q18.sql:48, q22.sql:28-34, q27.sql:26-41 — public Spark supports
# streaming rollup aggregation directly, so the front-end passes it
# through untouched)

Q27_SHAPE_SCRIPT = """
SET spark.sql.shuffle.partitions=8;
CREATE TABLE ev_stream27 (event_id bigint, ts timestamp, user_id bigint,
                          event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '2');
CREATE TABLE customer_dim27 USING parquet OPTIONS (path '{dim}');
CREATE TABLE result_q27 USING kafka OPTIONS (output.mode 'complete');
INSERT INTO result_q27
SELECT c_mktsegment, event_type, grouping(event_type) AS g_et,
       count(*) AS cnt, sum(value) AS total_value
FROM ev_stream27, customer_dim27
WHERE user_id = c_custkey
GROUP BY ROLLUP(c_mktsegment, event_type)
"""


def test_q27_shape_streaming_rollup_script(spark, sf_dir, stream_dir):
    sess = StreamingSqlSession(spark)
    sess.execute_script(
        Q27_SHAPE_SCRIPT.format(path=stream_dir, dim=f"{sf_dir}/customer.parquet")
    )
    q = sess.queries["result_q27"]
    q.processAllAvailable()
    q.stop()
    got = {
        (r.c_mktsegment, r.event_type, r.g_et): (r.cnt, round(r.total_value, 6))
        for r in spark.table("result_q27").collect()
    }

    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer")
    want = {
        (r.c_mktsegment, r.event_type, r.g_et): (r.cnt, round(r.total_value, 6))
        for r in ev.join(cust, ev.user_id == cust.c_custkey)
        .rollup("c_mktsegment", "event_type")
        .agg(
            F.grouping("event_type").alias("g_et"),
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    }
    assert got == want
    assert len(got) > 0


# --- q8-shape: static INTERSECT subquery + IN + HAVING over the stream

Q8_SHAPE_SCRIPT = """
SET spark.sql.shuffle.partitions=8;
CREATE TABLE ev_stream8 (event_id bigint, ts timestamp, user_id bigint,
                         event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '2');
CREATE TABLE customer_dim8 USING parquet OPTIONS (path '{dim}');
CREATE TABLE nation_dim8 USING parquet OPTIONS (path '{nation}');
CREATE TABLE result_q8 USING kafka OPTIONS (output.mode 'complete');
INSERT INTO result_q8
SELECT c_mktsegment, count(*) AS cnt, sum(value) AS total_value
FROM ev_stream8, customer_dim8
WHERE user_id = c_custkey
  AND c_nationkey IN (SELECT n_nationkey FROM nation_dim8 WHERE n_regionkey IN (0, 1, 2)
                      INTERSECT
                      SELECT c_nationkey FROM customer_dim8 WHERE c_acctbal > 5000)
GROUP BY c_mktsegment
HAVING count(*) > 10
"""


def test_q8_shape_intersect_having_script(spark, sf_dir, stream_dir):
    sess = StreamingSqlSession(spark)
    sess.execute_script(
        Q8_SHAPE_SCRIPT.format(
            path=stream_dir,
            dim=f"{sf_dir}/customer.parquet",
            nation=f"{sf_dir}/nation.parquet",
        )
    )
    q = sess.queries["result_q8"]
    q.processAllAvailable()
    q.stop()
    got = {
        (r.c_mktsegment, r.cnt, round(r.total_value, 6))
        for r in spark.table("result_q8").collect()
    }

    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    keys = (
        nation.where(F.col("n_regionkey").isin(0, 1, 2))
        .select(F.col("n_nationkey").alias("k"))
        .intersect(cust.where(F.col("c_acctbal") > 5000).select(F.col("c_nationkey").alias("k")))
    )
    want = {
        (r.c_mktsegment, r.cnt, round(r.total_value, 6))
        for r in ev.join(cust, ev.user_id == cust.c_custkey)
        .join(keys, cust.c_nationkey == keys.k, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .where(F.col("cnt") > 10)
        .collect()
    }
    assert got == want
    assert len(got) > 0


# --- q73-shape: static derived table re-joined to the stream ----------

Q73_SHAPE_SCRIPT = """
SET spark.sql.shuffle.partitions=8;
CREATE TABLE ev_stream73 (event_id bigint, ts timestamp, user_id bigint,
                          event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '1');
CREATE TABLE customer_dim73 USING parquet OPTIONS (path '{dim}');
CREATE TABLE nation_dim73 USING parquet OPTIONS (path '{nation}');
CREATE TABLE result_q73s USING kafka OPTIONS (output.mode 'complete');
INSERT INTO result_q73s
SELECT dj.n_name, count(*) AS ev_cnt
FROM ev_stream73,
     (SELECT c_custkey, n_name
      FROM customer_dim73, nation_dim73
      WHERE c_nationkey = n_nationkey AND c_acctbal > 0) dj
WHERE user_id = dj.c_custkey
GROUP BY dj.n_name
"""


def test_q73_shape_derived_table_script(spark, sf_dir, stream_dir):
    sess = StreamingSqlSession(spark)
    sess.execute_script(
        Q73_SHAPE_SCRIPT.format(
            path=stream_dir,
            dim=f"{sf_dir}/customer.parquet",
            nation=f"{sf_dir}/nation.parquet",
        )
    )
    q = sess.queries["result_q73s"]
    q.processAllAvailable()
    q.stop()
    got = {(r.n_name, r.ev_cnt) for r in spark.table("result_q73s").collect()}

    ev = t(spark, sf_dir, "events")
    cust = t(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    nation = t(spark, sf_dir, "nation")
    want = {
        (r.n_name, r.ev_cnt)
        for r in ev.join(cust, ev.user_id == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("ev_cnt"))
        .collect()
    }
    assert got == want
    assert len(got) > 0


# --- emrkv as a batch SOURCE table in the dialect (S1-S3 via SQL) -----

KV_SOURCE_SCRIPT = """
CREATE TABLE docs_kv USING emrkv OPTIONS (
  path '{path}',
  catalog '{{"columns": {{"doc_id": {{"type": "bigint"}}, "lang": {{"type": "string"}}, "n_chars": {{"type": "bigint"}}}}}}'
);
CREATE TABLE kv_summary AS
SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars
FROM docs_kv WHERE n_chars > 100 GROUP BY lang
"""


def test_emrkv_batch_source_table_in_sql(spark, sf_dir):
    sess = StreamingSqlSession(spark)
    sess.execute_script(KV_SOURCE_SCRIPT.format(path=f"{sf_dir}/documents.parquet"))
    got = {
        (r.lang, r.n_docs, r.total_chars)
        for r in spark.table("kv_summary").collect()
    }
    docs = t(spark, sf_dir, "documents")
    want = {
        (r.lang, r.n_docs, r.total_chars)
        for r in docs.where(F.col("n_chars") > 100)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("total_chars"))
        .collect()
    }
    assert got == want and len(got) > 0
    # the subset catalog must actually prune: the registered view has
    # only the three declared columns
    assert set(spark.table("docs_kv").columns) == {"doc_id", "lang", "n_chars"}


# --- jdbc2 exactly-once sink declared in DDL (S23) --------------------

JDBC2_SCRIPT = """
SET spark.sql.shuffle.partitions=8;
CREATE TABLE ev_jdbc (event_id bigint, ts timestamp, user_id bigint,
                      event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '2');
CREATE TABLE sink_jdbc USING jdbc2
    OPTIONS (url 'jdbc:sqlite:{db}', dbtable 'purchases', output.mode 'append',
             checkpointLocation '{ckpt}');
INSERT INTO sink_jdbc
SELECT event_id, event_type FROM ev_jdbc WHERE event_type = 'purchase'
"""


def test_jdbc2_sink_sql_script_exactly_once(spark, sf_dir, stream_dir, tmp_path):
    """JdbcSourceProvider's `USING jdbc2` surface (JdbcSink.scala:50-70):
    the DDL-declared sink routes through the two-phase batchId commit
    log — all rows land exactly once — and the DEFAULT writer is the
    executor-side foreachPartition variant (no driver collect); the
    single-connection demo is opt-in via `writer 'driver'`."""
    import sqlite3

    db = str(tmp_path / "sink.db")
    sess = StreamingSqlSession(spark)
    sess.execute_script(
        JDBC2_SCRIPT.format(path=stream_dir, db=db, ckpt=str(tmp_path / "ckpt"))
    )
    q = sess.queries["sink_jdbc"]
    q.processAllAvailable()
    q.stop()

    want = t(spark, sf_dir, "events").where("event_type = 'purchase'").count()
    with sqlite3.connect(db) as con:
        n, nd = con.execute(
            "SELECT COUNT(*), COUNT(DISTINCT event_id) FROM purchases"
        ).fetchone()
        statuses = {
            s for (s,) in con.execute("SELECT status FROM purchases__stream_log")
        }
    assert n == nd == want  # every purchase exactly once
    assert statuses == {"COMMITTED"}
    # the default writer must be the executor-side sink: its data table
    # carries the per-partition idempotence tag the driver demo lacks
    with sqlite3.connect(db) as con:
        cols = {r[1] for r in con.execute("PRAGMA table_info(purchases)")}
    assert "_partition_id" in cols


# --- SESSION window extension (session_window rewrite) ----------------

SESSION_SCRIPT = """
SET spark.sql.shuffle.partitions=8;
CREATE TABLE ev_sess (event_id bigint, ts timestamp, user_id bigint,
                      event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '1');
CREATE TABLE result_sess USING kafka OPTIONS (output.mode 'append');
INSERT INTO result_sess
SELECT session_window.start AS sess_start, event_type, count(*) AS cnt
FROM ev_sess
WHERE delay(ts) < '10 minutes'
GROUP BY SESSION(ts, interval 30 minutes), event_type
"""


def test_session_window_sql_extension(spark, sf_dir, stream_dir):
    """SESSION(c, interval g) — the dialect extension beyond the
    corpus' TUMBLING/HOPPING — rewrites to session_window(); finalized
    sessions match the batch session_window answer."""
    sql, _ = rewrite_streaming_sql("GROUP BY SESSION(ts, interval 30 minutes)")
    assert "session_window(ts, '30 minutes')" in sql

    sess = StreamingSqlSession(spark)
    sess.execute_script(SESSION_SCRIPT.format(path=stream_dir))
    q = sess.queries["result_sess"]
    q.processAllAvailable()
    q.stop()
    got = {
        (r.sess_start, r.event_type): r.cnt
        for r in spark.table("result_sess").collect()
    }

    # the JSON replay serializes timestamps at millisecond precision,
    # and session bounds ARE event timestamps (unlike aligned tumbling
    # windows) — truncate the batch twin to match the wire format
    ev = t(spark, sf_dir, "events").withColumn(
        "ts", F.timestamp_millis((F.unix_micros("ts") / 1000).cast("long"))
    )
    want = {
        (r.ws, r.event_type): r.cnt
        for r in ev.groupBy(
            # group by the FULL session_window struct — grouping by its
            # .start would skip session merging entirely
            F.session_window("ts", "30 minutes").alias("sw"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("sw.start").alias("ws"), "event_type", "cnt")
        .collect()
    }
    assert len(got) > 0
    assert all(want.get(k) == v for k, v in got.items())
    assert len(got) < len(want)  # open tail sessions withheld


# --- S31: genuine Kafka transport config emission ---------------------


KAFKA_DDL = """
CREATE TABLE kafka_store_sales (ss_ticket_number bigint, ss_item_sk bigint)
USING kafka OPTIONS (
kafka.bootstrap.servers = "${BOOTSTRAP_SERVERS}",
subscribe = 'storesales',
output.mode = 'append',
kafka.schema.registry.url = "${SCHEMA_REGISTRY_URL}",
kafka.schema.record.name = 'StoreSales',
kafka.schema.record.namespace = 'org.apache.spark.emr.baseline.testing',
kafka.auto.register.schemas = 'true')
"""


def test_kafka_ddl_emits_real_transport_configs(spark):
    """The reference DDL (tables/kafka_store_sales.sql, verbatim shape)
    must yield ready-to-use format('kafka') option dicts plus the
    registry client config — with the unexpanded ${...} placeholders
    correctly routed to the file fallback (no broker)."""
    from aliyun_emapreduce_datasources_spark.plans.streaming_sql import (
        StreamingSqlSession,
        broker_configured,
        kafka_sink_config,
        kafka_source_config,
        registry_client_config,
    )

    sess = StreamingSqlSession(spark)
    sess.execute_script(KAFKA_DDL)
    cfg = sess.kafka_configs["kafka_store_sales"]
    assert cfg["source"] == {
        "kafka.bootstrap.servers": "${BOOTSTRAP_SERVERS}",
        "subscribe": "storesales",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }
    assert cfg["sink"]["topic"] == "storesales"
    assert cfg["registry"] == {
        "url": "${SCHEMA_REGISTRY_URL}",
        "record_name": "StoreSales",
        "record_namespace": "org.apache.spark.emr.baseline.testing",
        "auto_register": True,
    }
    # placeholder broker -> NOT configured -> declaration became a sink
    # registration, not a (doomed) readStream.format("kafka")
    assert not broker_configured({"kafka.bootstrap.servers": "${BOOTSTRAP_SERVERS}"})
    assert "kafka_store_sales" in sess.sinks

    # a real broker URL flips the switch and the emitted dicts carry it
    real = {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "storesales",
        "maxOffsetsPerTrigger": "10000",
    }
    assert broker_configured(real)
    src = kafka_source_config(real)
    assert src["kafka.bootstrap.servers"] == "broker-1:9092,broker-2:9092"
    assert src["maxOffsetsPerTrigger"] == "10000"
    snk = kafka_sink_config(real, "fallback_name")
    assert snk == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "topic": "storesales",
    }
    assert registry_client_config({})["auto_register"] is False


def test_kafka_real_broker_branch_attempts_kafka(spark):
    """With a REAL broker URL (not a ${} placeholder) and no path, the
    DDL must take the genuine readStream.format('kafka') branch — on a
    cluster with the kafka connector the table registers as a stream
    view; in this container (no connector jar) the load attempt raises
    naming the kafka source. Either outcome proves the branch executes
    instead of silently falling back to the file transport."""
    from aliyun_emapreduce_datasources_spark.plans.streaming_sql import (
        StreamingSqlSession,
    )

    sess = StreamingSqlSession(spark)
    ddl = (
        "CREATE TABLE ks_real (a bigint) USING kafka OPTIONS ("
        "kafka.bootstrap.servers 'broker-1:9092', subscribe 'topic_x')"
    )
    try:
        sess.execute(ddl)
    except Exception as e:  # no kafka connector jar in the sandbox
        assert "kafka" in str(e).lower()
    else:
        # connector available: must be a registered streaming view
        assert spark.table("ks_real").isStreaming
        assert "ks_real" in sess.stream_tables
    # config emission happens either way, and the dual-role declaration
    # is ALSO recorded as an INSERT target (reference source and result
    # tables share one DDL shape — ADVICE r03 medium: without this, an
    # INSERT INTO a real-broker result table silently lands in a memory
    # sink instead of the declared topic)
    assert sess.kafka_configs["ks_real"]["source"]["subscribe"] == "topic_x"
    assert "ks_real" in sess.sinks
    from aliyun_emapreduce_datasources_spark.plans.streaming_sql import (
        broker_configured,
    )

    assert broker_configured(sess.sinks["ks_real"])


def test_kafka_real_broker_sink_table_routes_insert_to_kafka_writer(
    spark, stream_dir
):
    """ADVICE r03 (medium): a real-broker `USING kafka` result-table
    declaration (broker + subscribe + output.mode, no path — the exact
    kafka_temp_table_qN shape, q3.sql:11-21) must be recorded in
    self.sinks so the later INSERT INTO takes the
    writeStream.format('kafka') branch. In this container (no connector
    jar) that branch raises naming kafka — which proves the routing; a
    silent memory-sink fallback would succeed and register the target
    as a memory table."""
    from aliyun_emapreduce_datasources_spark.plans.streaming_sql import (
        StreamingSqlSession,
    )

    sess = StreamingSqlSession(spark)
    sess.execute(
        "CREATE TABLE ev_stream_rb (event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string)"
        f" USING stream OPTIONS (path '{stream_dir}', maxFilesPerTrigger '1')"
    )
    sink_ddl = (
        "CREATE TABLE kafka_temp_rb USING kafka OPTIONS ("
        "kafka.bootstrap.servers 'broker-1:9092', subscribe 'temp_topic_rb', "
        "output.mode 'complete')"
    )
    try:
        sess.execute(sink_ddl)
    except Exception as e:  # source-view half dies without the jar
        assert "kafka" in str(e).lower()
    assert "kafka_temp_rb" in sess.sinks
    with pytest.raises(Exception, match="(?i)kafka"):
        sess.execute(
            "INSERT INTO kafka_temp_rb "
            "SELECT event_type, count(*) AS cnt FROM ev_stream_rb GROUP BY event_type"
        )
    # and it must NOT have fallen back to a memory sink
    assert "kafka_temp_rb" not in sess.queries


def test_kafka_real_broker_topic_only_declaration_is_sink_not_reader(spark):
    """ADVICE r03 (low): a real-broker declaration naming its topic only
    via `topic` (no `subscribe`) has no consumer config — the reader
    branch must not fire (it would KeyError on 'subscribe'); the
    declaration registers as a sink."""
    from aliyun_emapreduce_datasources_spark.plans.streaming_sql import (
        StreamingSqlSession,
    )

    sess = StreamingSqlSession(spark)
    sess.execute(
        "CREATE TABLE kafka_topic_only USING kafka OPTIONS ("
        "kafka.bootstrap.servers 'broker-1:9092', topic 'out_topic', "
        "output.mode 'append')"
    )
    assert "kafka_topic_only" in sess.sinks
    assert "kafka_topic_only" not in sess.stream_tables
    assert sess.kafka_configs["kafka_topic_only"]["source"] is None
    assert (
        sess.kafka_configs["kafka_topic_only"]["sink"]["topic"] == "out_topic"
    )


# --- late-replay mode for the q40/q100-q103 shapes (round-3 verdict
# ask #2): the reference simulator's late-data profile hits EVERY
# query (emr-baseline-testing Utils.scala toRdd delay block), so the
# most state-sensitive shapes — dual-watermark interval join, append-
# mode finalization, complete-mode windows — must hold under
# out-of-order delivery too, not just the 29 verbatim scripts.

LATE_FRACTION = 0.05


@pytest.fixture(scope="module")
def late_stream_env(spark, sf_dir):
    """Events replayed with the deterministic md5-coin late mode (5 %
    of rows delivered one micro-batch behind their event-time
    position), plus the exact late-row id set so tests can compute
    on-time batch twins."""
    import hashlib
    import json as _json

    d = tempfile.mkdtemp(prefix="sqlstream-late-")
    ev = t(spark, sf_dir, "events")
    replay_to_json_dir(
        ev, d, n_chunks=4, order_col="ts", late_fraction=LATE_FRACTION
    )
    late_ids = set()
    for r in ev.toJSON().collect():
        if int(hashlib.md5(r.encode()).hexdigest()[:8], 16) % 1000 < LATE_FRACTION * 1000:
            late_ids.add(_json.loads(r)["event_id"])
    yield {"dir": d, "late_ids": late_ids}
    shutil.rmtree(d, ignore_errors=True)


def test_q101_shape_complete_mode_late_replay(spark, sf_dir, late_stream_env):
    """q101 shape under late delivery: complete-mode aggregation state
    is never dropped by the watermark (pinned empirically: Spark keeps
    and updates windows behind the watermark in complete mode), so the
    final result must equal the batch answer over ALL rows — late ones
    included."""
    script = CORPUS_SCRIPT.replace("ev_stream", "ev_stream_l101").replace(
        "result_q101", "result_q101_l"
    )
    sess = StreamingSqlSession(spark)
    sess.execute_script(script.format(path=late_stream_env["dir"]))
    q = sess.queries["result_q101_l"]
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.event_type): r.cnt
        for r in spark.table("result_q101_l").collect()
    }
    ev = t(spark, sf_dir, "events")
    want = {
        (r.ws, r.event_type): r.cnt
        for r in ev.groupBy(F.window("ts", "1 hour").start.alias("ws"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert len(late_stream_env["late_ids"]) > 0  # lateness non-vacuous
    assert got == want


def test_q100_shape_hopping_ctas_late_replay(spark, sf_dir, late_stream_env):
    """q100 shape (HOPPING, CTAS statement form, complete mode) under
    late delivery: same full-equality contract as q101."""
    script = Q100_SHAPE_SCRIPT.replace("ev_stream100", "ev_stream100_l").replace(
        "result_q100", "result_q100_l"
    )
    sess = StreamingSqlSession(spark)
    sess.execute_script(script.format(path=late_stream_env["dir"]))
    q = sess.queries["result_q100_l"]
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.event_type): r.cnt
        for r in spark.table("result_q100_l").collect()
    }
    ev = t(spark, sf_dir, "events")
    want = {
        (r.ws, r.event_type): r.cnt
        for r in ev.groupBy(
            F.window("ts", "2 hours", "1 hour").start.alias("ws"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == want


def _append_mode_late_contract(spark, sf_dir, late_env, got):
    """The falsifiable append-mode-under-lateness contract: every
    emitted window is finalized (its end ≤ the final watermark), its
    count is bounded below by the on-time-only batch twin (on-time
    rows are never dropped: ts-sorted chunking keeps them ahead of
    the watermark) and above by the full batch twin (a late row may
    still land before its window finalizes, never after), and the
    stream's open tail is withheld."""
    ev = t(spark, sf_dir, "events")
    late_ids = late_env["late_ids"]
    assert len(late_ids) > 0

    def counts(df):
        return {
            (r.ws, r.event_type): r.cnt
            for r in df.groupBy(
                F.window("ts", "1 hour").start.alias("ws"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    full = counts(ev)
    ontime = counts(ev.where(~F.col("event_id").isin(list(late_ids))))
    assert len(got) > 0
    import datetime

    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    final_wm = max_ts - datetime.timedelta(minutes=10)
    for (ws, et), cnt in got.items():
        assert (ws, et) in full
        assert ws + datetime.timedelta(hours=1) <= final_wm, (ws, final_wm)
        assert ontime.get((ws, et), 0) <= cnt <= full[(ws, et)], (ws, et, cnt)
    # the open tail window is withheld until the watermark passes it
    assert len(got) < len(full)


def test_q102_shape_append_watermark_late_replay(spark, sf_dir, late_stream_env):
    script = Q102_SHAPE_SCRIPT.replace("ev_stream102", "ev_stream102_l").replace(
        "result_q102", "result_q102_l"
    )
    sess = StreamingSqlSession(spark)
    sess.execute_script(script.format(path=late_stream_env["dir"]))
    q = sess.queries["result_q102_l"]
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.event_type): r.cnt
        for r in spark.table("result_q102_l").collect()
    }
    _append_mode_late_contract(spark, sf_dir, late_stream_env, got)


Q103_SHAPE_SCRIPT = """
SET spark.sql.shuffle.partitions=8;
CREATE TABLE ev_stream103 (event_id bigint, ts timestamp, user_id bigint,
                           event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '1');
CREATE TABLE result_q103 USING kafka OPTIONS (output.mode 'append') AS
SELECT window.start AS window_start, event_type, count(*) AS cnt
FROM ev_stream103
WHERE delay(ts) < '10 minutes'
GROUP BY TUMBLING(ts, interval 1 hour), event_type
"""


def test_q103_shape_ctas_append_late_replay(spark, sf_dir, late_stream_env):
    """q103 statement form (CTAS declaring the sink inline, q103.sql:11-32)
    with append mode + delay(), under late delivery — the fourth
    extended-syntax shape, previously only covered on ordered input
    (and only in complete mode)."""
    sess = StreamingSqlSession(spark)
    sess.execute_script(Q103_SHAPE_SCRIPT.format(path=late_stream_env["dir"]))
    q = sess.queries["result_q103"]
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.event_type): r.cnt
        for r in spark.table("result_q103").collect()
    }
    _append_mode_late_contract(spark, sf_dir, late_stream_env, got)


def test_q40_shape_interval_join_late_replay(spark, sf_dir, late_stream_env):
    """q40 shape (dual-watermark event-time interval join — the most
    state-sensitive plan in the corpus) under late delivery. Contract:
    every pair of ON-TIME rows is emitted (ts-sorted chunking keeps
    on-time rows ahead of the watermark, and the b-side watermark lags
    b.ts by more than the interval upper bound keeps a-side state
    alive — see derivation in test body), no pair outside the batch
    answer is ever emitted, and pairs touching late rows may appear
    only with their batch semantics."""
    script = (
        Q40_SCRIPT.replace("ev_views", "ev_views_l")
        .replace("ev_buys", "ev_buys_l")
        .replace("result_q40", "result_q40_l")
    )
    sess = StreamingSqlSession(spark)
    sess.execute_script(script.format(path=late_stream_env["dir"]))
    q = sess.queries["result_q40_l"]
    q.processAllAvailable()
    q.stop()
    got = {(r.view_id, r.buy_id) for r in spark.table("result_q40_l").collect()}

    ev = t(spark, sf_dir, "events")
    late_ids = late_stream_env["late_ids"]

    def pairs(df):
        v = df.where(F.col("event_type") == "view").alias("a")
        b = df.where(F.col("event_type") == "purchase").alias("b")
        return {
            (r.view_id, r.buy_id)
            for r in v.join(
                b,
                (F.col("a.user_id") == F.col("b.user_id"))
                & (F.col("b.ts") >= F.col("a.ts"))
                & (F.col("b.ts") <= F.col("a.ts") + F.expr("interval 30 minutes")),
            )
            .select(
                F.col("a.event_id").alias("view_id"),
                F.col("b.event_id").alias("buy_id"),
            )
            .collect()
        }

    full = pairs(ev)
    ontime = pairs(ev.where(~F.col("event_id").isin(list(late_ids))))
    assert len(got) > 0
    assert ontime <= got, f"missing on-time pairs: {sorted(ontime - got)[:5]}"
    assert got <= full, f"phantom pairs: {sorted(got - full)[:5]}"


# --- q40 TRUE join type: LEFT OUTER interval join at the script level
# (q40.sql:26-41 is LEFT OUTER JOIN; the shape tests above pin the
# inner-join core — these pin the outer semantics: matched rows equal
# the inner join, null rows appear exactly for watermark-expired
# unmatched lefts, never for matched ones)

Q40_LOJ_SCRIPT = """
CREATE TABLE ev_views_lo (event_id bigint, ts timestamp, user_id bigint,
                          event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '2');
CREATE TABLE ev_buys_lo (event_id bigint, ts timestamp, user_id bigint,
                         event_type string, value double, props string)
USING stream OPTIONS (path '{path}', maxFilesPerTrigger '2');
CREATE TABLE result_q40lo USING kafka OPTIONS (output.mode 'append');
INSERT INTO result_q40lo
SELECT a.event_id AS view_id, b.event_id AS buy_id
FROM ev_views_lo a LEFT OUTER JOIN ev_buys_lo b
  ON a.user_id = b.user_id
 AND b.event_type = 'purchase'
 AND b.ts >= a.ts AND b.ts <= a.ts + interval 30 minutes
WHERE a.event_type = 'view'
  AND delay(a.ts) < '60 seconds' AND delay(b.ts) < '30 seconds'
"""


def _q40_batch_twins(spark, sf_dir, exclude_ids=None):
    """(inner_pairs, matched_lefts, unmatched_lefts) from the batch twin."""
    ev = t(spark, sf_dir, "events")
    if exclude_ids:
        ev = ev.where(~F.col("event_id").isin(list(exclude_ids)))
    v = ev.where(F.col("event_type") == "view").alias("a")
    b = ev.where(F.col("event_type") == "purchase").alias("b")
    inner = {
        (r.view_id, r.buy_id)
        for r in v.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") >= F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("interval 30 minutes")),
        )
        .select(
            F.col("a.event_id").alias("view_id"),
            F.col("b.event_id").alias("buy_id"),
        )
        .collect()
    }
    matched_lefts = {p[0] for p in inner}
    all_lefts = {r.event_id for r in v.select("a.event_id").collect()}
    return inner, matched_lefts, all_lefts - matched_lefts


def test_q40_left_outer_script_ordered(spark, sf_dir, stream_dir):
    sess = StreamingSqlSession(spark)
    sess.execute_script(Q40_LOJ_SCRIPT.format(path=stream_dir))
    q = sess.queries["result_q40lo"]
    q.processAllAvailable()
    q.stop()
    rows = spark.table("result_q40lo").collect()
    got_matched = {(r.view_id, r.buy_id) for r in rows if r.buy_id is not None}
    got_null_lefts = {r.view_id for r in rows if r.buy_id is None}

    inner, matched_lefts, unmatched_lefts = _q40_batch_twins(spark, sf_dir)
    # matched side: exactly the inner join
    assert got_matched == inner and len(inner) > 0
    # null rows: only for genuinely unmatched lefts (no phantom nulls),
    # and the watermark has expired enough of them to be non-vacuous;
    # the stream's tail lefts are legitimately withheld
    assert got_null_lefts, "no unmatched views emitted"
    assert got_null_lefts <= unmatched_lefts, (
        sorted(got_null_lefts - unmatched_lefts)[:5]
    )
    assert not (got_null_lefts & matched_lefts)


def test_q40_left_outer_script_late_replay(spark, sf_dir, late_stream_env):
    script = (
        Q40_LOJ_SCRIPT.replace("ev_views_lo", "ev_views_lol")
        .replace("ev_buys_lo", "ev_buys_lol")
        .replace("result_q40lo", "result_q40lol")
    )
    sess = StreamingSqlSession(spark)
    sess.execute_script(script.format(path=late_stream_env["dir"]))
    q = sess.queries["result_q40lol"]
    q.processAllAvailable()
    q.stop()
    rows = spark.table("result_q40lol").collect()
    got_matched = {(r.view_id, r.buy_id) for r in rows if r.buy_id is not None}
    got_null_lefts = {r.view_id for r in rows if r.buy_id is None}

    full_inner, _, _ = _q40_batch_twins(spark, sf_dir)
    ontime_inner, ontime_matched_lefts, _ = _q40_batch_twins(
        spark, sf_dir, exclude_ids=late_stream_env["late_ids"]
    )
    # on-time pairs are guaranteed (ts-sorted chunking keeps on-time
    # rows ahead of the watermark; the b-side watermark lags b.ts by
    # more than the interval upper bound, keeping a-side state alive);
    # pairs touching late rows may appear only with batch semantics
    assert ontime_inner <= got_matched, (
        sorted(ontime_inner - got_matched)[:5]
    )
    assert got_matched <= full_inner, sorted(got_matched - full_inner)[:5]
    # a left matched by an ON-TIME right must never emit a null row
    # (a late-dropped right may legitimately produce one)
    assert not (got_null_lefts & ontime_matched_lefts)
