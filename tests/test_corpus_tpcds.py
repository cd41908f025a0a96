"""Every TPC-DS-shaped corpus script executes VERBATIM through the
streaming-SQL front-end.

The reference runs these scripts (emr-baseline-testing/queries/qN.sql)
against Kafka stream facts + Hive dims on its closed-source extended
engine. Here the same `INSERT INTO … SELECT` statement text — byte for
byte, same table names / column names / literal predicates — runs on
public Spark via plans/streaming_sql.py, with plans/tpcds_adapter.py
deriving every referenced table deterministically from the driver
testdata and replaying the facts as micro-batched JSON (the file-source
stand-in for the Kafka topics, as everywhere else in tests/).

Correctness gate per script: the streaming result (memory sink, or the
micro-batch recompute fallback for plans Structured Streaming cannot
incrementalize) must equal the batch execution of the same statement
over the same fact data — order-insensitive, float-tolerant.

q40 — the corpus' hardest statement (dual-watermark stream-stream
interval LEFT OUTER join feeding static dim joins, append mode) — runs
byte-verbatim here too (test_q40_verbatim_interval_loj) under both
delivery orders, completing 30/30 verbatim corpus conformance; its
contract is the append-mode-under-lateness one (exact multiset equality
on ordered delivery; on-time-subset / full-superset bounds under late
delivery). The q100–q103 extended window dialect (TUMBLING / HOPPING /
delay() / CTAS) ALSO runs byte-verbatim — whole file, envsubst only —
in test_extended_dialect_script_verbatim, completing 34/34 verbatim
corpus conformance; the shape tests in test_streaming_sql.py remain as
the fine-grained contracts on the synthetic event stream.
"""

from __future__ import annotations

import math
import os
import re
import shutil
import tempfile
from decimal import Decimal

import pytest

from aliyun_emapreduce_datasources_spark.plans import tpcds_adapter as ad
from aliyun_emapreduce_datasources_spark.plans.streaming_sql import (
    StreamingSqlSession,
    rewrite_streaming_sql,
)
from aliyun_emapreduce_datasources_spark.streaming.sources import replay_to_json_dir

QUERIES_DIR = "/root/reference/emr-baseline-testing/queries"

SCRIPTS = [
    "q3", "q6", "q7", "q8", "q13", "q15", "q18", "q19", "q21", "q22",
    "q26", "q27", "q34", "q42", "q43", "q46", "q48", "q52", "q55",
    "q62", "q68", "q71", "q73", "q76", "q79", "q84", "q91", "q96", "q99",
]

# Scripts whose literal predicates are non-empty against the adapter
# data at sf0.01 (surveyed once, then pinned — a regression to zero
# rows means an adapter or front-end bug, not a data accident). q34's
# `cnt BETWEEN 15 AND 20` band is fed by the adapter's deterministic
# big-ticket slice (tpcds_adapter._store_sales: ~0.5% of orders
# replicated into 15-20-item tickets with q34-qualifying dim FKs) —
# 66 result rows at sf0.01.
NONEMPTY = set(SCRIPTS)

# The corpus statements' monthly+demographic slices need sf0.01 to be
# non-vacuous (a month of sf0.001 facts is ~75 rows); independent of
# the conftest SF so the correctness signal doesn't thin out.
TPCDS_SF_DIR = os.environ.get("SPARK_GRAFT_TPCDS_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="module", params=[False, True], ids=["ordered", "late"])
def tpcds_env(request, spark):
    """Corpus replay environment, parameterized over delivery order:

    - ``ordered``: clean 2-chunk replay (round-2 behavior);
    - ``late``: the reference simulator's late-data profile
      (emr-baseline-testing Utils.scala toRdd: ≤5% of rows delivered
      behind their position) via replay_to_json_dir's deterministic
      md5-coin late mode — every script's streaming-vs-batch equality
      must hold under out-of-order delivery too (the corpus scripts
      are complete-mode aggregations or stateless append joins, so no
      watermark drops anything; the watermark-drop contract itself is
      pinned on the synthetic stream in test_streaming.py).
    """
    sf_dir = TPCDS_SF_DIR
    if not os.path.isdir(QUERIES_DIR):
        pytest.skip("reference corpus scripts not available")
    late = request.param
    base = tempfile.mkdtemp(prefix="tpcds-")
    dim_paths = ad.materialize_dims(spark, sf_dir, os.path.join(base, "dims"))
    fact_ddls, stream_dirs = {}, {}
    for name in ad.FACT_BUILDERS:
        df = ad.build_table(spark, sf_dir, name)
        fact_ddls[name] = ad.fact_ddl(spark, sf_dir, name)
        d = os.path.join(base, "streams", name)
        replay_to_json_dir(
            df,
            d,
            n_chunks=2,
            # The append-mode statements are watermark-sensitive: q40's
            # interval join (catalog facts) and q102/q103's windowed agg
            # (store_sales) replay in event-time order (the Kafka
            # simulator's per-topic delivery order), so only md5-coin
            # LATE rows can ever trail the watermark. The other facts
            # feed complete-mode aggs — order-insensitive.
            order_col=_EVENT_ORDER_COLS.get(name),
            late_fraction=0.05 if late else 0.0,
        )
        stream_dirs[name] = d
        # batch twin of the SAME data the stream delivers (JSON
        # round-trip) so streaming-vs-batch compares the execution
        # paths, not serialization artifacts
        spark.read.schema(df.schema).json(d).createOrReplaceTempView(f"{name}__batch")
    yield {"dims": dim_paths, "ddls": fact_ddls, "streams": stream_dirs, "late": late}
    shutil.rmtree(base, ignore_errors=True)


_EVENT_ORDER_COLS = {
    "kafka_catalog_sales": "cs_data_time",
    "kafka_catalog_returns": "cr_data_time",
    "kafka_store_sales": "ss_data_time",
}


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    return v


def _key(row):
    return tuple(
        round(x, 4) if isinstance(x, float) else (str(x) if x is not None else "")
        for x in row
    )


def _close(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6)
    return a == b


def assert_same_rows(got, want, name):
    assert len(got) == len(want), f"{name}: {len(got)} streaming vs {len(want)} batch rows"
    got_n = sorted(([_norm(v) for v in r] for r in got), key=_key)
    want_n = sorted(([_norm(v) for v in r] for r in want), key=_key)
    for g, w in zip(got_n, want_n):
        assert len(g) == len(w) and all(
            _close(a, b) for a, b in zip(g, w)
        ), f"{name}: row mismatch {g} != {w}"


@pytest.mark.parametrize("qname", SCRIPTS)
def test_corpus_script_verbatim(spark, tpcds_env, qname):
    with open(os.path.join(QUERIES_DIR, f"{qname}.sql")) as fh:
        script_text = fh.read()
    sink, mode, insert_stmt = ad.extract_insert_statement(script_text)

    script = ad.build_script(
        insert_stmt, sink, mode,
        tpcds_env["ddls"], tpcds_env["streams"], tpcds_env["dims"],
    )
    sess = StreamingSqlSession(spark)
    sess.execute_script(script)
    q = sess.queries[sink]
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(sink).collect()

    # batch twin: same verbatim SELECT, facts bound to batch views over
    # the same replayed data
    select_sql = re.match(
        r"INSERT\s+INTO\s+[\w.]+\s+(.*)", insert_stmt, re.IGNORECASE | re.DOTALL
    ).group(1)
    batch_sql, _ = rewrite_streaming_sql(select_sql)
    for fact in ad.FACT_BUILDERS:
        batch_sql = re.sub(rf"\b{fact}\b", f"{fact}__batch", batch_sql)
    want = spark.sql(batch_sql).collect()

    assert_same_rows(got, want, qname)
    if qname in NONEMPTY:
        assert len(got) > 0, f"{qname}: expected non-empty result"


# --- q40 byte-verbatim: dual-watermark interval LEFT OUTER join ------
#
# q40.sql:26-41 is the corpus' only stream-stream join (catalog_sales
# LEFT OUTER catalog_returns on order/item + a 30 s event-time interval,
# `delay()` watermarks on both sides, append mode, then comma-joined
# static dims). Append-mode semantics make exact batch equality the
# right gate only for ordered delivery; under the late profile the
# watermark legitimately drops coin-late rows, so the contract becomes
# two-sided multiset bounds (the same append-mode-under-lateness
# contract as the shaped tests in test_streaming_sql.py).


def _md5_late_payloads(df, fraction=0.05):
    """Recompute replay_to_json_dir's deterministic md5 coin over the
    SAME serialization it chunks (df.toJSON), returning the late rows'
    JSON payloads."""
    import hashlib

    out = []
    for r in df.toJSON().collect():
        coin = int(hashlib.md5(r.encode()).hexdigest()[:8], 16) % 1000
        if coin < fraction * 1000:
            out.append(r)
    return out


def _counter_contains(big, small):
    return all(big.get(k, 0) >= c for k, c in small.items())


def test_q40_verbatim_interval_loj(spark, tpcds_env):
    from collections import Counter

    with open(os.path.join(QUERIES_DIR, "q40.sql")) as fh:
        script_text = fh.read()
    sink, mode, insert_stmt = ad.extract_insert_statement(script_text)
    assert mode == "append"  # q40.sql:17

    script = ad.build_script(
        insert_stmt, sink, mode,
        tpcds_env["ddls"], tpcds_env["streams"], tpcds_env["dims"],
    )
    sess = StreamingSqlSession(spark)
    sess.execute_script(script)
    q = sess.queries[sink]
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = Counter(tuple(r) for r in spark.table(sink).collect())

    select_sql = re.match(
        r"INSERT\s+INTO\s+[\w.]+\s+(.*)", insert_stmt, re.IGNORECASE | re.DOTALL
    ).group(1)
    batch_sql, _ = rewrite_streaming_sql(select_sql)
    for fact in ad.FACT_BUILDERS:
        batch_sql = re.sub(rf"\b{fact}\b", f"{fact}__batch", batch_sql)
    want_full = Counter(tuple(r) for r in spark.sql(batch_sql).collect())

    assert len(got) > 0, "q40: expected non-empty result"
    if not tpcds_env["late"]:
        # ordered delivery + watermark sentinels: every unmatched left
        # flushes, so streaming equals batch EXACTLY (multisets)
        assert got == want_full, (
            f"extra={sorted((got - want_full).items())[:5]} "
            f"missing={sorted((want_full - got).items())[:5]}"
        )
    else:
        # late delivery: the watermark may drop coin-late rows, never
        # on-time ones. Bounds: batch-over-on-time-rows <= got <=
        # batch-over-all-rows (as multisets).
        assert _counter_contains(want_full, got), (
            f"phantom rows: {sorted((got - want_full).items())[:5]}"
        )
        for fact in ("kafka_catalog_sales", "kafka_catalog_returns"):
            df = ad.build_table(spark, TPCDS_SF_DIR, fact)
            late = _md5_late_payloads(df)
            batch = spark.table(f"{fact}__batch")
            if late:
                late_df = spark.read.schema(batch.schema).json(
                    spark.sparkContext.parallelize(late)
                )
                batch = batch.exceptAll(late_df)
            batch.createOrReplaceTempView(f"{fact}__ontime")
        ontime_sql = batch_sql
        for fact in ad.FACT_BUILDERS:
            ontime_sql = re.sub(rf"\b{fact}__batch\b", f"{fact}__ontime", ontime_sql)
        want_ontime = Counter(tuple(r) for r in spark.sql(ontime_sql).collect())
        assert _counter_contains(got, want_ontime), (
            f"missing on-time rows: {sorted((want_ontime - got).items())[:5]}"
        )


# --- q100-q103 byte-verbatim: the extended streaming-SQL dialect ------
#
# The reference's own advertised syntax (emr-baseline-testing/README.md
# "Extended Streaming SQL"): HOPPING (q100.sql:33), TUMBLING
# (q101.sql:33), delay() watermark + append mode (q102.sql:33), CTAS
# sink declaration (q103.sql:11-32). These four files run here AS-IS —
# the whole script text, not just the extracted query statement — with
# only the deploy-time envsubst the reference's bin/run-query.sh
# performs (DB / TESTING_* / CHECKPOINT_ROOT; ${BOOTSTRAP_SERVERS} and
# ${SCHEMA_REGISTRY_URL} stay unexpanded exactly as in a broker-less
# environment, which is what routes the result to the memory sink).

EXT_SCRIPTS = ["q100", "q101", "q102", "q103"]
EXT_COMPLETE = {"q100", "q101"}  # q102/q103 declare output.mode append


def _envsub(text: str) -> str:
    return (
        text.replace("${DB}", "default")
        .replace("${TESTING_ENABLE}", "true")
        .replace("${TESTING_TIMEOUT_MS}", "60000")
        .replace("${CHECKPOINT_ROOT}", tempfile.gettempdir() + "/corpus-ckpt")
    )


_WINDOWED_TWIN_SQL = """
SELECT {window_expr}.start AS w,
       i_brand_id brand_id, i_brand brand,
       sum(ss_ext_sales_price) ext_price
FROM date_dim, {ss}, item
WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 28 AND d_moy = 11 AND d_year = 1999
GROUP BY {window_expr}, i_brand, i_brand_id
"""


def _ontime_store_sales_view(spark) -> None:
    """kafka_store_sales__batch minus the md5-coin late rows — the
    on-time twin for the append-mode bounds."""
    df = ad.build_table(spark, TPCDS_SF_DIR, "kafka_store_sales")
    batch = spark.table("kafka_store_sales__batch")
    late = _md5_late_payloads(df)
    if late:
        late_df = spark.read.schema(batch.schema).json(
            spark.sparkContext.parallelize(late)
        )
        batch = batch.exceptAll(late_df)
    batch.createOrReplaceTempView("kafka_store_sales__ontime")


def _append_windowed_late_contract(spark, got):
    """Append-mode-under-lateness for a windowed SUM whose window key
    is not projected (q102/q103 group by TUMBLING but select only
    brand): with the watermark sentinels every window finalizes, so

    - every emitted row must fit some window's [on-time sum, full sum]
      interval for its brand (ss_ext_sales_price >= 0 makes the
      interval monotone in integrated rows);
    - per brand, the emitted row count is bounded by the number of
      windows with on-time rows (below: on-time rows are never dropped
      under ts-sorted chunking) and the number of windows with any
      rows (above);
    - per brand, the total is bounded by the on-time and full totals.
    """
    win = "window(ss_data_time, '1 minute')"
    full = spark.sql(
        _WINDOWED_TWIN_SQL.format(window_expr=win, ss="kafka_store_sales__batch")
    ).collect()
    _ontime_store_sales_view(spark)
    ontime = spark.sql(
        _WINDOWED_TWIN_SQL.format(window_expr=win, ss="kafka_store_sales__ontime")
    ).collect()
    f_map, o_map = {}, {}
    for r in full:
        f_map[(r.w, r.brand_id, r.brand)] = r.ext_price
    for r in ontime:
        o_map[(r.w, r.brand_id, r.brand)] = r.ext_price
    brands_full = {(k[1], k[2]) for k in f_map}
    brands_ontime = {(k[1], k[2]) for k in o_map}
    tol = 1e-6

    got_by_brand: dict[tuple, list[float]] = {}
    for r in got:
        got_by_brand.setdefault((r.brand_id, r.brand), []).append(float(r.ext_price))

    assert brands_ontime <= set(got_by_brand) <= brands_full, (
        sorted(brands_ontime - set(got_by_brand))[:3],
        sorted(set(got_by_brand) - brands_full)[:3],
    )
    for brand, sums in got_by_brand.items():
        wins_full = {k[0] for k in f_map if (k[1], k[2]) == brand}
        wins_ontime = {k[0] for k in o_map if (k[1], k[2]) == brand}
        assert len(wins_ontime) <= len(sums) <= len(wins_full), (brand, sums)
        lo = sum(o_map[(w, *brand)] for w in wins_ontime)
        hi = sum(f_map[(w, *brand)] for w in wins_full)
        assert lo - tol <= sum(sums) <= hi + tol, (brand, sum(sums), lo, hi)
        for s in sums:
            assert any(
                o_map.get((w, *brand), 0.0) - tol <= s <= f_map[(w, *brand)] + tol
                for w in wins_full
            ), (brand, s)


@pytest.mark.parametrize("qname", EXT_SCRIPTS)
def test_extended_dialect_script_verbatim(spark, tpcds_env, qname):
    """q100-q103 execute byte-verbatim (whole file, envsubst only)
    through StreamingSqlSession, ordered + late replay. Contracts:
    complete mode (q100/q101) = exact streaming-vs-batch equality in
    BOTH orders (complete-mode state integrates late rows); append mode
    (q102/q103) = exact equality under ordered delivery (sentinels
    flush every window), two-sided window bounds under late."""
    with open(os.path.join(QUERIES_DIR, f"{qname}.sql")) as fh:
        script_text = fh.read()
    select_sql = ad.extract_select(script_text)
    sink = f"kafka_temp_table_{qname}"
    # harness reset: the ordered/late fixture params reuse one session
    spark.sql(f"DROP VIEW IF EXISTS {sink}")

    sess = StreamingSqlSession(spark)
    # the reference's bin/load.sh + tables/kafka_*.sql setup step
    sess.execute_script(
        ad.build_preamble(
            select_sql, tpcds_env["ddls"], tpcds_env["streams"], tpcds_env["dims"]
        )
    )
    # ... then the corpus file itself, as-is
    sess.execute_script(_envsub(script_text))
    q = sess.queries[sink]
    # all four shapes are incrementalizable: they must run as genuine
    # Structured Streaming queries, never the recompute fallback
    from aliyun_emapreduce_datasources_spark.plans.streaming_sql import (
        MicroBatchRecomputeQuery,
    )

    assert not isinstance(q, MicroBatchRecomputeQuery), qname
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table(sink).collect()
    assert len(got) > 0, f"{qname}: expected non-empty result"

    batch_sql, _ = rewrite_streaming_sql(select_sql)
    for fact in ad.FACT_BUILDERS:
        batch_sql = re.sub(rf"\b{fact}\b", f"{fact}__batch", batch_sql)
    want = spark.sql(batch_sql).collect()

    if qname in EXT_COMPLETE or not tpcds_env["late"]:
        assert_same_rows(got, want, qname)
    else:
        _append_windowed_late_contract(spark, got)
