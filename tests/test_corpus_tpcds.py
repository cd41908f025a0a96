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

Scripts with non-TPC-DS shapes (q40 interval join, q100–q103 synthetic
window dialect) are covered by dedicated tests in test_streaming_sql.py.
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
            df, d, n_chunks=2, late_fraction=0.05 if late else 0.0
        )
        stream_dirs[name] = d
        # batch twin of the SAME data the stream delivers (JSON
        # round-trip) so streaming-vs-batch compares the execution
        # paths, not serialization artifacts
        spark.read.schema(df.schema).json(d).createOrReplaceTempView(f"{name}__batch")
    yield {"dims": dim_paths, "ddls": fact_ddls, "streams": stream_dirs}
    shutil.rmtree(base, ignore_errors=True)


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
