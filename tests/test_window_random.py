"""Randomized window-function differential test: hypothesis composes
a window query (partition key × ranking/offset/frame-aggregate
functions × ROWS frame), and the *same SQL text* runs on Spark and
DuckDB; results must match value-for-value. Completes the randomized
differential family (filter trees → aggregation plans → join trees →
window semantics).

Determinism: every OVER clause orders by (o_orderdate, o_orderkey) —
a TOTAL order, o_orderkey is unique — so ranking ties are impossible,
offset functions are well-defined, and ROWS frames select identical
row sets in both engines. Frame sums follow the decimal-exact
convention of operators/common.py.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aliyun_emapreduce_datasources_spark.operators.common import t
from test_oracle_parity import assert_frames_match

PARTS = {
    "o_orderstatus": "o_orderstatus",
    "o_orderpriority": "o_orderpriority",
    "cust_bucket": "o_custkey % 7",
    "order_year": "year(o_orderdate)",
}

# plain window functions (no frame allowed/needed)
PLAIN = {
    "rn": "ROW_NUMBER() OVER ({w})",
    "rnk": "CAST(RANK() OVER ({w}) AS BIGINT)",
    "drnk": "CAST(DENSE_RANK() OVER ({w}) AS BIGINT)",
    "nt4": "CAST(NTILE(4) OVER ({w}) AS BIGINT)",
    "lag_tp": "LAG(o_totalprice, 1) OVER ({w})",
    "lead_tp": "LEAD(o_totalprice, 2) OVER ({w})",
}

# frame-aggregates (ROWS frame appended)
FRAMED = {
    "cum_sum": "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER ({w} {f}) AS DOUBLE)",
    "run_min": "MIN(o_totalprice) OVER ({w} {f})",
    "run_max": "MAX(o_totalprice) OVER ({w} {f})",
    "cnt_w": "COUNT(*) OVER ({w} {f})",
}

FRAMES = [
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW",
    "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
]

_query = st.builds(
    lambda part, plain, framed, frame, filt: (part, plain, framed, frame, filt),
    part=st.sampled_from(sorted(PARTS)),
    plain=st.lists(st.sampled_from(sorted(PLAIN)), min_size=1, max_size=3, unique=True),
    framed=st.lists(st.sampled_from(sorted(FRAMED)), min_size=1, max_size=2, unique=True),
    frame=st.sampled_from(FRAMES),
    filt=st.booleans(),
)


def _build_sql(part, plain, framed, frame, filt) -> str:
    w = f"PARTITION BY {PARTS[part]} ORDER BY o_orderdate, o_orderkey"
    exprs = [f"{PLAIN[name].format(w=w)} AS {name}" for name in plain]
    exprs += [f"{FRAMED[name].format(w=w, f=frame)} AS {name}" for name in framed]
    where = " WHERE o_custkey % 4 = 1" if filt else ""
    return f"SELECT o_orderkey, {', '.join(exprs)} FROM orders{where}"


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_query)
def test_random_window_sql_matches_duckdb(q, spark, oracle):
    sql = _build_sql(*q)
    spark_pdf = spark.sql(sql).toPandas()
    oracle_pdf = oracle.execute(sql).df()
    assert_frames_match(spark_pdf, oracle_pdf, sql)
