"""Randomized aggregation-plan differential test: hypothesis composes
an ANSI-subset SQL query (filters x group keys x aggregates x optional
join x optional HAVING), and the *same SQL text* runs on Spark and
DuckDB; results must match value-for-value. Extends the randomized
filter-tree suite (test_kv_filter_random.py) from predicate semantics
to full aggregation-plan semantics, the way the reference's corpus
exercises operator combinations rather than single features.

The generated SQL follows the determinism conventions of
operators/common.py (decimal casts before SUM, no engine-native double
accumulation), so equality is exact and any mismatch is a real
semantics divergence.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aliyun_emapreduce_datasources_spark.operators.common import t
from test_oracle_parity import assert_frames_match

KEYS = {
    "o_orderstatus": "o_orderstatus",
    "o_orderpriority": "o_orderpriority",
    "order_year": "year(o_orderdate)",
    "cust_bucket": "o_custkey % 7",
}

AGGS = {
    "cnt": "COUNT(*)",
    "sum_tp": "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)",
    "min_tp": "MIN(o_totalprice)",
    "max_tp": "MAX(o_totalprice)",
    "nd_cust": "CAST(COUNT(DISTINCT o_custkey) AS BIGINT)",
}

PREDS = [
    "o_totalprice > 100000",
    "o_totalprice <= 250000.5",
    "o_orderstatus IN ('O', 'F')",
    "o_orderpriority IN ('1-URGENT', '2-HIGH', '5-LOW')",
    "o_orderdate >= TIMESTAMP '1997-01-01'",
    "o_orderdate < TIMESTAMP '2000-06-15'",
    "o_custkey % 3 = 1",
]

_query = st.builds(
    lambda keys, aggs, preds, conj, join, having: (
        keys, aggs, preds, conj, join, having
    ),
    keys=st.lists(st.sampled_from(sorted(KEYS)), min_size=1, max_size=3, unique=True),
    aggs=st.lists(st.sampled_from(sorted(AGGS)), min_size=1, max_size=4, unique=True),
    preds=st.lists(st.sampled_from(PREDS), min_size=0, max_size=3, unique=True),
    conj=st.sampled_from(["AND", "OR"]),
    join=st.booleans(),
    having=st.one_of(st.none(), st.integers(1, 20)),
)


def _build_sql(keys, aggs, preds, conj, join, having) -> str:
    key_exprs = ", ".join(f"{KEYS[k]} AS {k}" for k in keys)
    agg_exprs = ", ".join(f"{AGGS[a]} AS {a}" for a in aggs)
    frm = "orders"
    if join:
        frm = "orders JOIN customer ON o_custkey = c_custkey"
    where = f" WHERE {f' {conj} '.join(preds)}" if preds else ""
    group = ", ".join(KEYS[k] for k in keys)
    hav = f" HAVING COUNT(*) > {having}" if having is not None else ""
    return (
        f"SELECT {key_exprs}, {agg_exprs} FROM {frm}{where}"
        f" GROUP BY {group}{hav}"
    )


@pytest.fixture(scope="module", autouse=True)
def _views(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_query)
def test_random_aggregation_sql_matches_duckdb(q, spark, oracle):
    sql = _build_sql(*q)
    spark_pdf = spark.sql(sql).toPandas()
    oracle_pdf = oracle.execute(sql).df()
    assert_frames_match(spark_pdf, oracle_pdf, sql)


# --- randomized multi-table join trees ---------------------------------
# Extends the aggregation differential to join-plan semantics: random
# chains over the TPC-H-ish snowflake (lineitem→orders→customer→nation
# →region), random join types on the tail dim, random pushable filters
# — again one SQL text, two engines, exact value equality.

JOIN_CHAIN = [
    ("orders", None),
    ("customer", "o_custkey = c_custkey"),
    ("nation", "c_nationkey = n_nationkey"),
    ("region", "n_regionkey = r_regionkey"),
]

JOIN_PREDS = [
    "o_totalprice > 150000",
    "c_acctbal >= 0",
    "n_nationkey < 20",
    "o_orderstatus = 'O'",
]

_jquery = st.builds(
    lambda depth, jtype, preds, distinct: (depth, jtype, preds, distinct),
    depth=st.integers(1, 3),
    # semi/anti spelled as EXISTS/NOT EXISTS — the one syntax both
    # engines parse identically (Spark: LEFT SEMI, DuckDB: SEMI)
    jtype=st.sampled_from(["JOIN", "LEFT JOIN", "EXISTS", "NOT EXISTS"]),
    preds=st.lists(st.sampled_from(JOIN_PREDS), min_size=0, max_size=2, unique=True),
    distinct=st.booleans(),
)


def _build_join_sql(depth, jtype, preds, distinct) -> str:
    frm = "orders"
    for name, cond in JOIN_CHAIN[1:depth]:
        frm += f" JOIN {name} ON {cond}"
    tail_name, tail_cond = JOIN_CHAIN[depth]
    where_parts = list(preds)
    if tail_cond:
        if jtype in ("EXISTS", "NOT EXISTS"):
            where_parts.append(
                f"{jtype} (SELECT 1 FROM {tail_name} WHERE {tail_cond})"
            )
        else:
            frm += f" {jtype} {tail_name} ON {tail_cond}"
    where = f" WHERE {' AND '.join(where_parts)}" if where_parts else ""
    sel = "DISTINCT o_orderstatus, o_orderpriority" if distinct else "o_orderstatus, o_orderpriority, COUNT(*) AS cnt"
    group = "" if distinct else " GROUP BY o_orderstatus, o_orderpriority"
    return f"SELECT {sel} FROM {frm}{where}{group}"


@pytest.fixture(scope="module", autouse=True)
def _join_views(spark, sf_dir):
    for name in ("nation", "region"):
        t(spark, sf_dir, name).createOrReplaceTempView(name)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_jquery)
def test_random_join_tree_sql_matches_duckdb(q, spark, oracle):
    depth, jtype, preds, distinct = q
    # predicates must reference only visible columns: for semi/anti the
    # join-tail columns vanish; keep predicates on tables at depth-1
    visible = {1: ("o_",), 2: ("o_", "c_"), 3: ("o_", "c_", "n_")}[depth]
    preds = [p for p in preds if p.startswith(visible)]
    sql = _build_join_sql(depth, jtype, preds, distinct)
    spark_pdf = spark.sql(sql).toPandas()
    oracle_pdf = oracle.execute(sql).df()
    assert_frames_match(spark_pdf, oracle_pdf, sql)


# --- randomized set-operation trees -------------------------------------
# UNION ALL / UNION / INTERSECT / EXCEPT over compatible projections —
# one SQL text, two engines. Branch filters are drawn independently so
# the branches genuinely differ; DISTINCT-based set semantics must
# agree exactly.

SETOP_PREDS = [
    "o_orderstatus = 'O'",
    "o_totalprice > 120000",
    "o_custkey % 2 = 0",
    "o_orderpriority IN ('1-URGENT', '2-HIGH')",
]

_squery = st.builds(
    lambda op, p1, p2: (op, p1, p2),
    op=st.sampled_from(["UNION ALL", "UNION", "INTERSECT", "EXCEPT"]),
    p1=st.sampled_from(SETOP_PREDS),
    p2=st.sampled_from(SETOP_PREDS),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=_squery)
def test_random_set_operation_matches_duckdb(q, spark, oracle):
    op, p1, p2 = q
    sql = (
        f"SELECT o_orderstatus, o_custkey % 10 AS cb FROM orders WHERE {p1} "
        f"{op} "
        f"SELECT o_orderstatus, o_custkey % 10 AS cb FROM orders WHERE {p2}"
    )
    spark_pdf = spark.sql(sql).toPandas()
    oracle_pdf = oracle.execute(sql).df()
    assert_frames_match(spark_pdf, oracle_pdf, sql)


# --- randomized scalar-expression semantics -----------------------------
# The corpus leans on CASE WHEN, substr, concat (||), casts and date
# arithmetic (SURVEY §2.2). Random combinations evaluated row-wise on
# both engines pin their exact semantics (1-based substr, CASE
# fall-through, string concat of casts, interval arithmetic).

SCALARS = {
    "sub3": "substr(o_orderpriority, 1, 3)",
    "cat": "o_orderstatus || '-' || CAST(o_custkey % 100 AS STRING)",
    "case2": "CASE WHEN o_totalprice > 200000 THEN 'hi' WHEN o_totalprice > 80000 THEN 'mid' ELSE 'lo' END",
    "yr1": "year(o_orderdate) + 1",
    "mon": "month(o_orderdate)",
    "dplus": "o_orderdate + INTERVAL 30 DAY",
    "lenp": "length(o_orderpriority)",
    "lowc": "lower(o_orderstatus)",
}

_scq = st.lists(st.sampled_from(sorted(SCALARS)), min_size=2, max_size=4, unique=True)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(names=_scq)
def test_random_scalar_expressions_match_duckdb(names, spark, oracle):
    exprs = ", ".join(f"{SCALARS[n]} AS {n}" for n in names)
    sql = f"SELECT o_orderkey, {exprs} FROM orders WHERE o_custkey % 11 = 3"
    spark_pdf = spark.sql(sql).toPandas()
    oracle_pdf = oracle.execute(sql).df()
    assert_frames_match(spark_pdf, oracle_pdf, sql)
