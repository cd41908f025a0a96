"""Randomized filter-tree differential test, mirroring the reference's
TableStoreFilterSuite randomized comparator combinations under And/Or
(TableStoreFilterSuite.scala:89-216, random at :167-191; SURVEY.md §5).

hypothesis generates arbitrary nested And/Or/Not trees over every leaf
comparator the compiler supports; each tree is evaluated two ways —
through KVTable.scan (compile → Catalyst → parquet scan) and by an
independent pure-Python evaluator over the collected rows — and the
row sets must agree. This pins the De Morgan negate-threading in
compile_filter against a second implementation.

The testdata has no NULLs, so two-valued logic suffices for the
Python referee (isnull/isnotnull still exercised — constant False/
True paths and their negations).
"""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aliyun_emapreduce_datasources_spark.sources.kv import KVCatalog, KVTable

CATALOG = """
{"table": "customer",
 "columns": {"c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
             "c_acctbal": "double", "c_mktsegment": "string"},
 "primary_keys": ["c_custkey"]}
"""

SEGMENTS = ["BUILDING", "MACHINERY", "AUTOMOBILE", "FURNITURE", "HOUSEHOLD"]

_num_col = st.sampled_from(["c_custkey", "c_nationkey", "c_acctbal"])
_num_val = st.one_of(st.integers(0, 150), st.floats(-1000, 10000, allow_nan=False))
_cmp_op = st.sampled_from(["eq", "ne", "gt", "ge", "lt", "le"])

_leaf = st.one_of(
    st.tuples(_cmp_op, _num_col, _num_val),
    st.tuples(_cmp_op, st.just("c_mktsegment"), st.sampled_from(SEGMENTS)),
    st.tuples(st.just("in"), st.just("c_nationkey"), st.lists(st.integers(0, 24), min_size=1, max_size=5)),
    st.tuples(st.just("in"), st.just("c_mktsegment"), st.lists(st.sampled_from(SEGMENTS), min_size=1, max_size=3)),
    st.tuples(st.just("startswith"), st.just("c_name"), st.sampled_from(["Customer#00000", "Customer#000001", "X"])),
    st.tuples(st.just("isnull"), _num_col),
    st.tuples(st.just("isnotnull"), _num_col),
)


def _trees(depth: int):
    if depth == 0:
        return _leaf
    sub = _trees(depth - 1)
    return st.one_of(
        _leaf,
        st.tuples(st.just("not"), sub),
        st.tuples(st.just("and"), sub, sub),
        st.tuples(st.just("or"), sub, sub),
    )


def _eval(node: tuple, row: dict) -> bool:
    op = node[0]
    if op == "and":
        return all(_eval(n, row) for n in node[1:])
    if op == "or":
        return any(_eval(n, row) for n in node[1:])
    if op == "not":
        return not _eval(node[1], row)
    if op == "isnull":
        return row[node[1]] is None
    if op == "isnotnull":
        return row[node[1]] is not None
    if op == "in":
        return row[node[1]] in node[2]
    if op == "startswith":
        return str(row[node[1]]).startswith(node[2])
    a, b = row[node[1]], node[2]
    return {
        "eq": a == b, "ne": a != b, "gt": a > b,
        "ge": a >= b, "lt": a < b, "le": a <= b,
    }[op]


@pytest.fixture(scope="module")
def kv_rows(spark, sf_dir):
    table = KVTable(KVCatalog.from_json(CATALOG), os.path.join(sf_dir, "customer.parquet"))
    rows = [r.asDict() for r in table.load(spark).collect()]
    return table, rows


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=_trees(3))
def test_random_filter_tree_matches_python_referee(kv_rows, spark, tree):
    table, rows = kv_rows
    got = {r.c_custkey for r in table.scan(spark, ["c_custkey"], [tree]).collect()}
    want = {r["c_custkey"] for r in rows if _eval(tree, r)}
    assert got == want, f"tree {tree}: spark={len(got)} python={len(want)}"
