"""Analytic-operator checks beyond the oracle gate (which covers all
the deterministic entries in operators/analytic.py automatically via
test_oracle_parity): sketch error bound and window totality."""

from __future__ import annotations

from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.analytic import (
    distinct_users_approx,
    distinct_users_exact,
    win_sessionize,
)


def test_approx_distinct_within_rsd(spark, sf_dir):
    exact = {r.event_type: r.n_users for r in distinct_users_exact(spark, sf_dir).collect()}
    approx = {r.event_type: r.n_users_approx for r in distinct_users_approx(spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for k, e in exact.items():
        # rsd=0.02 → generous 5-sigma-ish bound; catches a broken sketch
        assert abs(approx[k] - e) <= max(5, 0.10 * e), (k, approx[k], e)


def test_sessionize_counts_consistent(spark, sf_dir):
    out = win_sessionize(spark, sf_dir)
    bad = out.where((F.col("n_sessions") < 1) | (F.col("n_sessions") > F.col("n_events")))
    assert bad.count() == 0
