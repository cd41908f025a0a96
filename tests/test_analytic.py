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


def test_value_percentiles_match_numpy_rank_selection(spark, sf_dir):
    """Independent differential: the engine's rank-arithmetic
    percentile must equal numpy's sorted-array pick at index
    ceil(p*n/100)-1, per event type."""
    import math

    import numpy as np

    from aliyun_emapreduce_datasources_spark.operators.events import (
        events_value_percentiles,
    )

    rows = events_value_percentiles(spark, sf_dir).toPandas()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    ).toPandas()
    assert len(rows) == ev.event_type.nunique()
    for _, r in rows.iterrows():
        vals = np.sort(ev[ev.event_type == r.event_type].value.to_numpy())
        assert r.n == len(vals)
        for p, col in ((50, "p50"), (90, "p90"), (99, "p99")):
            assert r[col] == vals[math.ceil(p * len(vals) / 100) - 1]
        assert r.v_min <= r.p50 <= r.p90 <= r.p99 <= r.v_max


def test_join_skew_profile_invariants(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.operators.analytic import (
        audit_join_skew,
    )

    rows = audit_join_skew(spark, sf_dir).toPandas()
    assert len(rows) == 3
    assert (rows.skew_milli >= 1000).all()  # max >= mean always
    assert (rows.max_rows <= rows.n_rows).all()
    # hot key's count really is the max (re-derived in pandas)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    vc = li.l_partkey.value_counts()
    r = rows[rows.key_col == "lineitem.l_partkey"].iloc[0]
    assert vc.max() == r.max_rows
    assert vc[r.hot_key] == r.max_rows
