"""Property tests for corpus keyness and KS drift against pure-Python
references on random inputs.

- keyness: lift scores and per-source top-k ranks must match an
  independent Counter-based recomputation (same +1 smoothing, same
  MIN_CNT cut, same tie-break).
- KS: the statistic must match a direct two-pointer-free reference
  (evaluate both empirical CDFs on the pooled distinct-value grid),
  equal 0 when a type's values mirror the pool, and always lie in
  [0, 1].
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aliyun_emapreduce_datasources_spark.functions.keyness import (
    KEYNESS_K,
    MIN_CNT,
    text_keyness_lift,
)
from aliyun_emapreduce_datasources_spark.operators.events import events_ks_drift


def ref_keyness(rows):
    cnt, tot = Counter(), Counter()
    for src, text in rows:
        for w in text.split(" "):
            cnt[(src, w)] += 1
            tot[src] += 1
    total_all = sum(tot.values())
    tokall = Counter()
    for (src, w), c in cnt.items():
        tokall[w] += c
    per_src = {}
    for (src, w), c in cnt.items():
        if c < MIN_CNT:
            continue
        rest = tokall[w] - c
        lift = (c * (total_all - tot[src] + 1)) / (tot[src] * (rest + 1))
        per_src.setdefault(src, []).append((-lift, w, c, lift))
    out = {}
    for src, lst in per_src.items():
        lst.sort()
        for rnk, (_, w, c, lift) in enumerate(lst[:KEYNESS_K], 1):
            out[(src, w)] = (c, lift, rnk)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["x", "y", "z", "w", "v"]), min_size=8, max_size=40
        ),
        min_size=2,
        max_size=8,
    )
)
def test_keyness_matches_reference(spark, tmp_path_factory, texts):
    rows = [(i, f"s{i % 3}", " ".join(toks)) for i, toks in enumerate(texts)]
    sf_dir = str(tmp_path_factory.mktemp("keyness"))
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r.source, r.token): (r.cnt, r.lift, r.rnk)
        for r in text_keyness_lift(spark, sf_dir).collect()
    }
    want = ref_keyness([(src, text) for _, src, text in rows])
    assert set(got) == set(want)
    for k, (c, lift, rnk) in want.items():
        gc, glift, grnk = got[k]
        assert gc == c and grnk == rnk
        assert glift == pytest.approx(lift, rel=1e-12)


def ref_ks(rows):
    # rows: (event_type, value)
    by_t = {}
    for ty, v in rows:
        by_t.setdefault(ty, []).append(v)
    pooled = sorted(v for _, v in rows)
    n_all = len(pooled)
    grid = sorted(set(pooled))
    out = {}
    for ty, vals in by_t.items():
        vals = sorted(vals)
        n_t = len(vals)
        best = 0
        for g in grid:
            c_t = sum(1 for v in vals if v <= g)
            c_all = sum(1 for v in pooled if v <= g)
            best = max(best, abs(c_t * n_all - c_all * n_t))
        out[ty] = (n_t, best / (n_t * n_all))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=4,
        max_size=60,
    )
)
def test_ks_matches_reference(spark, tmp_path_factory, vals):
    rows = [(i, ty, float(v)) for i, (ty, v) in enumerate(vals)]
    sf_dir = str(tmp_path_factory.mktemp("ks"))
    spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    got = {
        r.event_type: (r.n_events, r.ks)
        for r in events_ks_drift(spark, sf_dir).collect()
    }
    want = ref_ks([(ty, float(v)) for ty, v in vals])
    assert set(got) == set(want)
    for ty, (n_t, ks) in want.items():
        gn, gks = got[ty]
        assert gn == n_t
        assert gks == pytest.approx(ks, rel=1e-12)
        assert 0.0 <= gks <= 1.0


def test_ks_zero_for_identical_distribution(spark, tmp_path_factory):
    # one type holding the whole pool in the same proportions → KS 0
    rows = [(i, "only", float(i % 7)) for i in range(70)]
    sf_dir = str(tmp_path_factory.mktemp("ks0"))
    spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    [r] = events_ks_drift(spark, sf_dir).collect()
    assert r.event_type == "only" and r.ks == 0.0


def ref_robust(rows):
    # rows: (event_type, value) — centi conversion mirrors the operator:
    # decimal(18,6) quantize then ROUND half away from zero (the
    # engine-portable form; a plain decimal→BIGINT cast truncates in
    # Spark but rounds in DuckDB)
    from decimal import Decimal

    by_t = {}
    for ty, v in rows:
        c = int(Decimal(str(v)).scaleb(2).to_integral_value(rounding="ROUND_HALF_UP"))
        by_t.setdefault(ty, []).append(c)
    out = {}
    for ty, cs in by_t.items():
        s = sorted(cs)
        n = len(s)
        med2 = s[(n - 1) // 2] + s[n // 2]
        dev = sorted(abs(2 * c - med2) for c in cs)
        mad4 = dev[(n - 1) // 2] + dev[n // 2]
        n_out = sum(1 for c in cs if 2 * abs(2 * c - med2) > 3 * mad4)
        out[ty] = (n, med2, mad4, n_out)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=-10000, max_value=10000),
        ),
        min_size=2,
        max_size=50,
    )
)
def test_robust_outliers_match_reference(spark, tmp_path_factory, vals):
    from aliyun_emapreduce_datasources_spark.operators.events import (
        events_robust_outliers,
    )

    # v/200 generates HALF-CENTI values (odd v → .005 ties), pinning
    # the round-away-from-zero conversion on the engine side too
    rows = [(i, ty, v / 200.0) for i, (ty, v) in enumerate(vals)]
    sf_dir = str(tmp_path_factory.mktemp("mad"))
    spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    got = {
        r.event_type: (r.n_events, r.med2_centi, r.mad4_centi, r.n_outliers)
        for r in events_robust_outliers(spark, sf_dir).collect()
    }
    want = ref_robust([(ty, v / 200.0) for ty, v in vals])
    assert got == want


def test_decayed_engagement_halves_per_week(spark, tmp_path_factory):
    from aliyun_emapreduce_datasources_spark.operators.events import (
        events_decayed_engagement,
    )
    from datetime import datetime

    # user 1: value 8.00 today; user 2: the same value 7 days earlier;
    # user 3: 70+ days earlier (clamped to weight 1 = 2^0)
    rows = [
        (1, 1, datetime(2024, 3, 1, 12), 8.0),
        (2, 2, datetime(2024, 2, 23, 12), 8.0),
        (3, 3, datetime(2023, 12, 1, 12), 8.0),
        (4, 1, datetime(2024, 3, 1, 13), 0.0),  # pins "now" per user 1
    ]
    sf_dir = str(tmp_path_factory.mktemp("decay"))
    spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    got = {
        r.user_id: r.score_scaled
        for r in events_decayed_engagement(spark, sf_dir).collect()
    }
    assert got[1] == 800 << 10          # fresh: full 2^10 weight
    assert got[2] == (800 << 10) // 2   # one half-life: exactly half
    assert got[3] == 800                # clamped tail: weight 1
