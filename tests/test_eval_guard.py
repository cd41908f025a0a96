"""Probe-size guard on the exact-pairwise eval kernels (round-7
verdict ask #4): exact_knn_topk / eval_kendall_tau / emb_bitext_mine
do O(n²/B) TOTAL pair work by contract — auto-blocking bounds the
per-task size but nothing bounds the pair total — so each must refuse
an input larger than its ``cap`` loudly instead of silently grinding
through a corpus-sized quadratic. eval_mrr_at_k / emb_hard_negatives
inherit the guard through the shared exact_knn_topk kernel (asserted
here via the kernel, not re-tested per consumer)."""

from __future__ import annotations

import pytest

from aliyun_emapreduce_datasources_spark.similarity import guard
from aliyun_emapreduce_datasources_spark.similarity.bitext import (
    emb_bitext_mine,
)
from aliyun_emapreduce_datasources_spark.similarity.evalmetrics import (
    eval_kendall_tau,
)
from aliyun_emapreduce_datasources_spark.similarity.label_noise import (
    exact_knn_topk,
)

N_ROWS = 12
DIM = 4


@pytest.fixture(scope="module")
def probe_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("evalguard"))
    rows = [
        (i, [((i * 7 + j * 3) % 11 - 5) / 10.0 for j in range(DIM)], i % 3)
        for i in range(N_ROWS)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


def test_exact_knn_topk_refuses_over_cap(spark, probe_dir):
    with pytest.raises(ValueError, match="exact-pairwise eval cap"):
        exact_knn_topk(spark, probe_dir, cap=N_ROWS - 1)


def test_exact_knn_topk_message_points_at_ann(spark, probe_dir):
    # the remediation must name the corpus-scale path, not just refuse
    with pytest.raises(ValueError, match="ANN operators"):
        exact_knn_topk(spark, probe_dir, cap=N_ROWS - 1)


def test_exact_knn_topk_runs_at_cap(spark, probe_dir):
    # cap == n is allowed (the guard is strictly-greater)
    out = exact_knn_topk(spark, probe_dir, cap=N_ROWS)
    assert out.where("vec_id = nbr").count() == 0
    assert out.count() > 0


def test_kendall_tau_refuses_over_cap(spark, probe_dir):
    with pytest.raises(ValueError, match="eval_kendall_tau"):
        eval_kendall_tau(spark, probe_dir, cap=N_ROWS - 1)


def test_kendall_tau_runs_at_cap(spark, probe_dir):
    row = eval_kendall_tau(spark, probe_dir, cap=N_ROWS).collect()[0]
    assert row.n_pairs == N_ROWS * (N_ROWS - 1) // 2


def test_bitext_refuses_over_cap(spark, probe_dir):
    with pytest.raises(ValueError, match="emb_bitext_mine"):
        emb_bitext_mine(spark, probe_dir, cap=N_ROWS - 1)


def test_guard_count_is_bounded(spark, probe_dir):
    # the guard's own check must be O(cap), not O(n): the plan it
    # counts carries a limit(cap + 1), so even the failure path never
    # scans a corpus
    df = spark.range(10_000).toDF("x")
    with pytest.raises(ValueError):
        guard.assert_probe_sized(df, "unit", cap=5)


def test_default_cap_is_documented_constant():
    assert guard.MAX_EVAL_ROWS == 100_000


def test_kendall_tau_sampled_estimator(spark, sf_dir):
    """The corpus-scale path: tau-b on a deterministic 1/2 row
    subsample must estimate the full statistic (bounded deviation on
    this deterministic corpus) while counting exactly the subsample's
    pairs — the knob that brings any corpus under the probe cap."""
    full = eval_kendall_tau(spark, sf_dir).collect()[0]
    est = eval_kendall_tau(spark, sf_dir, sample_every=2).collect()[0]
    assert est.n_pairs < full.n_pairs
    # sampled rows ~ n/2 → pairs ~ n²/8; sanity-bound the shrinkage
    assert est.n_pairs <= full.n_pairs // 2
    # measured on sf0.001: full tau ~ est tau well within 0.1; pin a
    # generous band — a sign flip or off-by-category bug lands far out
    assert abs(est.tau_b - full.tau_b) < 0.1


@pytest.fixture(scope="module")
def overcap_dir(spark, tmp_path_factory):
    # 240 deterministic rows — big enough that a cap of 100 refuses
    # the exact kernel, small enough to compute the true tau by opt-in.
    # Full 64-dim embeddings (the probe coefficients are 64-long;
    # shorter arrays NULL the scores through zip_with padding).
    d = str(tmp_path_factory.mktemp("evalguard_overcap"))
    rows = [
        (
            i,
            [((i * 13 + j * 5) % 23 - 11) / 12.0 for j in range(64)],
            i % 3,
        )
        for i in range(240)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


def test_kendall_tau_overcap_raise_then_sample(spark, overcap_dir):
    """r08 verdict ask #6 — the e2e pattern a user needs at corpus
    scale: the exact kernel REFUSES the over-cap input, and rerunning
    with ``sample_every`` brings the subsample under the SAME cap and
    returns a bounded-deviation estimate of the true statistic
    (computed here by deliberate cap opt-in, which is what the refusal
    message tells the user to choose between)."""
    cap = 100
    # step 1: the over-cap input refuses loudly
    with pytest.raises(ValueError, match="eval_kendall_tau"):
        eval_kendall_tau(spark, overcap_dir, cap=cap)
    # step 2: the sampled rerun passes the same guard (the md5 coin
    # keeps ~1/3 of 240 rows — under the cap) ...
    est = eval_kendall_tau(
        spark, overcap_dir, cap=cap, sample_every=3
    ).collect()[0]
    assert 0 < est.n_pairs <= cap * (cap - 1) // 2
    # ... and estimates the true tau within the sampling-error band:
    # the subsample has ~80 rows → s.e. ~ O(1/sqrt(80)) ≈ 0.11; pin
    # 2 s.e. — a sign flip or tie-category bug lands far outside
    true = eval_kendall_tau(spark, overcap_dir, cap=240).collect()[0]
    # non-degenerate on purpose (concordant AND discordant pairs) so
    # the deviation bound is falsifiable — measured dev 0.021
    assert true.concordant > 0 and true.discordant > 0
    assert abs(true.tau_b) < 0.99
    assert abs(est.tau_b - true.tau_b) < 0.25
