"""Independent numpy recomputation of the eval-metrics family.

The DuckDB parity test pins Spark==oracle; these tests pin both
against a third, formula-level implementation (naive pairwise AUC,
dense-matmul argmax, full O(n²) retrieval walk) so a shared
misreading of the metric definition can't slip through two engines
that agree with each other.
"""

from __future__ import annotations

import numpy as np
import pytest

from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.similarity.evalmetrics import (
    MRR_K,
    N_CLASSES,
    RR_SCALE,
    _coef_binary,
    _coef_class,
    eval_auc_binary,
    eval_class_prf,
    eval_mrr_at_k,
    eval_topk_accuracy,
)


@pytest.fixture(scope="module")
def ql(spark, sf_dir):
    """(quantized int64 matrix, labels, vec_ids) straight from parquet."""
    rows = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    labels = np.array([r["label"] for r in rows], dtype=np.int64)
    q = np.floor(
        np.array([r["embedding"] for r in rows], dtype=np.float64) * 1e6
    ).astype(np.int64)
    return q, labels, ids


def test_auc_matches_naive_pairwise(spark, sf_dir, ql):
    q, labels, _ = ql
    s = q @ np.array(_coef_binary(), dtype=np.int64)
    y = labels >= 5
    pos, neg = s[y], s[~y]
    # O(n_pos·n_neg) literal definition
    gt = (pos[:, None] > neg[None, :]).sum()
    eq = (pos[:, None] == neg[None, :]).sum()
    expect = (gt + 0.5 * eq) / (len(pos) * len(neg))
    row = eval_auc_binary(spark, sf_dir).collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert row["auc_num2"] == 2 * gt + eq
    assert row["auc"] == pytest.approx(expect, abs=0, rel=0)


def test_prf_matches_dense_argmax(spark, sf_dir, ql):
    q, labels, _ = ql
    coef = np.array([_coef_class(c) for c in range(N_CLASSES)], dtype=np.int64)
    scores = q @ coef.T                      # (n, 10) exact int64
    # argmax with smaller-class tie-break == np.argmax (first max wins)
    pred = scores.argmax(axis=1)
    out = {r["class_id"]: r for r in eval_class_prf(spark, sf_dir).collect()}
    assert set(out) == set(np.unique(labels).tolist())
    for c in out:
        tp = int(((pred == c) & (labels == c)).sum())
        fp = int(((pred == c) & (labels != c)).sum())
        fn = int(((pred != c) & (labels == c)).sum())
        r = out[c]
        assert (r["tp"], r["fp"], r["fn"]) == (tp, fp, fn)
        assert r["n_true"] == tp + fn
        assert r["precision"] == (tp / (tp + fp) if tp + fp else 0.0)
        assert r["recall"] == tp / (tp + fn)
        assert r["f1"] == (2 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn else 0.0)
    # micro consistency: every vector predicted exactly once
    assert sum(r["tp"] + r["fn"] for r in out.values()) == len(labels)


def test_topk_accuracy_matches_dense_rank(spark, sf_dir, ql):
    q, labels, _ = ql
    coef = np.array([_coef_class(c) for c in range(N_CLASSES)], dtype=np.int64)
    scores = q @ coef.T
    # rank of the true class under (score desc, cls asc): stable sort
    # of -score keeps the smaller class first on ties
    order = np.argsort(-scores, axis=1, kind="stable")
    rank_true = (order == labels[:, None]).argmax(axis=1) + 1
    out = {r["class_id"]: r for r in eval_topk_accuracy(spark, sf_dir).collect()}
    for c in out:
        mask = labels == c
        assert out[c]["n"] == int(mask.sum())
        assert out[c]["top1_hits"] == int((rank_true[mask] == 1).sum())
        assert out[c]["top3_hits"] == int((rank_true[mask] <= 3).sum())
        assert out[c]["acc_top1"] == out[c]["top1_hits"] / out[c]["n"]
        assert out[c]["acc_top3"] == out[c]["top3_hits"] / out[c]["n"]


def test_mrr_matches_full_walk(spark, sf_dir, ql):
    q, labels, ids = ql
    dots = q @ q.T
    n = len(ids)
    sum_rr = {int(c): 0 for c in np.unique(labels)}
    n_q = {int(c): 0 for c in np.unique(labels)}
    for i in range(n):
        order = np.lexsort((ids, -dots[i]))
        order = order[ids[order] != ids[i]][:MRR_K]
        n_q[int(labels[i])] += 1
        for rank, j in enumerate(order, start=1):
            if labels[j] == labels[i]:
                sum_rr[int(labels[i])] += RR_SCALE // rank
                break
    out = {r["label"]: r for r in eval_mrr_at_k(spark, sf_dir).collect()}
    assert set(out) == set(sum_rr)
    for c in out:
        assert out[c]["n_queries"] == n_q[c]
        assert out[c]["sum_rr_x2520"] == sum_rr[c]
        assert out[c]["mrr"] == sum_rr[c] / (RR_SCALE * n_q[c])


def test_kendall_matches_naive_pairs(spark, sf_dir, ql):
    import math

    from aliyun_emapreduce_datasources_spark.similarity.evalmetrics import (
        eval_kendall_tau,
    )

    q, _, _ = ql
    sa = q @ np.array(_coef_binary(), dtype=np.int64)
    # class 1, not 0: class-0's coefficients are identical to the
    # binary probe's, which made tau degenerate (r09 fix)
    sb = q @ np.array(_coef_class(1), dtype=np.int64)
    da = np.sign(sa[:, None] - sa[None, :])
    db = np.sign(sb[:, None] - sb[None, :])
    m = np.triu(np.ones(da.shape, dtype=bool), k=1)
    prod = da * db
    c = int(((prod > 0) & m).sum())
    d = int(((prod < 0) & m).sum())
    ta = int(((da == 0) & (db != 0) & m).sum())
    tb = int(((db == 0) & (da != 0) & m).sum())
    tab = int(((da == 0) & (db == 0) & m).sum())
    row = eval_kendall_tau(spark, sf_dir).collect()[0]
    assert (row["concordant"], row["discordant"]) == (c, d)
    assert (row["tied_a_only"], row["tied_b_only"], row["tied_both"]) == (ta, tb, tab)
    n0 = c + d + ta + tb + tab
    assert row["n_pairs"] == n0 == len(sa) * (len(sa) - 1) // 2
    expect = (c - d) / math.sqrt(float((n0 - ta - tab)) * (n0 - tb - tab))
    assert row["tau_b"] == expect


def test_score_deciles_match_numpy_ntile(spark, sf_dir, ql):
    """NTILE(10) over (score, vec_id): the first (n mod 10) buckets
    hold ceil(n/10) rows, the rest floor(n/10) — recomputed directly
    from the numpy sort."""
    from aliyun_emapreduce_datasources_spark.similarity.evalmetrics import (
        eval_score_deciles,
    )

    q, labels, ids = ql
    s = q @ np.array(_coef_binary(), dtype=np.int64)
    y = (labels >= 5).astype(np.int64)
    order = np.lexsort((ids, s))
    n = len(s)
    base, extra = divmod(n, 10)
    out = {r["decile"]: r for r in eval_score_deciles(spark, sf_dir).collect()}
    assert set(out) == set(range(1, 11))
    pos = 0
    for d in range(1, 11):
        size = base + (1 if d <= extra else 0)
        idx = order[pos : pos + size]
        pos += size
        r = out[d]
        assert r["n"] == size
        assert r["n_pos"] == int(y[idx].sum())
        assert r["pos_rate"] == r["n_pos"] / size
        assert r["s_min"] == int(s[idx].min())
        assert r["s_max"] == int(s[idx].max())
    assert pos == n


def test_hard_negatives_match_full_walk(spark, sf_dir, ql):
    from aliyun_emapreduce_datasources_spark.similarity.evalmetrics import (
        emb_hard_negatives,
    )

    q, labels, ids = ql
    dots = q @ q.T
    want = {}
    for i in range(len(ids)):
        order = np.lexsort((ids, -dots[i]))
        order = order[ids[order] != ids[i]][:MRR_K]
        for rank, j in enumerate(order, start=1):
            if labels[j] != labels[i]:
                want[int(ids[i])] = (rank, int(ids[j]), int(labels[j]), int(dots[i][j]))
                break
    got = {
        r["vec_id"]: (r["hn_rank"], r["hn_id"], r["hn_label"], r["hn_dot"])
        for r in emb_hard_negatives(spark, sf_dir).collect()
    }
    assert got == want


def test_confusion_cells_match_dense_argmax(spark, sf_dir, ql):
    from aliyun_emapreduce_datasources_spark.similarity.evalmetrics import (
        eval_confusion_cells,
    )

    q, labels, _ = ql
    coef = np.array([_coef_class(c) for c in range(N_CLASSES)], dtype=np.int64)
    pred = (q @ coef.T).argmax(axis=1)
    want = {}
    for t_, p_ in zip(labels, pred):
        want[(int(t_), int(p_))] = want.get((int(t_), int(p_)), 0) + 1
    rows = eval_confusion_cells(spark, sf_dir).collect()
    got = {(r["true_class"], r["pred_class"]): r["n"] for r in rows}
    assert got == want
    for r in rows:
        row_n = sum(v for (t_, _), v in want.items() if t_ == r["true_class"])
        assert r["row_share"] == r["n"] / row_n
    # cells sum to the corpus
    assert sum(got.values()) == len(labels)


def test_class_probe_vectors_pairwise_distinct():
    """Regression for the round-9 mod-7 collapse: DIM=64 ≡ 1 (mod 7)
    made _coef_class 7-periodic in cls (classes 7-9 ≡ 0-2, unreachable
    as argmax). Under mod 11 every class probe must be distinct from
    every other AND from the binary probe."""
    probes = {c: tuple(_coef_class(c)) for c in range(N_CLASSES)}
    assert len(set(probes.values())) == N_CLASSES
    assert tuple(_coef_binary()) not in set(probes.values())
    # the historical collision, pinned explicitly
    assert probes[7] != probes[0]


def test_every_class_reachable_as_argmax():
    """With distinct probes, a vector aligned with class c's own
    coefficients must argmax to c (score-desc, cls-asc tie-break) —
    i.e. no class is structurally unreachable."""
    for c in range(N_CLASSES):
        target = np.array(_coef_class(c), dtype=np.int64)
        scores = [
            (np.array(_coef_class(k), dtype=np.int64) * target).sum()
            for k in range(N_CLASSES)
        ]
        ranked = sorted(range(N_CLASSES), key=lambda k: (-scores[k], k))
        assert ranked[0] == c, (c, scores)
