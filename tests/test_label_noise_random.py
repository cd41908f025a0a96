"""Property test for kNN label-noise detection: on random small
embedding tables the operator must agree exactly with a pure-Python
reference (same micro-quantization, same integer dots, same
(dot desc, nbr asc) tie-break, self excluded), including when a
planted tight cluster of one label makes its members NON-noisy."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aliyun_emapreduce_datasources_spark.similarity.label_noise import (
    K_NN,
    emb_label_noise_knn,
)

DIM = 4


def ref_label_noise(rows, k=K_NN):
    # rows: (vec_id, [float...], label)
    q = {
        vid: ([math.floor(float(x) * 1000000.0) for x in emb], lab)
        for vid, emb, lab in rows
    }
    out = {}
    for i, (qi, li) in q.items():
        cands = []
        for j, (qj, lj) in q.items():
            if j == i:
                continue
            dot = sum(a * b for a, b in zip(qi, qj))
            cands.append((-dot, j, lj))
        cands.sort()
        top = cands[:k]
        n_same = sum(1 for _, _, lj in top if lj == li)
        out[i] = (li, n_same, 2 * n_same < k)
    return out


floats = st.integers(min_value=-999, max_value=999).map(lambda v: v / 1000.0)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(
        st.tuples(
            st.lists(floats, min_size=DIM, max_size=DIM),
            st.integers(min_value=0, max_value=2),
        ),
        min_size=2,
        max_size=20,
    )
)
def test_label_noise_matches_reference(spark, tmp_path_factory, vecs):
    # plant a tight same-label cluster: K_NN+1 near-identical vectors
    # of label 9 — each sees the other cluster members as top
    # neighbors, so none of them may flag as noisy
    # coords far outside the random range so no random vector can
    # out-dot a cluster sibling (intra dot ~400e12 vs ≤ 40e12 cross)
    planted = [
        ([10.0, 10.0, 10.0, 10.0 + 0.001 * i], 9) for i in range(K_NN + 1)
    ]
    allv = list(vecs) + planted
    rows = [(i, emb, lab) for i, (emb, lab) in enumerate(allv)]
    sf_dir = str(tmp_path_factory.mktemp("noise"))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    got = {
        r.vec_id: (r.label, r.n_same, r.is_noisy)
        for r in emb_label_noise_knn(spark, sf_dir).collect()
    }
    # reference must quantize from the FLOAT32 the table stores
    import numpy as np

    f32 = [
        (i, np.asarray(emb, dtype=np.float32).tolist(), lab)
        for i, (emb, lab) in enumerate(allv)
    ]
    want = ref_label_noise(f32)
    assert got == want
    planted_ids = [len(vecs) + i for i in range(K_NN + 1)]
    for pid in planted_ids:
        assert not got[pid][2]
