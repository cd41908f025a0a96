"""Property test for shingle-containment dedup: on random corpora
with a PLANTED doc-inside-doc pair, the operator must agree exactly
with a pure-Python reference (same stop-shingle DF cap, same pruned
containment), and the planted pair must be found when its containment
clears the threshold."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aliyun_emapreduce_datasources_spark.dedup.containment import (
    CONTAINMENT_THRESHOLD,
    MAX_DF,
    containment_pairs,
)

words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), min_size=3, max_size=18
)


def _shingle_set(toks: list[str]) -> set[str]:
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def ref_containment(rows):
    sh = {}
    for did, src, text in rows:
        toks = text.split(" ")
        sh[did] = (src, _shingle_set(toks) if len(toks) >= 3 else set())
    df = Counter()
    for _, (src, s) in sh.items():
        for g in s:
            df[(src, g)] += 1
    pruned = {
        did: (src, {g for g in s if df[(src, g)] <= MAX_DF})
        for did, (src, s) in sh.items()
    }
    out = {}
    ids = sorted(pruned)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, A = pruned[a]
            sb, B = pruned[b]
            if sa != sb or not A or not B:
                continue
            inter = len(A & B)
            if inter == 0:
                continue
            c = inter / min(len(A), len(B))
            if c >= CONTAINMENT_THRESHOLD:
                out[(a, b)] = c
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(words, min_size=2, max_size=6), data=st.data())
def test_containment_matches_reference_with_planted_pair(
    spark, tmp_path_factory, docs, data
):
    # plant: doc 0 embedded verbatim inside a longer wrapper doc
    wrapper = (
        data.draw(words, label="prefix") + docs[0] + data.draw(words, label="suffix")
    )
    rows = [(i, f"s{i % 2}", " ".join(toks)) for i, toks in enumerate(docs)]
    rows.append((len(docs), "s0", " ".join(wrapper)))
    sf_dir = str(tmp_path_factory.mktemp("containment"))
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/documents.parquet")

    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in containment_pairs(spark, sf_dir).collect()
    }
    want = ref_containment(rows)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-12)
    # the planted pair itself: doc 0's pruned shingles are a subset of
    # the wrapper's (same source s0), so containment is 1.0 unless the
    # DF cap pruned doc 0 to empty (impossible here: ≤ 7 docs < MAX_DF)
    planted = (0, len(docs))
    assert got[planted] == pytest.approx(1.0)
