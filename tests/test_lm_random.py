"""Randomized differential for the DSIR importance scorer: for random
small corpora, the Spark result must equal a pure-Python reference
implementation bit-for-bit (both use md5-bucket hashing and integer
floor division, so exact equality is the contract — any drift is a
real semantics bug, not float noise)."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from aliyun_emapreduce_datasources_spark.functions.lm import (
    N_BUCKETS,
    SCALE,
    TARGET_LANG,
    dsir_importance,
)

words = st.lists(st.sampled_from("aa bb cc dd ee ff".split()), min_size=2, max_size=12)
langs = st.sampled_from(["en", "fr", "zh"])


def _bucket(bigram: str) -> int:
    return int(hashlib.md5(bigram.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _reference(rows):
    per: dict[tuple[int, str], Counter] = {}
    for doc_id, lang, toks in rows:
        c = Counter(_bucket(f"{a} {b}") for a, b in zip(toks, toks[1:]))
        if c:
            per[(doc_id, lang)] = c
    raw: Counter = Counter()
    target: Counter = Counter()
    for (_, lang), c in per.items():
        for b, n in c.items():
            raw[b] += n
            if lang == TARGET_LANG:
                target[b] += n
    out = {}
    for (doc_id, lang), c in per.items():
        imp = sum(
            n * ((SCALE * (target[b] + 1)) // (raw[b] + 1)) for b, n in c.items()
        )
        out[doc_id] = (lang, imp, sum(c.values()))
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(st.tuples(langs, words), min_size=1, max_size=8),
)
def test_dsir_matches_python_reference(spark, tmp_path_factory, corpus):
    sf_dir = str(tmp_path_factory.mktemp("dsir"))
    rows = [(i, lang, toks) for i, (lang, toks) in enumerate(corpus)]
    spark.createDataFrame(
        [(i, lang, " ".join(toks)) for i, lang, toks in rows],
        "doc_id long, lang string, text string",
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    got = {
        r.doc_id: (r.lang, r.importance, r.n_feat)
        for r in dsir_importance(spark, sf_dir).collect()
    }
    assert got == _reference(rows)
