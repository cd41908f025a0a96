"""Differential test: distributed BPE merge loop vs a pure-Python
reference (Sennrich-style get_stats/merge_vocab), plus invariants.

Same pattern as the DSIR / incremental-dedup differentials: the
distributed algorithm must reproduce the sequential reference
byte-for-byte on the same inputs, including tie-breaks.
"""

from __future__ import annotations

import collections

import pytest
from hypothesis import given, settings, strategies as st

from aliyun_emapreduce_datasources_spark.functions.bpe_train import (
    EOW,
    bpe_train_merges,
    merge_word,
    train_merges,
)


def py_bpe(word_counts: dict[str, int], n_merges: int):
    """Sequential reference: classic BPE training over a word-frequency
    dict. Tie-break = (count desc, pair lexicographic asc), mirroring
    the distributed orderBy."""
    vocab = {tuple(list(w) + [EOW]): c for w, c in word_counts.items()}
    merges = []
    for _ in range(n_merges):
        stats = collections.Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += c
        if not stats:
            break
        (left, right), n = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, n))
        vocab = {
            tuple(merge_word(list(syms), left, right)): c for syms, c in vocab.items()
        }
    return merges


def spark_bpe(spark, word_counts: dict[str, int], n_merges: int):
    words = spark.createDataFrame(
        list(word_counts.items()), schema="w string, cnt long"
    )
    return train_merges(words, n_merges)


WORDS = st.text(alphabet="abcd", min_size=1, max_size=6)


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(WORDS, st.integers(min_value=1, max_value=50), min_size=1, max_size=30)
)
def test_bpe_differential_random(spark, word_counts):
    n = 6
    assert spark_bpe(spark, word_counts, n) == py_bpe(word_counts, n)


def test_bpe_catalog_entry_matches_reference(spark, sf_dir):
    """The catalog entry over the real documents table equals the
    pure-Python run over the same word frequencies."""
    from pyspark.sql import functions as F

    from aliyun_emapreduce_datasources_spark.functions.text import tokens
    from aliyun_emapreduce_datasources_spark.operators.common import t

    docs = t(spark, sf_dir, "documents")
    wc = {
        r["w"]: r["c"]
        for r in docs.select(F.explode(tokens("text")).alias("w"))
        .where(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    expected = py_bpe(wc, 8)
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in bpe_train_merges(spark, sf_dir).collect()
    ]
    assert got == expected
    # invariant: counts non-increasing is NOT guaranteed by BPE, but
    # every merge must have been the max of its round => count >= 1
    assert all(n >= 1 for _, _, n in got)


def test_merge_word_overlapping_runs():
    # "aaaa" with (a,a): greedy non-overlapping -> ["aa","aa"]
    assert merge_word(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert merge_word(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert merge_word(["x"], "a", "b") == ["x"]


@settings(max_examples=6, deadline=None)
@given(
    st.dictionaries(WORDS, st.integers(min_value=1, max_value=50), min_size=1, max_size=30)
)
def test_train_loop_final_table_is_the_encoded_vocab(spark, word_counts):
    """The r11 encode optimization reads the encoded vocabulary off the
    training loop's FINAL word table instead of re-encoding every word
    in Python — valid iff each row's syms after the last merge equals
    encode_word(w, merges) exactly (the greedy fold per iteration IS
    the encode replay)."""
    from aliyun_emapreduce_datasources_spark.functions.bpe_train import (
        _train_loop,
        encode_word,
    )

    words = spark.createDataFrame(
        list(word_counts.items()), schema="w string, cnt long"
    )
    merges3, final_sym = _train_loop(words, 6, keep_word=True)
    merges = [(l, r) for l, r, _ in merges3]
    got = {r["w"]: list(r["syms"]) for r in final_sym.collect()}
    assert got == {w: encode_word(w, merges) for w in word_counts}


def test_bpe_encode_corpus_has_no_python_stage(spark, sf_dir):
    """The encode entry's plan must hold no Python/Arrow evaluation
    node — the vocabulary encode rides the training fold (guide §4.1)."""
    from aliyun_emapreduce_datasources_spark.functions.bpe_train import (
        bpe_encode_corpus,
    )

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bpe_encode_corpus(spark, sf_dir).explain(mode="formatted")
    plan = buf.getvalue()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonMapInArrow"):
        assert node not in plan, node


def test_bpe_encode_corpus_matches_reference(spark, sf_dir):
    """Distributed encode accounting equals the pure-Python tokenizer
    run over the same docs with the same trained merges."""
    from pyspark.sql import functions as F

    from aliyun_emapreduce_datasources_spark.functions.bpe_train import (
        bpe_encode_corpus,
        encode_word,
    )
    from aliyun_emapreduce_datasources_spark.functions.text import tokens
    from aliyun_emapreduce_datasources_spark.operators.common import t

    docs = {
        r["doc_id"]: [w for w in r["ws"] if w]
        for r in t(spark, sf_dir, "documents")
        .select("doc_id", tokens("text").alias("ws"))
        .collect()
    }
    wc: dict[str, int] = {}
    for ws in docs.values():
        for w in ws:
            wc[w] = wc.get(w, 0) + 1
    merges = [(l, r) for l, r, _ in py_bpe(wc, 8)]
    enc_len = {w: len(encode_word(w, merges)) for w in wc}

    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_symbols"], r["n_chars_eow"])
        for r in bpe_encode_corpus(spark, sf_dir).collect()
    }
    want = {
        d: (
            len(ws),
            sum(enc_len[w] for w in ws),
            sum(len(w) + 1 for w in ws),
        )
        for d, ws in docs.items()
        if ws
    }
    assert got == want
