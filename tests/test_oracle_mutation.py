"""Mutation coverage for the round-7-promoted FULL oracles (round-7
verdict ask #8): dedup_scrub_fixpoint, bpe_train_merges and
bpe_encode_corpus graduated from rows-only to hash-checked DuckDB
oracles after the property-mutation suite was written, so nothing yet
proved those three comparisons can FAIL. Each test seeds a realistic
violation — the early-exit scrub bug, a corrupted merge statistic, a
truncated merge table — and asserts the driver-shaped comparison
(assert_frames_match, the same value contract the external driver
hashes) rejects it."""

from __future__ import annotations

import pytest

from aliyun_emapreduce_datasources_spark.dedup import spans
from aliyun_emapreduce_datasources_spark.functions import bpe_train
from test_oracle_parity import assert_frames_match


def _oracle_pdf(oracle, name):
    from aliyun_emapreduce_datasources_spark.operators.catalog import ORACLES

    return oracle.execute(ORACLES[name]).df()


def test_scrub_fixpoint_oracle_rejects_single_pass(spark, oracle, sf_dir):
    """The classic early-exit bug this oracle exists to catch: an
    engine that runs ONE scrub pass and stops. Precondition: the
    corpus genuinely needs more than one pass (otherwise the mutation
    is invisible and the test is vacuous)."""
    one_pass = spans.scrub_dup_spans(spark, sf_dir).select(
        "doc_id", "clean_text", "n_removed"
    ).toPandas()
    full = spans.scrub_spans_fixpoint(spark, sf_dir).toPandas()
    a = one_pass.sort_values("doc_id")["clean_text"].tolist()
    b = full.sort_values("doc_id")["clean_text"].tolist()
    assert a != b, "precondition: sf0.001 corpus must need >1 scrub pass"
    with pytest.raises(AssertionError):
        assert_frames_match(
            one_pass, _oracle_pdf(oracle, "dedup_scrub_fixpoint"), "mutated"
        )


def test_bpe_train_oracle_rejects_corrupted_pair_count(spark, oracle, sf_dir):
    """A merge table whose top merge ships an off-by-one pair count —
    the statistic the oracle's unrolled argmax chain re-derives — must
    hash-mismatch."""
    pdf = bpe_train.bpe_train_merges(spark, sf_dir).toPandas()
    assert len(pdf) > 0, "precondition: training emits merges"
    pdf.loc[pdf.index[0], "pair_count"] += 1
    with pytest.raises(AssertionError):
        assert_frames_match(
            pdf, _oracle_pdf(oracle, "bpe_train_merges"), "mutated"
        )


def test_bpe_encode_oracle_rejects_truncated_merge_table(
    spark, oracle, sf_dir, monkeypatch
):
    """An encoder shipped one merge short (a truncated tokenizer
    artifact — every symbol count downstream of the lost merge
    inflates) must hash-mismatch. Seeded at the ``_train_loop`` seam
    the encode entry resolves at call time (since the r11 optimization
    round the encode reads the training fold's final word table, so
    the loop itself — not ``train_merges`` — is the seam on the
    entry's path): running the loop one merge short yields exactly the
    final table an encoder missing its last merge would produce."""
    real = bpe_train._train_loop

    def truncated(words, n_merges, keep_word=False):
        assert n_merges > 1, "precondition: >1 merge trained"
        return real(words, n_merges - 1, keep_word)

    monkeypatch.setattr(bpe_train, "_train_loop", truncated)
    pdf = bpe_train.bpe_encode_corpus(spark, sf_dir).toPandas()
    with pytest.raises(AssertionError):
        assert_frames_match(
            pdf, _oracle_pdf(oracle, "bpe_encode_corpus"), "mutated"
        )
