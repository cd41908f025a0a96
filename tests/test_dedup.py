"""Semantic checks for the dedup operators beyond oracle parity:
MinHash-LSH must recover the high-Jaccard pairs that exact (blocked)
shingle-Jaccard finds, and the generic keep-first dedup must actually
deduplicate."""

from __future__ import annotations

from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.dedup import minhash, ngram
from aliyun_emapreduce_datasources_spark.dedup.exact import dedup_keep_first


def test_minhash_lsh_recovers_exact_jaccard_pairs(spark, sf_dir):
    exact_pairs = {
        (r.doc_a, r.doc_b)
        for r in ngram.ngram_jaccard_pairs(spark, sf_dir).collect()
        if r.jaccard >= 0.6
    }
    lsh_pairs = {
        (r.doc_a, r.doc_b) for r in minhash.minhash_dedup_pairs(spark, sf_dir, threshold=0.5).collect()
    }
    # LSH searches *unblocked*, so it must find at least every blocked
    # exact pair at a comfortably-above-threshold Jaccard.
    missed = exact_pairs - lsh_pairs
    assert not missed, f"LSH missed high-jaccard pairs: {missed}"


def test_minhash_pairs_verified_above_threshold(spark, sf_dir):
    rows = minhash.minhash_dedup_pairs(spark, sf_dir, threshold=0.5).collect()
    assert all(r.jaccard >= 0.5 for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)


def test_dedup_keep_first_removes_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other"), (4, "same text")],
        "id long, body string",
    )
    out = dedup_keep_first(df, "body", "id").collect()
    assert sorted(r.id for r in out) == [1, 3]
