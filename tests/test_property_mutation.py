"""Detector-sensitivity (mutation) tests for the property-violation
oracles (round-3 verdict ask #1a).

Every property entry pins violations = ∅; these tests close the
vacuous-green loophole by seeding a KNOWN violation — an injected bad
pair, a corrupted estimate, a flipped flag — into the operator under
check (monkeypatched at the module seam the property function resolves
at call time) and asserting the detector returns a NON-empty violation
set. Together with the rows-only recall tests (which pin the
"operator emits nothing" vacuity direction) this proves each oracle
can actually fire.

Seed constants below were measured once on the deterministic sf0.001
testdata (tests assert the preconditions they rely on).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.dedup import (
    bloom,
    clusters,
    decontaminate,
    embedding,
    minhash,
    ngram,
    properties as dprops,
    simhash,
    winnow,
)
from aliyun_emapreduce_datasources_spark.functions import bpe_train
from aliyun_emapreduce_datasources_spark.functions import text as text_fns
from aliyun_emapreduce_datasources_spark.operators import (
    analytic,
    approx_bounds,
    pipeline,
)
from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.similarity import (
    lsh,
    properties as sprops,
)

# two unrelated docs (raw shingle Jaccard 0.0, disjoint 16-gram sets,
# different near-dup clusters) — the universal "known-bad pair" seed
BAD_A, BAD_B = 0, 499
# adjacent docs with DISJOINT KGRAM-char sets (measured)
WINNOW_A, WINNOW_B = 0, 1
# embeddings with cosine ≈ −0.21 (far below any near-dup threshold)
LOWCOS_A, LOWCOS_B = 0, 7


def _inject_pair(real_query, a, b, extra=None):
    """Wrap an operator QUERY so its result gains one fabricated row."""

    def fake(spark, sf_dir):
        real = real_query(spark, sf_dir)
        row = {"doc_a": a, "doc_b": b, **(extra or {})}
        injected = real.sparkSession.createDataFrame(
            [tuple(row.get(c, None) for c in real.columns)], real.schema
        )
        return real.unionByName(injected)

    return fake


def test_bloom_detector_fires_on_dropped_flag(spark, sf_dir, monkeypatch):
    flagged = decontaminate.QUERY(spark, sf_dir).limit(1).collect()
    assert flagged, "precondition: exact decontamination flags docs"
    victim = flagged[0].doc_id
    real = bloom.QUERY
    monkeypatch.setattr(
        bloom,
        "QUERY",
        lambda s, d: real(s, d).where(F.col("doc_id") != victim),
    )
    bad = dprops.bloom_no_false_negatives(spark, sf_dir).collect()
    assert victim in {r.doc_id for r in bad}


def test_minhash_precision_detector_fires_on_injected_pair(
    spark, sf_dir, monkeypatch
):
    monkeypatch.setattr(
        minhash, "QUERY", _inject_pair(minhash.QUERY, BAD_A, BAD_B)
    )
    bad = dprops.minhash_precision_violations(spark, sf_dir).collect()
    assert (BAD_A, BAD_B) in {(r.doc_a, r.doc_b) for r in bad}


def test_winnow_containment_detector_fires_on_injected_pair(
    spark, sf_dir, monkeypatch
):
    monkeypatch.setattr(
        winnow, "QUERY", _inject_pair(winnow.QUERY, WINNOW_A, WINNOW_B)
    )
    bad = dprops.winnow_containment_violations(spark, sf_dir).collect()
    assert (WINNOW_A, WINNOW_B) in {(r.doc_a, r.doc_b) for r in bad}


def test_embedding_lsh_precision_detector_fires_on_far_pair(
    spark, sf_dir, monkeypatch
):
    real = embedding.QUERY

    def fake(s, d):
        df = real(s, d)
        injected = df.sparkSession.createDataFrame(
            [tuple({"vec_a": LOWCOS_A, "vec_b": LOWCOS_B}.get(c) for c in df.columns)],
            df.schema,
        )
        return df.unionByName(injected)

    monkeypatch.setattr(embedding, "QUERY", fake)
    bad = dprops.embedding_lsh_precision_violations(spark, sf_dir).collect()
    assert (LOWCOS_A, LOWCOS_B) in {(r.vec_a, r.vec_b) for r in bad}


def test_bpe_roundtrip_detector_fires_on_lossy_encode(
    spark, sf_dir, monkeypatch
):
    real = bpe_train.encode_word
    monkeypatch.setattr(
        bpe_train, "encode_word", lambda w, merges: real(w, merges)[:-1]
    )
    assert dprops.bpe_roundtrip_violations(spark, sf_dir).count() > 0


def test_ann_rank_detector_fires_on_reversed_ranks(
    spark, sf_dir, monkeypatch
):
    from pyspark.sql import Window

    real = lsh.QUERY

    def reversed_ranks(s, d):
        df = real(s, d)
        w = Window.partitionBy("query_id")
        return df.withColumn(
            "rnk", (F.max("rnk").over(w) + 1 - F.col("rnk")).cast(
                df.schema["rnk"].dataType.simpleString()
            )
        )

    monkeypatch.setattr(lsh, "QUERY", reversed_ranks)
    bad = sprops.ann_rank_consistency_violations(spark, sf_dir)
    assert bad.where(F.col("variant") == "lsh").count() > 0


def test_simhash_bits_detector_fires_on_far_pair(spark, sf_dir, monkeypatch):
    monkeypatch.setattr(
        simhash,
        "QUERY",
        _inject_pair(simhash.QUERY, BAD_A, BAD_B, extra={"hamming": 0}),
    )
    bad = dprops.simhash_bits_violations(spark, sf_dir).collect()
    assert (BAD_A, BAD_B) in {(r.doc_a, r.doc_b) for r in bad}


def test_minhash_cluster_containment_detector_fires_on_injected_pair(
    spark, sf_dir, monkeypatch
):
    real = ngram.ngram_jaccard_pairs

    def fake(s, d):
        df = real(s, d)
        injected = df.sparkSession.createDataFrame(
            [
                tuple(
                    {"doc_a": BAD_A, "doc_b": BAD_B, "jaccard": 1.0}.get(c)
                    for c in df.columns
                )
            ],
            df.schema,
        )
        return df.unionByName(injected)

    monkeypatch.setattr(ngram, "ngram_jaccard_pairs", fake)
    bad = dprops.minhash_cluster_containment_violations(spark, sf_dir).collect()
    assert (BAD_A, BAD_B) in {(r.doc_a, r.doc_b) for r in bad}


def test_hll_bound_detector_fires_on_inflated_estimate(
    spark, sf_dir, monkeypatch
):
    real = analytic.distinct_users_approx
    monkeypatch.setattr(
        analytic,
        "distinct_users_approx",
        lambda s, d: real(s, d).withColumn(
            "n_users_approx", F.col("n_users_approx") * 3
        ),
    )
    assert approx_bounds.hll_bound_violations(spark, sf_dir).count() > 0


def test_quantile_rank_detector_fires_on_shifted_quantile(
    spark, sf_dir, monkeypatch
):
    real = pipeline.doc_length_quantiles_approx
    monkeypatch.setattr(
        pipeline,
        "doc_length_quantiles_approx",
        lambda s, d: real(s, d).withColumn(
            "p50_chars", F.col("p50_chars") * 10
        ),
    )
    bad = approx_bounds.quantile_rank_violations(spark, sf_dir)
    assert bad.where(F.col("p_millis") == 500).count() > 0


def test_compression_bound_detector_fires_on_flipped_keep(
    spark, sf_dir, monkeypatch
):
    real = text_fns.compression_ratio
    monkeypatch.setattr(
        text_fns,
        "compression_ratio",
        lambda s, d: real(s, d).withColumn("keep", ~F.col("keep")),
    )
    assert approx_bounds.compression_bound_violations(spark, sf_dir).count() > 0


def test_seed_pair_preconditions(spark, sf_dir):
    """The seed constants' measured properties still hold on the
    testdata (guards the suite against dataset regeneration)."""
    from aliyun_emapreduce_datasources_spark.functions.text import (
        shingles,
        tokens,
    )
    from aliyun_emapreduce_datasources_spark.functions.vector import cosine

    docs = t(spark, sf_dir, "documents")
    sh = {
        r.doc_id: set(r.s)
        for r in docs.where(F.col("doc_id").isin([BAD_A, BAD_B]))
        .select("doc_id", F.array_distinct(shingles(tokens("text"))).alias("s"))
        .collect()
    }
    inter = sh[BAD_A] & sh[BAD_B]
    assert len(inter) / max(len(sh[BAD_A] | sh[BAD_B]), 1) < 0.5

    k = winnow.KGRAM
    texts = {
        r.doc_id: r.text
        for r in docs.where(F.col("doc_id").isin([WINNOW_A, WINNOW_B])).collect()
    }
    ga = {texts[WINNOW_A][i : i + k] for i in range(len(texts[WINNOW_A]) - k + 1)}
    gb = {texts[WINNOW_B][i : i + k] for i in range(len(texts[WINNOW_B]) - k + 1)}
    assert not (ga & gb)

    emb = t(spark, sf_dir, "embeddings")
    pair = (
        emb.where(F.col("vec_id") == LOWCOS_A)
        .crossJoin(
            emb.where(F.col("vec_id") == LOWCOS_B).withColumnsRenamed(
                {"vec_id": "vb", "embedding": "eb"}
            )
        )
        .select(cosine("embedding", "eb").alias("cos"))
        .collect()
    )
    assert pair[0].cos < embedding.COS_THRESHOLD - 1e-9


def test_sketch_merge_detector_fires_on_corrupted_union(
    spark, sf_dir, monkeypatch
):
    monkeypatch.setattr(
        approx_bounds, "sketch_global_estimate", lambda s, d: 10_000_000
    )
    assert approx_bounds.sketch_merge_violations(spark, sf_dir).count() == 1


def test_embedding_lsh_recall_detector_fires_on_dropped_pair(
    spark, monkeypatch
):
    """Round-5 companion sensitivity: deleting ONE s>=0.5 pair from the
    LSH output must surface exactly that pair in the recall-floor
    violation set (dedup_embedding_lsh_recall_check). Runs at sf0.01 —
    the driver-gate SF, and the smallest with an s>=0.5 pair (sf0.001
    has none; measured via the DuckDB oracle)."""
    import os

    from aliyun_emapreduce_datasources_spark.functions.vector import cosine

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.01 testdata not available")

    emb_df = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    hi_first = (
        embedding.embedding_neardup_blocked(spark, sf_dir)
        .join(
            emb_df.withColumnsRenamed({"vec_id": "vec_a", "embedding": "ea"}), "vec_a"
        )
        .join(
            emb_df.withColumnsRenamed({"vec_id": "vec_b", "embedding": "eb"}), "vec_b"
        )
        .where(cosine("ea", "eb") >= 0.5 + 1e-9)
        .select("vec_a", "vec_b")
        .orderBy("vec_a", "vec_b")
        .limit(1)
        .collect()
    )
    assert hi_first, "precondition: corpus has an s>=0.5 pair"
    a, b = hi_first[0].vec_a, hi_first[0].vec_b

    real = embedding.QUERY

    def fake(s, d):
        return real(s, d).where(
            ~((F.col("vec_a") == a) & (F.col("vec_b") == b))
        )

    monkeypatch.setattr(embedding, "QUERY", fake)
    bad = dprops.embedding_lsh_recall_violations(spark, sf_dir).collect()
    assert (a, b) in {(r.vec_a, r.vec_b) for r in bad}
