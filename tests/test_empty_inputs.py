"""Zero-row robustness: every operator family must return an empty
(or well-defined) result on an empty corpus instead of crashing —
np.vstack([]), argpartition on empty, divide-by-zero in ratios, and
first-row assumptions all die here if unguarded. At 100 TB an empty
PARTITION (not table) hits the same code paths via mapInPandas."""

from __future__ import annotations

import pytest

EMPTY_SAFE = [
    # representative per family — expression-tree, window, applyInPandas,
    # mapInPandas, cogroup, iterative, sketch, retrieval
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_cluster_resolve",
    "dedup_semantic",
    "dedup_embedding_cosine",
    "dedup_minhash_lsh",
    "chunk_documents",
    "dsir_importance",
    "lm_bigram_surprise",
    "sketch_cms_topk",
    "bm25_topk",
    "mix_epoch_plan",
    "curate_v2",
    "text_token_stats",
    "text_quality_score",
    "emb_label_centroid",
    "sample_weighted_reservoir",
    "text_boilerplate_scrub",
    "bpe_train_merges",
    "emb_kmeans_train",
    "emb_label_noise_knn",
    "lm_trigram_backoff",
    "events_drift_tv",
    "events_ks_drift",
    "events_robust_outliers",
    "events_decayed_engagement",
    "text_keyness_lift",
    "dedup_containment",
    "dedup_scrub_spans",
    "dedup_scrub_intra",
    "bpe_encode_corpus",
    # round-3 property-check companions (each re-runs its approximate
    # operator + an independent verify path on the empty corpus)
    "dedup_bloom_no_false_negatives",
    "dedup_minhash_precision_check",
    "dedup_winnow_containment_check",
    "dedup_embedding_lsh_precision_check",
    "bpe_roundtrip_check",
    "ann_rank_consistency_check",
    # round-4: audit profiles must match the oracle's zero-row answer on
    # an empty table (Spark's global agg otherwise yields a degenerate
    # all-NULL/zero-count profile row — ADVICE r03)
    "audit_schema_drift",
    "audit_column_profile",
    "dedup_cluster_weights",
    "distinct_users_sketch_merge_check",
    # round-6 additions: all corpus-only (documents/embeddings) plans
    "text_gopher_rules",
    "text_ccnet_buckets",
    "mix_temperature_alloc",
    "emb_bitext_mine",
    "mix_unimax_alloc",
    "text_trigram_novelty",
    "emb_dim_profile",
    "emb_covariance",
    "emb_abtt_residual_check",
    "events_value_percentiles",
]


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("empty-sf")
    for name in ("documents", "embeddings", "events", "orders"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").limit(0).write.mode(
            "overwrite"
        ).parquet(f"{d}/{name}.parquet")
    return str(d)


@pytest.mark.parametrize("name", EMPTY_SAFE)
def test_operator_survives_empty_corpus(spark, empty_sf_dir, name):
    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES

    # collect() materializes every output column (count() would let
    # Catalyst prune the very expressions under test)
    assert len(QUERIES[name](spark, empty_sf_dir).collect()) == 0
