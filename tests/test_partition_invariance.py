"""Results must not depend on the session's partitioning knobs.

The external driver supplies its OWN SparkSession — any
`spark.sql.shuffle.partitions` / input-split layout it likes — so a
catalog entry whose VALUES shift with partition count would pass every
fixed-config oracle run and still fail in the field. The oracle-backed
entries get this for free from the DuckDB comparison across differently
configured runs (driver local[16] vs test local[*]); this test pins the
contract explicitly for the ROWS-ONLY entries, where partition-sensitive
nondeterminism (reservoir order, per-partition tie-breaks, numpy batch
boundaries in mapInPandas) has no oracle to catch it.

Representative set: every approximate/hash family plus the entries with
per-partition numerics (signatures, sampling, training loops). The whole
catalog at two configs would double suite time for little extra signal —
these are the entries whose implementation touches partition boundaries.
"""

from __future__ import annotations

import pytest

from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES

# rows-only entries + the iterative/sampled oracle-backed ones whose
# mechanics are most partition-shaped
ENTRIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_winnow_fingerprint",
    "dedup_bloom_decontaminate",
    "dedup_minhash_clusters",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_int8_topk",
    "ann_pq_topk",
    "bpe_train_merges",
    "bpe_encode_corpus",
    "emb_kmeans_train",
    "mix_sample_weighted",
    "split_train_eval",
    "stable_global_ids",
    "sample_weighted_reservoir",  # reservoir = the classic partition-order trap
    "graph_pagerank",  # iterative with localCheckpoint
    "dedup_semantic",  # per-cluster greedy prune
    "emb_label_noise_knn",  # block cogroup + global top-k window
    "eval_mrr_at_k",  # same kernel, first-hit rank consumer
    "eval_kendall_tau",  # block-grid pair counting (triangle dedup)
    # round-4 entries whose window running sums have duplicate-key
    # ties — the classic place a partition-count change reorders rows
    "events_sessionize",
    "events_session_concurrency",
    "dedup_cluster_weights",
    "mix_soft_dedup_accounting",
    # round-6 scrub family: collect_list-based reconstruction (sorted
    # in-row before join) + the iterative fixpoint
    "dedup_scrub_spans",
    "dedup_scrub_intra",
    "dedup_scrub_fixpoint",
]


def _rows(df):
    cols = df.columns
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", ENTRIES)
def test_rows_only_entries_partition_invariant(spark, sf_dir, name):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        a = _rows(QUERIES[name](spark, sf_dir))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = _rows(QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b, f"{name}: result depends on shuffle partition count"


# --- ANSI-mode invariance ---------------------------------------------
# Spark 4 defaults spark.sql.ansi.enabled=true, but a legacy session
# flips it off, silently changing division-by-zero, overflow, and cast
# semantics from errors to NULLs. Every catalog entry is written so no
# such edge is ever hit (guard predicates, filtered zero denominators,
# bounded decimals) — which means results must be IDENTICAL either way.
ANSI_SENSITIVE = [
    "q1_pricing_summary",  # decimal aggregation
    "events_ks_drift",  # cross-multiplied CDFs + final division
    "events_robust_outliers",  # integer order statistics
    "events_drift_tv",  # integer DIV
    "text_quality_score",  # ratio arithmetic
    "text_tfidf_topk",  # rational scores
    "dsir_importance",  # hashed-bigram ratios
    "market_basket_lift",  # milli-unit lift division
    "pareto_revenue",  # cumulative share
    "emb_kmeans_train",  # quantized integer dots
    "olap_grouping_sets",
    "chunk_documents",  # DIV-based window math
    # round-4 error-bound oracles: integer cross-multiplies end to end
    "distinct_users_hll_bound_check",
    "doc_length_quantiles_rank_check",
    "text_compression_bound_check",  # keep-flag re-derivation + zlib bounds
]


@pytest.mark.parametrize("name", ANSI_SENSITIVE)
def test_entries_invariant_to_ansi_mode(spark, sf_dir, name):
    orig = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        a = _rows(QUERIES[name](spark, sf_dir))
        spark.conf.set("spark.sql.ansi.enabled", "false")
        b = _rows(QUERIES[name](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", orig)
    assert a == b, f"{name}: result depends on spark.sql.ansi.enabled"
