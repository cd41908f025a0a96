"""Aggregated (QUERIES, ORACLES) for the dedup package."""

from __future__ import annotations

from aliyun_emapreduce_datasources_spark.dedup import (
    bloom,
    properties,
    clusters,
    containment,
    decontaminate,
    embedding,
    exact,
    incremental,
    minhash,
    ngram,
    semantic,
    simhash,
    spans,
    winnow,
)

QUERIES = {
    "dedup_exact": exact.QUERY,
    "dedup_exact_prefix": exact.exact_prefix_dedup,
    "dedup_decontaminate": decontaminate.QUERY,
    "dedup_source_overlap": decontaminate.source_overlap_matrix,
    "dedup_cluster_resolve": clusters.QUERY,
    "dedup_ngram_jaccard": ngram.QUERY,
    "dedup_dup_spans": spans.QUERY,
    "dedup_scrub_spans": spans.scrub_dup_spans,
    # iterative (driver loop); oracled since round 7 via the unrolled
    # 8-pass CTE chain (spans.ORACLE_SCRUB_FIXPOINT) AND hash-checked
    # by dedup_scrub_fixpoint_check in properties.py
    "dedup_scrub_fixpoint": spans.scrub_spans_fixpoint,
    "dedup_scrub_intra": spans.scrub_intra_doc_repeats,
    "dedup_minhash_lsh": minhash.QUERY,
    "dedup_simhash": simhash.QUERY,
    "dedup_embedding_cosine": embedding.QUERY,
    "dedup_winnow_fingerprint": winnow.QUERY,
    "dedup_semantic": semantic.QUERY,
    "dedup_bloom_decontaminate": bloom.QUERY,
    "dedup_minhash_clusters": clusters.minhash_cluster_resolve,
    "dedup_incremental": incremental.QUERY,
    "dedup_containment": containment.QUERY,
    "dedup_cluster_weights": clusters.dedup_cluster_weights,
    **properties.QUERIES,
}

# minhash/simhash/bloom moved to the portable md5 family in round 8,
# and winnow's polynomial rolling hash turned out to be SQL-exact as
# it stood — all four full oracles are staged in ORACLES_PENDING
# below (r09 promotion; the r08 oracled set is frozen for the
# rotation drain). embedding_cosine is LSH-blocked (recall < 1 by
# design) → rows-only; its exact blocked twin is oracle-checked in
# tests/test_dedup.py.
ORACLES = {
    "dedup_exact": exact.ORACLE,
    "dedup_exact_prefix": exact.ORACLE_PREFIX,
    "dedup_decontaminate": decontaminate.ORACLE,
    "dedup_source_overlap": decontaminate.ORACLE_OVERLAP,
    "dedup_cluster_resolve": clusters.ORACLE,
    "dedup_ngram_jaccard": ngram.ORACLE,
    "dedup_dup_spans": spans.ORACLE,
    "dedup_scrub_spans": spans.ORACLE_SCRUB,
    # round-7 promotion (verdict ask #7): the driver loop's 6+1 passes
    # unrolled as an idempotent 8-pass CTE chain — full value-hash
    # oracle instead of rows-only + property companion
    "dedup_scrub_fixpoint": spans.ORACLE_SCRUB_FIXPOINT,
    "dedup_scrub_intra": spans.ORACLE_INTRA,
    "dedup_incremental": incremental.ORACLE,
    "dedup_semantic": semantic.ORACLE,
    "dedup_containment": containment.ORACLE,
    "dedup_cluster_weights": clusters.ORACLE_CLUSTER_WEIGHTS,
    **properties.ORACLES,
}

# Round-8 (verdict ask #5, extended): dedup_simhash, dedup_minhash_lsh
# and dedup_bloom_decontaminate now run the PORTABLE md5 hash family
# (each module's CATALOG_HASH), and dedup_winnow_fingerprint's rolling
# hash was SQL-exact all along (mod-2^64 polynomial — no engine change)
# — all four have full DuckDB twins, validated Spark-vs-DuckDB in
# tests/test_pending_oracles.py. They are staged here instead of
# ORACLES because round 8 froze the oracled-entry set to drain the
# 50-entry r04-stale rotation cohort (verdict ask #1); round 9
# promotes by merging this dict into ORACLES above (4 fresh driver
# slots).
ORACLES_PENDING = {
    "dedup_simhash": simhash.ORACLE,
    "dedup_minhash_lsh": minhash.ORACLE,
    "dedup_bloom_decontaminate": bloom.ORACLE,
    "dedup_winnow_fingerprint": winnow.ORACLE,
}
