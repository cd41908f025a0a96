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
# it stood — all four full oracles were staged through round 8 (the
# r08 oracled set was frozen for the rotation drain) and PROMOTED in
# round 9 (verdict r08 ask #1): they are ordinary ORACLES entries now,
# see PROMOTED_R09 below. dedup_embedding_cosine joined the portable
# family in round 10 (r09 verdict ask #2): micro-quantized integer
# cosine law + md5-derived planes + integer-exact scale laws make the
# whole LSH-block/verify pipeline a full DuckDB value-hash oracle —
# the rows-only set is now only the irreducibly approximate entries
# (ANN×4, HLL, approx-quantiles, minhash-clusters, zlib ratio).
ORACLES = {
    "dedup_simhash": simhash.ORACLE,
    "dedup_embedding_cosine": embedding.ORACLE_PORTABLE,
    # round-10 promotion: md5-family pairs + recursive min-label CTE
    "dedup_minhash_clusters": clusters.ORACLE_MINHASH_CLUSTERS,
    "dedup_minhash_lsh": minhash.ORACLE,
    "dedup_bloom_decontaminate": bloom.ORACLE,
    "dedup_winnow_fingerprint": winnow.ORACLE,
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

# Round-9 promotion record (verdict r08 ask #1). These four ran the
# PORTABLE md5 hash family since round 8 (each module's CATALOG_HASH;
# winnow's mod-2^64 polynomial rolling hash was SQL-exact all along)
# with full DuckDB twins validated Spark-vs-DuckDB in
# tests/test_pending_oracles.py plus NULL-parity and mutation tests.
# Round 8 froze the oracled set to drain the r04-stale rotation
# cohort, so they were staged in a separate ORACLES_PENDING dict;
# round 9 merged them into ORACLES above. This tuple names the
# promoted cohort so the parity/mutation suites keep targeting it.
PROMOTED_R09 = (
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_bloom_decontaminate",
    "dedup_winnow_fingerprint",
)
