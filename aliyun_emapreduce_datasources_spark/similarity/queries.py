"""Aggregated (QUERIES, ORACLES) for the similarity package."""

from __future__ import annotations

from aliyun_emapreduce_datasources_spark.similarity import bruteforce, ivf, lsh

QUERIES = {
    "ann_bruteforce_topk": bruteforce.QUERY,
    "ann_lsh_topk": lsh.QUERY,
    "ann_ivf_topk": ivf.QUERY,
}

# The LSH/IVF variants are approximate by design → rows-only check;
# recall vs the brute-force baseline is asserted in
# tests/test_similarity.py.
ORACLES = {
    "ann_bruteforce_topk": bruteforce.ORACLE,
}
