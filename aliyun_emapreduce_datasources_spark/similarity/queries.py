"""Aggregated (QUERIES, ORACLES) for the similarity package."""

from __future__ import annotations

from aliyun_emapreduce_datasources_spark.similarity import (
    assign,
    bitext,
    covariance,
    dimstats,
    evalmetrics,
    properties,
    bruteforce,
    centroid,
    ivf,
    kmeans,
    label_noise,
    lsh,
    pq,
    quantize,
    triplets,
)

QUERIES = {
    "ann_bruteforce_topk": bruteforce.QUERY,
    "ann_lsh_topk": lsh.QUERY,
    "ann_ivf_topk": ivf.QUERY,
    "ann_int8_topk": quantize.QUERY,
    "ann_pq_topk": pq.QUERY,
    "emb_label_centroid": centroid.QUERY,
    "emb_assign_prototype": assign.QUERY,
    "emb_contrastive_triplets": triplets.QUERY,
    "emb_dim_profile": dimstats.QUERY,
    **assign.QUERIES,
    **bitext.QUERIES,
    **covariance.QUERIES,
    **dimstats.QUERIES,
    **evalmetrics.QUERIES,
    **kmeans.QUERIES,
    **label_noise.QUERIES,
    **properties.QUERIES,
}

# The LSH/IVF/int8 variants are approximate by design → rows-only
# check; recall vs the brute-force baseline is asserted in
# tests/test_similarity.py.
ORACLES = {
    "ann_bruteforce_topk": bruteforce.ORACLE,
    "emb_label_centroid": centroid.ORACLE,
    "emb_assign_prototype": assign.ORACLE,
    "emb_contrastive_triplets": triplets.ORACLE,
    "emb_dim_profile": dimstats.ORACLE,
    **assign.ORACLES,
    **bitext.ORACLES,
    **covariance.ORACLES,
    **dimstats.ORACLES,
    **evalmetrics.ORACLES,
    **kmeans.ORACLES,
    **label_noise.ORACLES,
    **properties.ORACLES,
}
