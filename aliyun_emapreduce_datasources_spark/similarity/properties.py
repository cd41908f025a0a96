"""Driver-visible rank-consistency oracle for the approximate ANN family.

The four approximate ANN entries (LSH / IVF / int8 / PQ) are rows-only
in the catalog — their candidate sets depend on engine-side hashing or
seeded quantizers DuckDB cannot reproduce. What IS deterministic is
the final ranking contract every variant shares: the returned top-k of
each query is ordered by EXACT cosine (desc, neighbor_id asc tie) —
LSH/IVF score their candidates exactly, int8/PQ re-rank their
shortlist exactly. This companion recomputes each returned pair's
cosine through the JVM expression path (``functions/vector.cosine``,
independent of the variants' numpy/einsum scoring) and emits every
adjacent-rank inversion beyond 1e-9 fold-order slack (near-ties are
never flagged — the variant's own arithmetic may order them either
way). The oracle pins the result to the empty set: a scoring bug or a
quantizer regression that leaks unranked rows shows up as a
non-empty, hash-mismatching Spark result.

Precision-style companion to the recall tests in
tests/test_similarity.py (which need the brute-force baseline and so
stay pytest-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.vector import cosine
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["ann_rank_consistency_violations", "QUERIES", "ORACLES"]


def ann_rank_consistency_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(variant, query_id, rnk) for every adjacent-rank pair whose
    JVM-cosine order contradicts the emitted rank order — empty."""
    from aliyun_emapreduce_datasources_spark.similarity import ivf, lsh, pq, quantize

    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    variants = {
        "lsh": lsh.QUERY,
        "ivf": ivf.QUERY,
        "int8": quantize.QUERY,
        "pq": pq.QUERY,
    }
    out = None
    for name, q in variants.items():
        topk = q(spark, sf_dir)  # (query_id, neighbor_id, rnk)
        scored = (
            topk.join(
                emb.withColumnsRenamed(
                    {"vec_id": "neighbor_id", "embedding": "ne"}
                ),
                "neighbor_id",
            )
            .join(
                emb.withColumnsRenamed({"vec_id": "query_id", "embedding": "qe"}),
                "query_id",
            )
            .select(
                "query_id", "neighbor_id", "rnk", cosine("qe", "ne").alias("sim")
            )
        )
        w = Window.partitionBy("query_id").orderBy("rnk")
        viol = (
            scored.withColumn("next_sim", F.lead("sim").over(w))
            # only genuine inversions: a pair within 1e-9 of each other
            # may have been ordered by the variant's own (equally
            # valid) arithmetic, so near-ties are never flagged
            .where(
                F.col("next_sim").isNotNull()
                & (F.col("next_sim") > F.col("sim") + F.lit(1e-9))
            )
            .select(F.lit(name).alias("variant"), "query_id", "rnk")
        )
        out = viol if out is None else out.unionByName(viol)
    return out.orderBy("variant", "query_id", "rnk")


QUERIES = {"ann_rank_consistency_check": ann_rank_consistency_violations}

ORACLES = {
    "ann_rank_consistency_check": (
        "SELECT CAST(NULL AS VARCHAR) AS variant, CAST(NULL AS BIGINT) AS query_id,"
        " CAST(NULL AS BIGINT) AS rnk WHERE FALSE"
    )
}
