"""Embedding-cosine near-duplicate detection.

Exact all-pairs variant (oracle-checked here): self-join on vec_id
ordering, cosine in codegen, threshold filter. O(n²) pairs — correct
and fine up to ~10⁵ vectors per blocking group.

Scale path at 10⁹+ vectors: block first with the random-hyperplane
signatures from similarity/lsh.py (pairs only form within a bucket),
then the same exact cosine verify — identical output columns, recall
measured in tests/test_dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.vector import cosine
from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.similarity.lsh import hyperplane_signature

__all__ = ["embedding_neardup_pairs", "embedding_neardup_lsh", "QUERY", "ORACLE"]

COS_THRESHOLD = 0.4


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = emb.alias("a")
    b = emb.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine("a.embedding", "b.embedding").alias("sim"),
        )
        .where(F.col("sim") >= COS_THRESHOLD)
    )


def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-blocked variant: same columns, bucket-bounded pair join."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    sig = emb.withColumn("sig", hyperplane_signature("embedding"))
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cosine("a.embedding", "b.embedding").alias("sim"),
        )
        .where(F.col("sim") >= COS_THRESHOLD)
    )


QUERY = embedding_neardup_pairs

ORACLE = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
            * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
         / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
            * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= {COS_THRESHOLD}
"""
