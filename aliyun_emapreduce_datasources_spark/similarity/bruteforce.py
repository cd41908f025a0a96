"""Exact cosine top-k: broadcast the (small) query set against the
(huge) corpus, window-rank per query.

Scale shape: the corpus side never shuffles for the join (queries are
broadcast); the only shuffle is the per-query top-k, which AQE keeps
tiny because the pre-aggregation filter (rank window partitioned by
query) works on |queries| × |corpus| rows reduced map-side. For very
large k×queries, swap the window for a per-partition heap via
mapInPandas — same API, not needed at this scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.vector import cosine
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["topk_cosine", "QUERY", "ORACLE"]

N_QUERIES = 8
K = 5


def topk_cosine(corpus: DataFrame, queries: DataFrame, k: int = K) -> DataFrame:
    """Top-k corpus neighbors per query vector (cosine), exact.

    corpus: (vec_id, embedding); queries: (query_id, q_embedding).
    Deterministic tie-break on neighbor id.
    """
    joined = corpus.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine("embedding", "q_embedding").alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.col("rnk").cast("long").alias("rnk"))
    )


def QUERY(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    return topk_cosine(emb.select("vec_id", "embedding"), queries)


# DuckDB oracle: same sequential-fold double arithmetic (cast to
# DOUBLE[] first so both engines accumulate float64).
ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < {N_QUERIES}
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(e.embedding::DOUBLE[], q.qe)
           / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
              * sqrt(list_dot_product(q.qe, q.qe))) AS sim
  FROM embeddings e, q WHERE e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
  FROM scored
) WHERE rnk <= {K}
"""
