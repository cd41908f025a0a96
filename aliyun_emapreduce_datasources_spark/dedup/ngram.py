"""Blocked n-gram (shingle) Jaccard near-duplicate detection.

Exact Jaccard is O(n²); the scalable form blocks candidate pairs by a
cheap key first. Here the block key is (source, length bucket): real
pipelines use URL host / crawl shard the same way. Within a block the
pairwise join is tractable; across blocks no comparison happens, which
is the accepted recall trade-off (MinHash-LSH in dedup/minhash.py is
the unblocked scale path).

Jaccard itself is |A∩B| / |A∪B| over distinct 3-token shingles —
integer set sizes, so the double division is bit-identical across
engines and the query is DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import shingles, tokens
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["ngram_jaccard_pairs", "QUERY", "ORACLE"]

JACCARD_THRESHOLD = 0.5


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (doc_a < doc_b) with shingle-Jaccard >= 0.5,
    blocked by (source, n_chars // 64)."""
    docs = t(spark, sf_dir, "documents")
    # spread shingle construction across cores (single-file input) and
    # cache: the self-join consumes the shingle arrays on both sides
    n_parts = spark.sparkContext.defaultParallelism
    base = docs.repartition(n_parts).select(
        "doc_id",
        "source",
        (F.col("n_chars") / 64).cast("long").alias("len_bucket"),
        F.array_distinct(shingles(tokens("text"))).alias("sh"),
    ).persist()
    a = base.alias("a")
    b = base.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_distinct(F.concat(F.col("a.sh"), F.col("b.sh"))))
    jac = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


QUERY = ngram_jaccard_pairs

_O_SH = (
    "list_distinct(list_transform(generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)), "
    "i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2]))"
)

ORACLE = f"""
WITH base AS (
  SELECT doc_id, source, CAST(floor(n_chars / 64) AS BIGINT) AS len_bucket,
         {_O_SH} AS sh
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) AS jaccard
FROM base a JOIN base b
  ON a.source = b.source AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(a.sh || b.sh)) >= 0.5
"""
