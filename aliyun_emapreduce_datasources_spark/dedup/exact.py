"""Exact deduplication: hash-groupBy on a content digest.

Scale shape: digest is computed map-side (md5 — JVM codegen), the
single shuffle carries (digest, doc_id) pairs only, and the group-by
picks the minimum doc_id as the canonical keeper. At 100 TB this is
one shuffle of ~16 B + 8 B per row — no text moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["exact_dedup", "dedup_keep_first", "QUERY", "ORACLE"]


def dedup_keep_first(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Generic exact dedup: keep the lowest id per identical content."""
    digest = F.md5(F.col(content_col))
    keepers = (
        df.select(digest.alias("_digest"), F.col(id_col))
        .groupBy("_digest")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(keepers, on=id_col, how="left_semi")


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest-level dedup summary over documents: keeper id + group
    size + total duplicate count (the numbers a pipeline reports)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("digest"), "doc_id", "n_chars")
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
            F.max("n_chars").alias("n_chars"),
        )
    )


QUERY = exact_dedup

ORACLE = """
SELECT md5(text) AS digest, MIN(doc_id) AS keeper_id, COUNT(*) AS group_size,
       MAX(n_chars) AS n_chars
FROM documents GROUP BY 1
"""
