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


PREFIX_TOKENS = 16


def exact_prefix_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-duplicate detection: documents sharing their first
    ``PREFIX_TOKENS`` tokens verbatim — the truncation/boilerplate-head
    duplicate class whole-document digests miss (a wire story cut at
    different lengths, a template page with differing tails dedups
    here, not in exact_dedup). Reported as duplicate GROUPS: prefix
    digest, keeper (min doc_id), group size, and the min/max full doc
    length — a length spread inside one group is the truncation
    signature.

    Scale shape: the prefix digest is computed map-side (slice of the
    token array → md5, JVM codegen — the full text never shuffles),
    one hash aggregate with map-side partials onto prefix-group rows,
    and the ≥ 2 filter prunes to actual duplicate groups. Same one-
    shuffle cost class as exact_dedup."""
    from aliyun_emapreduce_datasources_spark.functions.text import tokens

    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    prefix = F.concat_ws(" ", F.slice(tokens("text"), 1, PREFIX_TOKENS))
    return (
        docs.select(F.md5(prefix).alias("prefix_digest"), "doc_id", "n_chars")
        .groupBy("prefix_digest")
        .agg(
            F.min("doc_id").alias("keeper_id"),
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .where(F.col("group_size") >= 2)
        .orderBy("prefix_digest")
    )


ORACLE_PREFIX = f"""
SELECT md5(array_to_string(string_split(text, ' ')[1:{PREFIX_TOKENS}], ' ')) AS prefix_digest,
       MIN(doc_id) AS keeper_id,
       CAST(COUNT(*) AS BIGINT) AS group_size,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
WHERE text IS NOT NULL
GROUP BY 1
HAVING COUNT(*) >= 2
ORDER BY prefix_digest
"""
