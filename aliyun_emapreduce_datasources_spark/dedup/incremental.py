"""Incremental (cross-snapshot) dedup: an incoming batch against the
standing corpus.

The production shape of near-dup dedup is rarely corpus×corpus — it's
"yesterday's crawl against everything already accepted". The incoming
batch is orders of magnitude smaller than the base corpus, which
flips the join geometry: the NEW side's shingle postings broadcast,
and the base corpus is scanned once without ever shuffling on shingle
keys. Reference analog: the same asymmetry as a stream-static join
(SURVEY.md §2.2 stream–static star joins), applied to dedup.

Semantics: for every incoming document, the best-matching base
document by exact shingle Jaccard, flagged when Jaccard ≥ 0.5.
Jaccard is compared in integer micro-units (``(1e6·shared) div
union``) so the argmax (ties → lowest base doc_id) is bit-stable
across engines.

Scale shape: new-side postings are |batch|-bounded (broadcast); the
base scan emits only postings whose hash hits the broadcast side —
the filter happens inside the broadcast hash join, so the shuffle
after it carries candidate (new, base) pairs only, never corpus
postings. One aggregation shuffle on the pair key, one window over
per-new-doc candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.dedup.decontaminate import _O_SH
from aliyun_emapreduce_datasources_spark.functions.text import shingles, tokens
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["incremental_dedup", "QUERY", "ORACLE"]

NEW_SOURCE = "src19"  # the "incoming batch" slice of the testdata
MIN_JACC_MICRO = 500_000


def _postings(docs: DataFrame, id_alias: str, n_alias: str) -> DataFrame:
    """Distinct-shingle-hash postings with the per-doc set size."""
    # the non-empty guard tests token count, not size(sh): a filter on
    # the sh alias gets predicate-pushed below the projection and
    # re-evaluates the whole shingle chain a second time per row
    with_sh = docs.where(F.size(tokens("text")) > 2).withColumn(
        "sh", F.array_distinct(shingles(tokens("text")))
    )
    return with_sh.select(
        F.col("doc_id").alias(id_alias),
        F.size("sh").alias(n_alias),
        F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("s"),
    )


def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    new = _postings(
        docs.where(F.col("source") == NEW_SOURCE), "new_id", "n_new"
    )
    base = _postings(
        docs.where(F.col("source") != NEW_SOURCE), "base_id", "n_base"
    )
    shared = (
        base.join(F.broadcast(new), "s")
        .groupBy("new_id", "base_id", "n_new", "n_base")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jacc = F.expr("(1000000 * shared) div (n_new + n_base - shared)")
    ranked = shared.select(
        "new_id", "base_id", jacc.alias("jacc_micro")
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("new_id").orderBy(
                F.col("jacc_micro").desc(), "base_id"
            )
        ),
    )
    return (
        ranked.where((F.col("rn") == 1) & (F.col("jacc_micro") >= MIN_JACC_MICRO))
        .select(
            F.col("new_id").alias("doc_id"),
            F.col("base_id").alias("match_id"),
            "jacc_micro",
        )
        .orderBy("doc_id")
    )


QUERY = incremental_dedup


ORACLE = f"""
WITH sh AS (
  SELECT doc_id, source, {_O_SH} AS shl FROM documents
), new_p AS (
  SELECT doc_id AS new_id, len(shl) AS n_new, unnest(shl) AS s
  FROM sh WHERE source = '{NEW_SOURCE}' AND len(shl) > 0
), base_p AS (
  SELECT doc_id AS base_id, len(shl) AS n_base, unnest(shl) AS s
  FROM sh WHERE source <> '{NEW_SOURCE}' AND len(shl) > 0
), shared AS (
  SELECT new_id, base_id, n_new, n_base, COUNT(*) AS shared
  FROM base_p JOIN new_p USING (s)
  GROUP BY 1, 2, 3, 4
), ranked AS (
  SELECT new_id, base_id,
         (1000000 * shared) // (n_new + n_base - shared) AS jacc_micro,
         row_number() OVER (
           PARTITION BY new_id
           ORDER BY (1000000 * shared) // (n_new + n_base - shared) DESC,
                    base_id
         ) AS rn
  FROM shared
)
SELECT new_id AS doc_id, base_id AS match_id,
       CAST(jacc_micro AS BIGINT) AS jacc_micro
FROM ranked
WHERE rn = 1 AND jacc_micro >= {MIN_JACC_MICRO}
ORDER BY doc_id
"""
