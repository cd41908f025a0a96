"""Duplicated-span flagging (relational ExactSubstr analog).

Lee et al., "Deduplicating Training Data Makes Language Models
Better" (2022) removes verbatim repeated substrings with a suffix
array. The suffix-array build is inherently sequential over a global
byte concatenation — the wrong shape for a 1000-executor cluster — so
this operator expresses the same *signal* relationally: a k-token
shingle whose hash occurs in ≥2 distinct documents is a duplicated
span, and each document is flagged with how many of its distinct
shingles are duplicated elsewhere. Downstream either drops flagged
docs (threshold on the ratio) or scrubs the spans.

Scale shape: distinct per-doc shingle postings (explode, no shuffle)
→ groupBy(hash) count with map-side partials — the one wide shuffle,
O(distinct shingles) — → filter n_docs ≥ 2 → join back to the
postings ON the hash. Both join children are partitioned by the hash
(the aggregate's output retains it; the postings side shuffles once),
so the join is co-partitioned; the final per-doc count shuffles only
the flagged subset. No step is quadratic in documents and nothing
lands on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.dedup.decontaminate import _O_SH
from aliyun_emapreduce_datasources_spark.functions.text import shingles, tokens
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["dup_spans", "QUERY", "ORACLE"]


def dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document count of distinct 3-shingles that also occur in at
    least one other document. Clean documents emit no row."""
    docs = t(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.array_distinct(shingles(tokens("text"))),
                lambda s: F.xxhash64(s),
            )
        ).alias("s"),
    )
    dup = (
        postings.groupBy("s")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("s")
    )
    return (
        postings.join(dup, "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_shingles"))
    )


QUERY = dup_spans

ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest({_O_SH}) AS s FROM documents
), dup AS (
  SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 2
)
SELECT sh.doc_id, COUNT(*) AS n_dup_shingles
FROM sh JOIN dup USING (s)
GROUP BY sh.doc_id
"""
