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

Scale shape: ONE corpus scan, one wide shuffle. The naive
aggregate-then-join-back formulation re-reads and re-shingles the
entire corpus for the probe side (Catalyst prunes the two branches to
different column sets, so their exchanges never dedup into a
ReusedExchange) — at 100 TB that second scan dominates everything.
Instead the ≥2-docs test is a `count() OVER (PARTITION BY hash)`
window on the postings: same shuffle the join would need, no second
scan, and the per-doc count reduces only the flagged subset.
Per-key buffering in the window is bounded by docs-per-shingle and
spills to disk (ExternalAppendOnlyUnsafeRowArray) for pathological
boilerplate shingles; a corpus with extreme shingle skew would first
materialize the postings once (storage.compact) and run the join
shape against the materialized table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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
    w = Window.partitionBy("s")
    return (
        postings.withColumn("n_docs", F.count(F.lit(1)).over(w))
        .where(F.col("n_docs") >= 2)
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
