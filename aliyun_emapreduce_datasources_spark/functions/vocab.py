"""Corpus vocabulary operators for training-data pipelines.

Two classic pretraining-prep passes over the ``documents`` table:

- **Heavy-hitter vocabulary** (``vocab_topk``): global top-k tokens by
  frequency — the first step of building a tokenizer vocabulary or a
  stopword list from the corpus itself.
- **TF-IDF top terms** (``tfidf_topk``): the k most distinctive terms
  per document — keyword extraction / topic labeling at corpus scale.

Both are pure built-in-function plans (explode + hash aggregate), no
Python in the hot path, so they run at scan speed on a 100 TB corpus:

- ``vocab_topk``: partial (map-side) aggregation combines counts per
  partition before the shuffle, so shuffle volume is O(distinct tokens
  per partition), not O(total tokens); the final top-k compiles to
  TakeOrderedAndProject (per-partition heaps + driver merge of k rows
  per partition, never a global sort).
- ``tfidf_topk``: one shuffle for the (doc, token) term-frequency
  aggregate; document frequencies are an aggregate over that same
  relation (vocabulary-sized, broadcast back to the tf side); the
  per-document top-k is a window rank partitioned by doc_id.

The idf factor uses the *rational* form N/df instead of ln(N/df):
ranking within a document is identical (ln is monotone), and the
score stays inside exact IEEE multiply/divide so the DuckDB oracle
matches bit-for-bit — transcendental functions may differ in the last
ulp across engines (Java Math.log vs libm).

Reference parity note: the reference has no text analytics; these are
part of the "training-data pipeline" extension surface (SURVEY.md §7.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import tokens
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["vocab_topk", "tfidf_topk", "QUERIES", "ORACLES"]

VOCAB_K = 100
TFIDF_K = 5


def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-`VOCAB_K` tokens by global frequency, ties broken by token
    text so the result is deterministic."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(VOCAB_K)
    )


ORACLE_VOCAB = f"""
SELECT token, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY cnt DESC, token
LIMIT {VOCAB_K}
"""


def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-`TFIDF_K` terms per document by tf·(N/df), deterministic
    tie-break on token text."""
    docs = t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # document frequency: tf already has one row per (doc, token)
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * F.col("n_docs").cast("double")
            / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TFIDF_K)
        .select("doc_id", "token", "tfidf", F.col("rnk").cast("int").alias("rnk"))
    )


ORACLE_TFIDF = f"""
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY doc_id, token
), dfreq AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.token,
         CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE) AS tfidf
  FROM tf JOIN dfreq USING (token) CROSS JOIN n
)
SELECT doc_id, token, tfidf, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
  FROM scored
)
WHERE rnk <= {TFIDF_K}
"""


QUERIES = {
    "text_vocab_topk": vocab_topk,
    "text_tfidf_topk": tfidf_topk,
}

ORACLES = {
    "text_vocab_topk": ORACLE_VOCAB,
    "text_tfidf_topk": ORACLE_TFIDF,
}
