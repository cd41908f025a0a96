"""Per-source distinctive-term extraction (corpus keyness).

A pretraining-data curator asks of every source: *which tokens are
over-represented here relative to the rest of the corpus?* — the
standard corpus-linguistics "keyness" question, used to spot template
boilerplate, SEO spam vocabularies, and domain outliers before they
reach the training mix. Scored with smoothed relative-rate lift

    lift = (cnt_src / total_src) / ((cnt_rest + 1) / (total_rest + 1))

(+1 smoothing keeps source-exclusive tokens finite). Ranking by lift
is monotone-equivalent to log-odds keyness for the same smoothing, and
the rational form stays inside exact IEEE multiply/divide — integer
counts below 2⁵³ make the score bit-identical across Spark and the
DuckDB oracle, where a log/chi² form could differ in the last ulp
(same determinism argument as functions/vocab.py's N/df idf).

Scale shape (100 TB):

- ONE corpus-sized shuffle: the (source, token) count aggregate, with
  map-side partials (shuffle volume = distinct pairs per partition,
  not token occurrences).
- Everything after runs on the vocabulary×sources aggregate (orders of
  magnitude smaller than the corpus): per-source totals and per-token
  corpus totals are two window sums over that table (the fold-totals-
  into-count-tables trick from functions/lm.py — no extra joins), the
  corpus grand total is a 1-row scalar broadcast crossJoin, and the
  final per-source top-k is a rank window that compiles to
  WindowGroupLimit (per-partition heaps, never a global sort).
- MIN_CNT prunes the hapax tail *before* the rank window, bounding
  the window input.

Reference parity: the reference has no text analytics; this extends
the training-data-pipeline surface (SURVEY.md §7.8) alongside
text_tfidf_topk (per-document) with the per-source twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import tokens
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["text_keyness_lift", "QUERIES", "ORACLES"]

KEYNESS_K = 10
MIN_CNT = 5  # ignore tokens seen < 5× in a source (hapax noise)


def text_keyness_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-`KEYNESS_K` tokens per source by smoothed relative-rate
    lift vs the rest of the corpus; deterministic tie-break on token
    text."""
    docs = t(spark, sf_dir, "documents")
    stc = (
        docs.select("source", F.explode(tokens("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    grand = stc.agg(F.sum("cnt").alias("total_all"))
    w_src = Window.partitionBy("source")
    w_tok = Window.partitionBy("token")
    scored = (
        stc.withColumn("total_src", F.sum("cnt").over(w_src))
        .withColumn("cnt_rest", F.sum("cnt").over(w_tok) - F.col("cnt"))
        .where(F.col("cnt") >= MIN_CNT)
        .crossJoin(F.broadcast(grand))
        .withColumn(
            "lift",
            (F.col("cnt").cast("double") * (F.col("total_all") - F.col("total_src") + F.lit(1)))
            / (F.col("total_src").cast("double") * (F.col("cnt_rest") + F.lit(1))),
        )
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.col("lift").desc(), F.col("token")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w_rank))
        .where(F.col("rnk") <= KEYNESS_K)
        .select(
            "source",
            "token",
            F.col("cnt").cast("long").alias("cnt"),
            "lift",
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


ORACLE_KEYNESS = f"""
WITH stc AS (
  SELECT source, token, COUNT(*) AS cnt
  FROM (SELECT source, unnest(string_split(text, ' ')) AS token FROM documents)
  GROUP BY source, token
), grand AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total_all FROM stc
), scored AS (
  SELECT source, token, cnt,
         CAST(cnt AS DOUBLE) * (grand.total_all - total_src + 1)
           / (CAST(total_src AS DOUBLE) * (cnt_rest + 1)) AS lift
  FROM (
    SELECT source, token, cnt,
           CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS total_src,
           CAST(SUM(cnt) OVER (PARTITION BY token) - cnt AS BIGINT) AS cnt_rest
    FROM stc
  )
  CROSS JOIN grand
  WHERE cnt >= {MIN_CNT}
)
SELECT source, token, CAST(cnt AS BIGINT) AS cnt, lift, CAST(rnk AS INTEGER) AS rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY lift DESC, token) AS rnk
  FROM scored
)
WHERE rnk <= {KEYNESS_K}
"""


QUERIES = {"text_keyness_lift": text_keyness_lift}
ORACLES = {"text_keyness_lift": ORACLE_KEYNESS}
