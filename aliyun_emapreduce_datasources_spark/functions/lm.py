"""Data-selection scoring: DSIR-style hashed-n-gram importance
weights and a bigram-LM surprise score (the KenLM-perplexity-filter
shape) — the two standard "which documents do I keep for training"
signals that operate on corpus statistics rather than per-doc
heuristics.

- DSIR (Xie et al., 2023, arXiv:2302.03169): importance weight of a
  document under a *target* distribution vs the *raw* distribution,
  estimated over hashed n-gram buckets. Here target = the corpus'
  English slice, features = word bigrams hashed into NB buckets with
  the engine's portable md5 coin (operators/pipeline.py convention).
- Bigram surprise: per-occurrence inverse conditional probability
  under an add-one-smoothed bigram LM trained on the corpus itself;
  high total surprise ≈ high perplexity ≈ OCR noise / gibberish.

Cross-engine exactness: both scores are kept in *integer-scaled
rational* form — bucket weight and per-bigram surprise are
``(1e6 · num) div den`` BIGINT floor divisions, and per-doc scores are
BIGINT sums of those — so accumulation order cannot perturb a single
bit and the DuckDB differential hashes exactly. (A production pipeline
would sum float log-ratios; the ranking semantics are the same, the
integer form is what makes the oracle byte-exact. See
operators/common.py for the convention.)

Scale shape (100 TB): per-doc bucket counts reduce map-side before the
shuffle; the bucket-weight table is NB rows (bytes — broadcast); the
bigram LM tables are vocabulary-bounded aggregates (heavy-tailed but
∝ vocab², not corpus rows) joined back to map-side-reduced per-doc
postings — broadcast-eligible, AQE decides. One doc_id shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import _O_BG, shingles, tokens
from aliyun_emapreduce_datasources_spark.operators.common import md5_bucket, t

__all__ = ["dsir_importance", "lm_bigram_surprise", "QUERIES", "ORACLES"]

N_BUCKETS = 256
SCALE = 1_000_000
TARGET_LANG = "en"


def _bucket(col: F.Column) -> F.Column:
    """Portable md5 coin: first 32 bits of md5(s) mod N_BUCKETS."""
    return md5_bucket(col, N_BUCKETS)


def _doc_bigram_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket, c): per-doc hashed-bigram occurrence
    counts — the map-side-reduced posting list."""
    return (
        docs.select(
            "doc_id", "lang", F.explode(shingles(tokens("text"), 2)).alias("b")
        )
        .select("doc_id", "lang", _bucket(F.col("b")).alias("bucket"))
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance: sum over the doc's hashed-bigram
    occurrences of the integer-scaled target/raw bucket ratio
    ``(1e6·(target_b+1)) div (raw_b+1)``. Docs with zero bigrams are
    out of the feature space and not emitted (both engines agree)."""
    docs = t(spark, sf_dir, "documents")
    per = _doc_bigram_buckets(docs)
    stats = per.groupBy("bucket").agg(
        F.sum("c").alias("raw_c"),
        F.sum(F.when(F.col("lang") == TARGET_LANG, F.col("c")).otherwise(F.lit(0))).alias(
            "target_c"
        ),
    )
    weighted = per.join(F.broadcast(stats), "bucket").withColumn(
        "w",
        F.expr(f"({SCALE} * (target_c + 1)) div (raw_c + 1)"),
    )
    return (
        weighted.groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("c") * F.col("w")).cast("long").alias("importance"),
            F.sum("c").cast("long").alias("n_feat"),
        )
        .withColumn(
            "avg_importance",
            F.col("importance").cast("double") / F.col("n_feat").cast("double"),
        )
        .orderBy("doc_id")
    )


ORACLE_DSIR = f"""
WITH per AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(b), 1, 8)) AS BIGINT) % {N_BUCKETS} AS bucket,
         COUNT(*) AS c
  FROM (SELECT doc_id, lang, unnest({_O_BG}) AS b FROM documents)
  GROUP BY 1, 2, 3
), stats AS (
  SELECT bucket, SUM(c) AS raw_c,
         SUM(CASE WHEN lang = '{TARGET_LANG}' THEN c ELSE 0 END) AS target_c
  FROM per GROUP BY 1
)
SELECT doc_id, lang,
       CAST(SUM(c * (({SCALE} * (target_c + 1)) // (raw_c + 1))) AS BIGINT) AS importance,
       CAST(SUM(c) AS BIGINT) AS n_feat,
       CAST(SUM(c * (({SCALE} * (target_c + 1)) // (raw_c + 1))) AS DOUBLE)
         / CAST(SUM(c) AS DOUBLE) AS avg_importance
FROM per JOIN stats USING (bucket)
GROUP BY 1, 2
ORDER BY doc_id
"""


def lm_bigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document total/mean surprise under an add-one-smoothed
    corpus bigram LM: per occurrence of bigram (w1 w2),
    ``(1e6·(C(w1)+V)) div (C(w1 w2)+1)`` — the integer-scaled inverse
    conditional probability; V = corpus unigram vocabulary size."""
    docs = t(spark, sf_dir, "documents")
    tok = tokens("text")
    # per-doc bigram occurrence counts, with the context word split out
    per = (
        docs.select("doc_id", F.explode(shingles(tok, 2)).alias("bg"))
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .groupBy("doc_id", "bg", "w1")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bigram_lm = per.groupBy("bg").agg(F.sum("c").alias("bg_c"))
    # context count = occurrences of w1 as the *first* token of a
    # bigram (i.e. unigram count excluding each doc's last token)
    ctx_lm = per.groupBy("w1").agg(F.sum("c").alias("ctx_c"))
    vocab = (
        docs.select(F.explode(tok).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    scored = (
        per.join(bigram_lm, "bg")
        .join(ctx_lm, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("s", F.expr(f"({SCALE} * (ctx_c + v)) div (bg_c + 1)"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.col("s")).cast("long").alias("surprise"),
            F.sum("c").cast("long").alias("n_bigrams"),
        )
        .withColumn(
            "avg_surprise",
            F.col("surprise").cast("double") / F.col("n_bigrams").cast("double"),
        )
        .orderBy("doc_id")
    )


ORACLE_SURPRISE = f"""
WITH per AS (
  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1, COUNT(*) AS c
  FROM (SELECT doc_id, unnest({_O_BG}) AS bg FROM documents)
  GROUP BY 1, 2, 3
), bigram_lm AS (
  SELECT bg, SUM(c) AS bg_c FROM per GROUP BY 1
), ctx_lm AS (
  SELECT w1, SUM(c) AS ctx_c FROM per GROUP BY 1
), vocab AS (
  SELECT COUNT(DISTINCT w) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
)
SELECT doc_id,
       CAST(SUM(c * (({SCALE} * (ctx_c + v)) // (bg_c + 1))) AS BIGINT) AS surprise,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       CAST(SUM(c * (({SCALE} * (ctx_c + v)) // (bg_c + 1))) AS DOUBLE)
         / CAST(SUM(c) AS DOUBLE) AS avg_surprise
FROM per
JOIN bigram_lm USING (bg)
JOIN ctx_lm USING (w1)
CROSS JOIN vocab
GROUP BY doc_id
ORDER BY doc_id
"""

QUERIES = {
    "dsir_importance": dsir_importance,
    "lm_bigram_surprise": lm_bigram_surprise,
}
ORACLES = {
    "dsir_importance": ORACLE_DSIR,
    "lm_bigram_surprise": ORACLE_SURPRISE,
}
