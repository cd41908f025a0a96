"""Materialized inverted index: postings written as a hash-bucketed,
partition-pruned parquet layout, plus the term-lookup read path that
touches 1/NB of the files.

A 100 TB corpus answers "which documents contain <term>" either by
re-scanning every document (the ad-hoc shape all the text operators
use) or by materializing the postings ONCE and paying a pruned read
per lookup. The layout that makes the second path work:

- posting rows (term, doc_id, tf, dl) partitioned by
  ``bucket = md5-coin(term) mod NB`` — a **derivable** partition key:
  the reader recomputes the bucket from the query term, so Catalyst's
  partition pruning drops NB−1 of NB directories without any index
  metadata service;
- ``sortWithinPartitions(term)`` inside each bucket so parquet
  row-group min/max stats prune within the touched files too;
- df/dl corpus statistics stored alongside (two tiny tables), which
  is everything BM25 needs — `bm25_lookup` scores a multi-term query
  from the index alone, never re-reading the corpus.

The bucket count NB trades pruning factor against file count: at
100 TB with NB=4096, one lookup reads ~0.02% of the postings bytes.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import tokens
from aliyun_emapreduce_datasources_spark.operators.common import md5_bucket

__all__ = ["build_inverted_index", "lookup_term", "bm25_lookup"]

N_BUCKETS = 16


def _bucket(col: F.Column, n_buckets: int = N_BUCKETS) -> F.Column:
    return md5_bucket(col, n_buckets).cast("int")


def build_inverted_index(docs: DataFrame, dst: str, n_buckets: int = N_BUCKETS) -> None:
    """docs: (doc_id, text). Writes postings/ (bucketed by term hash —
    honoring ``n_buckets``; readers must pass the same value) and
    stats/ (1-row corpus stats). Per-doc lengths ride on every
    postings row (``dl``), so no separate lengths table is needed."""
    tok = tokens("text")
    base = docs.select("doc_id", F.explode(tok).alias("term"), F.size(tok).alias("dl"))
    postings = (
        base.groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("bucket", _bucket(F.col("term"), n_buckets))
    )
    (
        postings.repartition("bucket")
        .sortWithinPartitions("term", "doc_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(dst, "postings"))
    )
    docs.select(
        F.count(F.lit(1)).alias("n_docs"), F.sum(F.size(tok)).alias("av")
    ).write.mode("overwrite").parquet(os.path.join(dst, "stats"))


def lookup_term(
    spark: SparkSession, index_dir: str, term: str, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """(doc_id, tf, dl) for one term — partition-pruned to the term's
    bucket (assert `PartitionFilters` in the plan), then row-group
    pruned by the term sort. ``n_buckets`` must match the build."""
    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    b = md5_bucket(F.lit(term), n_buckets)
    return postings.where(
        (F.col("bucket") == b.cast("int")) & (F.col("term") == term)
    ).select("doc_id", "tf", "dl")


def bm25_lookup(
    spark: SparkSession,
    index_dir: str,
    terms: list[str],
    top_n: int = 10,
    s: int = 1000,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """BM25 top-n from the materialized index alone (same integer-
    exact scoring as functions/bm25.py), reading only the query
    terms' buckets + the 1-row stats table."""
    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    buckets = sorted(
        {
            int.from_bytes(hashlib.md5(t.encode()).digest()[:4], "big") % n_buckets
            for t in terms
        }
    )
    hits = postings.where(
        F.col("bucket").isin(buckets) & F.col("term").isin(list(terms))
    )
    stats = spark.read.parquet(os.path.join(index_dir, "stats"))
    df_tbl = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_s", F.expr(f"({s} * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)")
        )
        .withColumn(
            "term_micro",
            F.expr(
                "(idf_s * 22 * tf * av) div (10 * tf * av + 3 * av + 9 * dl * n_docs)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("term_micro").cast("long").alias("score_micro"),
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        )
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(top_n)
    )
