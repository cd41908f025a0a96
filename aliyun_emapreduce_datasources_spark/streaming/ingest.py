"""Incremental curation ingest: the streaming twin of the batch
curation pipeline (operators/pipeline.curate_end_to_end) — documents
arrive in micro-batches, each batch is normalized, quality-gated, and
exact-deduplicated against EVERYTHING already accepted, and only the
novel survivors land in the curated store.

The dedup-against-history is the part batch ops don't give you: a
`foreachBatch` anti-join of the incoming batch's md5(text) digests
against the accepted-digest table, followed by an in-batch keep-first
(first doc_id wins — same deterministic rule as the batch pipeline).
The accepted store is two parquet dirs (docs + digests) written
append-only; replayed batches are skipped by batchId (idempotent —
S8's TableStoreSink.addBatch contract), so crash/retry cannot
duplicate documents.

Scale shape: per batch, one scan of the batch (small), one anti-join
whose build side is the digest table — digests are 32-hex per
accepted doc, so even a 10-billion-doc history is a joinable (and at
moderate history sizes broadcastable) ~0.5 TB digest table sharded by
digest prefix; Spark plans a shuffled hash join once it outgrows
broadcast. History never holds document TEXT, only digests + ids.
At real deployment the digest store would be a Delta/Iceberg table
with OPTIMIZE compaction (operators/storage.compact is the pass).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import normalize_ws

__all__ = ["CurationIngest", "EmbeddingIngest"]


class CurationIngest:
    """foreachBatch callback maintaining a curated document store.

    out_dir/
      docs/     accepted documents (doc_id, norm_text, n_tokens, batch_id)
      digests/  md5 digests of every accepted norm_text
    """

    def __init__(self, out_dir: str, min_tokens: int = 5, max_tokens: int = 100_000):
        self.out_dir = out_dir
        self.docs_dir = os.path.join(out_dir, "docs")
        self.digest_dir = os.path.join(out_dir, "digests")
        self.min_tokens = min_tokens
        self.max_tokens = max_tokens
        self.seen_batches: set[int] = set()

    def _existing_digests(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.parquet(self.digest_dir)
        except Exception:
            return None  # first batch: no history yet

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.seen_batches:
            return  # replayed batch (idempotent-by-batchId, S8 contract)
        spark = batch_df.sparkSession
        norm = normalize_ws("text")
        n_tok = F.size(F.split(norm, " "))
        candidates = (
            batch_df.select(
                "doc_id",
                norm.alias("norm_text"),
                n_tok.alias("n_tokens"),
            )
            .where(
                (F.col("n_tokens") >= self.min_tokens)
                & (F.col("n_tokens") <= self.max_tokens)
            )
            .withColumn("digest", F.md5("norm_text"))
        )
        # in-batch keep-first: minimum doc_id per digest
        from pyspark.sql import Window

        w = Window.partitionBy("digest").orderBy("doc_id")
        firsts = (
            candidates.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .drop("rn")
        )
        history = self._existing_digests(spark)
        if history is not None:
            firsts = firsts.join(
                history.select("digest"), "digest", "left_anti"
            )
        accepted = firsts.withColumn("batch_id", F.lit(batch_id))
        # digests first: if we crash between the two writes, the replay
        # (same batch re-delivered after restart, seen_batches lost)
        # anti-joins against the digests and re-writes nothing twice —
        # docs/ may lose the batch's rows on that crash path, which the
        # doc-vs-digest reconciliation check below surfaces
        accepted.select("digest", "doc_id").write.mode("append").parquet(
            self.digest_dir
        )
        accepted.write.mode("append").parquet(self.docs_dir)
        self.seen_batches.add(batch_id)

    def curated(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.docs_dir)

    def reconcile(self, spark: SparkSession) -> int:
        """Digest rows without a doc row (crash between writes) —
        0 on a healthy store."""
        digests = spark.read.parquet(self.digest_dir).select("digest")
        docs = spark.read.parquet(self.docs_dir).select("digest")
        return digests.join(docs, "digest", "left_anti").count()


class EmbeddingIngest:
    """Streaming semantic dedup-on-ingest: the embedding analog of
    :class:`CurationIngest`. Each micro-batch of (vec_id, embedding)
    is LSH-bucketed (similarity/lsh.py hyperplane signature), compared
    by exact cosine ONLY against accepted history sharing a bucket
    (plus earlier same-bucket rows of its own batch), and the
    survivors append to the history store.

    Scale shape per batch: the candidate join is bucket-equality — the
    batch side is micro-batch-sized and the history side is pruned by
    the signature join key, so comparisons stay O(batch × per-bucket
    history), never O(batch × history). Cosine runs as the zip_with/
    aggregate expression (codegen, no Python). History holds
    (vec_id, sig, embedding); at 10⁹ vectors you'd partition the
    store by sig prefix so the join prunes files too (the same
    derivable-key layout as operators/search.py).

    Same LSH caveat as the batch operator: near-dups straddling a
    bucket boundary can slip through (recall < 1); raise n_tables/
    multiprobe for tighter recall.
    """

    def __init__(self, out_dir: str, tau: float = 0.95):
        self.store = os.path.join(out_dir, "accepted")
        self.tau = tau
        self.seen_batches: set[int] = set()

    def _history(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.parquet(self.store)
        except Exception:
            return None

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.seen_batches:
            return
        from aliyun_emapreduce_datasources_spark.functions.vector import cosine
        from aliyun_emapreduce_datasources_spark.similarity.lsh import (
            hyperplane_signature,
        )

        spark = batch_df.sparkSession
        batch = batch_df.select(
            "vec_id", "embedding", hyperplane_signature("embedding").alias("sig")
        ).localCheckpoint(eager=True)  # stable ids across the two uses

        history = self._history(spark)
        near_history = None
        if history is not None:
            near_history = (
                batch.alias("b")
                .join(history.alias("h"), F.col("b.sig") == F.col("h.sig"))
                .where(cosine("b.embedding", "h.embedding") >= self.tau)
                .select(F.col("b.vec_id").alias("vec_id"))
                .distinct()
            )
        # within-batch: earlier (lower vec_id) same-bucket near-dup wins
        near_self = (
            batch.alias("a")
            .join(
                batch.alias("c"),
                (F.col("a.sig") == F.col("c.sig"))
                & (F.col("c.vec_id") < F.col("a.vec_id")),
            )
            .where(cosine("a.embedding", "c.embedding") >= self.tau)
            .select(F.col("a.vec_id").alias("vec_id"))
            .distinct()
        )
        rejected = near_self if near_history is None else near_self.unionByName(near_history).distinct()
        accepted = batch.join(rejected, "vec_id", "left_anti").withColumn(
            "batch_id", F.lit(batch_id)
        )
        accepted.write.mode("append").parquet(self.store)
        self.seen_batches.add(batch_id)

    def accepted(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.store)
