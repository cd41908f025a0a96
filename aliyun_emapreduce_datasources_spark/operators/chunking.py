"""Document chunking for training pipelines: split each document into
overlapping fixed-size token windows (the context-window prep step
that feeds tokenize→pack — see operators/pipeline.pack_sequences for
the packing stage downstream).

Window W tokens, stride S (< W ⇒ overlap W−S): chunk k covers tokens
[1 + k·S, 1 + k·S + W − 1], and the number of chunks is
``ceil(max(n−W, 0)/S) + 1`` — the minimal set of windows that covers
every token with the final (possibly short) tail window included.
All arithmetic is integer and the chunk text is a deterministic
token-slice join, so the DuckDB differential is byte-exact.

Scale shape (100 TB): pure per-row expression tree — split, one
`sequence`+`transform` to materialize window starts, `posexplode`.
No shuffle at all (narrow plan), whole-stage-codegen end to end; the
output inherits the input partitioning, which is exactly what the
downstream per-shard packing step wants. Explosion factor is bounded
by ~n/S chunks per doc, a constant multiple of input tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import tokens
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["chunk_documents", "QUERIES", "ORACLES"]

WINDOW = 64
STRIDE = 48


def chunk_documents(
    spark: SparkSession, sf_dir: str, window: int = WINDOW, stride: int = STRIDE
) -> DataFrame:
    # NULL-text docs have no chunks on either engine: Spark's
    # size(NULL) = -1 would fabricate one empty chunk while DuckDB's
    # generate_series(0, NULL) yields none — filter up front instead
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    tok = tokens("text")
    n = F.size(tok)
    n_chunks = F.expr(
        f"(greatest(size(split(text, ' ')) - {window}, 0) + {stride} - 1) div {stride} + 1"
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks - 1), lambda k: k * stride + 1
    )
    exploded = docs.select(
        "doc_id",
        tok.alias("tok"),
        F.posexplode(starts).alias("chunk_idx", "start_token"),
    )
    piece = F.slice(F.col("tok"), F.col("start_token"), window)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_token").cast("long").alias("start_token"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    ).orderBy("doc_id", "chunk_idx")


# ONE chunk-expansion SQL fragment — ORACLE_CHUNK and the
# rag_index_build oracle both build on it, so the window math can
# never desynchronize between the two oracles.
_O_CHUNKS = f"""
  SELECT doc_id,
         CAST(k AS BIGINT) AS chunk_idx,
         CAST(k * {STRIDE} + 1 AS BIGINT) AS start_token,
         CAST(len(list_slice(tok, k * {STRIDE} + 1, k * {STRIDE} + {WINDOW})) AS BIGINT) AS n_tokens,
         array_to_string(list_slice(tok, k * {STRIDE} + 1, k * {STRIDE} + {WINDOW}), ' ') AS chunk_text
  FROM (
    SELECT doc_id, string_split(text, ' ') AS tok,
           (greatest(len(string_split(text, ' ')) - {WINDOW}, 0) + {STRIDE} - 1)
             // {STRIDE} + 1 AS n_chunks
    FROM documents WHERE text IS NOT NULL
  ), unnest(generate_series(0, n_chunks - 1)) AS u(k)
"""

ORACLE_CHUNK = f"""
WITH chunks AS ({_O_CHUNKS})
SELECT doc_id, chunk_idx, start_token, n_tokens, chunk_text
FROM chunks
ORDER BY doc_id, chunk_idx
"""

QUERIES = {"chunk_documents": chunk_documents}
ORACLES = {"chunk_documents": ORACLE_CHUNK}


# --- RAG index build (fused chunk -> shard -> manifest plan) ----------

N_INDEX_SHARDS = 32


def rag_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-index build as ONE fused declarative plan — the
    indexing half of a RAG pipeline: chunk every document into
    overlapping context windows (same window math as
    ``chunk_documents``), route each chunk to an index shard by the
    portable md5 coin over (doc_id, chunk_idx), fingerprint the chunk
    text, and roll the corpus up into the per-shard index MANIFEST
    (chunk count, distinct-term count, token volume, dedup count)
    that an index loader consumes.

    Scale shape: chunking stays the narrow in-row expression; the
    ONLY wide operations are the per-(shard, term) distinct-count
    aggregate over exploded chunk tokens (map-side combined) and the
    shard-level rollup — both bounded by shards x vocabulary. The
    chunk text itself is dropped before any shuffle (only md5 digests
    and term tokens move). Catalyst fuses the whole thing into one
    scan of documents.

    The manifest is what you ship alongside the postings (see
    operators/search.py for the materialized pruned-lookup index
    itself); here the value is the fused single-pass plan and its
    byte-exact oracle.
    """
    from aliyun_emapreduce_datasources_spark.operators.common import md5_bucket

    chunks = chunk_documents(spark, sf_dir)
    shard = md5_bucket(
        F.concat_ws("#", F.col("doc_id").cast("string"), F.col("chunk_idx").cast("string")),
        N_INDEX_SHARDS,
    )
    sharded = chunks.select(
        shard.alias("shard"),
        F.col("n_tokens"),
        F.md5("chunk_text").alias("digest"),
        F.split("chunk_text", " ").alias("terms"),
    )
    term_stats = (
        sharded.select("shard", F.explode("terms").alias("term"))
        .groupBy("shard")
        .agg(F.countDistinct("term").alias("n_terms"))
    )
    manifest = sharded.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.countDistinct("digest").cast("long").alias("n_unique_chunks"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )
    return (
        manifest.join(term_stats, "shard")
        .select(
            "shard",
            "n_chunks",
            "n_unique_chunks",
            "total_tokens",
            F.col("n_terms").cast("long").alias("n_terms"),
        )
        .orderBy("shard")
    )


ORACLE_RAG_INDEX = f"""
WITH chunks AS ({_O_CHUNKS}
), sharded AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || CAST(chunk_idx AS VARCHAR)), 1, 8)) AS BIGINT)
           % {N_INDEX_SHARDS} AS shard,
         n_tokens,
         md5(chunk_text) AS digest,
         string_split(chunk_text, ' ') AS terms
  FROM chunks
), term_stats AS (
  SELECT shard, COUNT(DISTINCT term) AS n_terms
  FROM (SELECT shard, unnest(terms) AS term FROM sharded)
  GROUP BY shard
), manifest AS (
  SELECT shard,
         CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(COUNT(DISTINCT digest) AS BIGINT) AS n_unique_chunks,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
  FROM sharded GROUP BY shard
)
SELECT m.shard, m.n_chunks, m.n_unique_chunks, m.total_tokens,
       CAST(t.n_terms AS BIGINT) AS n_terms
FROM manifest m JOIN term_stats t ON m.shard = t.shard
ORDER BY m.shard
"""


QUERIES["rag_index_build"] = rag_index_build
ORACLES["rag_index_build"] = ORACLE_RAG_INDEX
