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
    docs = t(spark, sf_dir, "documents")
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


ORACLE_CHUNK = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS tok,
         (greatest(len(string_split(text, ' ')) - {WINDOW}, 0) + {STRIDE} - 1)
           // {STRIDE} + 1 AS n_chunks
  FROM documents
)
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_idx,
       CAST(k * {STRIDE} + 1 AS BIGINT) AS start_token,
       CAST(len(list_slice(tok, k * {STRIDE} + 1, k * {STRIDE} + {WINDOW})) AS BIGINT) AS n_tokens,
       array_to_string(list_slice(tok, k * {STRIDE} + 1, k * {STRIDE} + {WINDOW}), ' ') AS chunk_text
FROM base, unnest(generate_series(0, n_chunks - 1)) AS u(k)
ORDER BY doc_id, chunk_idx
"""

QUERIES = {"chunk_documents": chunk_documents}
ORACLES = {"chunk_documents": ORACLE_CHUNK}
