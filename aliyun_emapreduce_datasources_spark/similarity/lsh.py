"""Random-hyperplane LSH for cosine ANN — the bucketed scale path.

Standard multi-table construction (Indyk-Motwani / Charikar):

- L independent hash tables, each with B sign-bits: bit h of table t is
  sign(dot(v, plane_{t,h})). P(two vectors at angle θ share a bucket in
  one table) = (1 - θ/π)^B; L tables + Hamming-1 multiprobe lift the
  per-table probability to usable recall without widening any bucket.
- Hyperplanes are pseudo-random but fully deterministic, generated from
  an integer mix of (table, plane, dim) — no driver-side RNG state, no
  plane-matrix broadcast; each plane folds into the expression tree as
  an array literal.
- Search explodes each query into its L probe keys (and the B·L
  one-bit-flip neighbors), joins corpus on (table, bucket), then ranks
  the union of candidates exactly. Shuffle volume is O(corpus × L)
  keys, never O(n²).

Tuning for this data (64-dim random-ish vectors, neighbor cosine
≈ 0.3-0.46): B=6, L=4, multiprobe=1 → measured recall@5 ≈ 0.7 vs
brute force; recall rises with L at linear cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.vector import cosine
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["hyperplane_signature", "signature_tables", "ann_lsh_topk", "QUERY"]

N_PLANES = 6
N_TABLES = 4
DIM = 64
K = 5
N_QUERIES = 8


def _plane_weight(table: int, h: int, d: int) -> float:
    """Deterministic pseudo-random weight in [-0.5, 0.5)."""
    x = ((table * 7_368_787 + h * 1_000_003 + d) * 2_654_435_761) % (2**31)
    return (x % 10_000) / 10_000.0 - 0.5


def hyperplane_signature(
    vec: str | Column, n_planes: int = N_PLANES, dim: int = DIM, table: int = 0
) -> Column:
    """B-bit signature (one table) as a long; per-plane dot products
    via zip_with against array-literal planes (compact codegen)."""
    v = F.col(vec) if isinstance(vec, str) else vec
    vd = F.transform(v, lambda x: x.cast("double"))
    sig = F.lit(0).cast("long")
    for h in range(n_planes):
        plane = F.array(*[F.lit(_plane_weight(table, h, d)) for d in range(dim)])
        dot_h = F.aggregate(
            F.zip_with(vd, plane, lambda x, w: x * w), F.lit(0.0), lambda acc, x: acc + x
        )
        bit = F.when(dot_h > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseXOR(F.shiftleft(bit, h))
    return sig


def signature_tables(
    vec: str | Column, n_planes: int = N_PLANES, n_tables: int = N_TABLES, dim: int = DIM
) -> Column:
    """array<struct<tbl,sig>> — one signature per hash table."""
    return F.array(
        *[
            F.struct(
                F.lit(tbl).cast("int").alias("tbl"),
                hyperplane_signature(vec, n_planes, dim, table=tbl).alias("sig"),
            )
            for tbl in range(n_tables)
        ]
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = K,
    n_planes: int = N_PLANES,
    n_tables: int = N_TABLES,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k neighbors per query via multi-table
    signature-bucket join.

    corpus: (vec_id, embedding); queries: (query_id, q_embedding).
    """
    c = corpus.select(
        "vec_id", "embedding", F.explode(signature_tables("embedding", n_planes, n_tables)).alias("b")
    ).select("vec_id", "embedding", F.col("b.tbl").alias("tbl"), F.col("b.sig").alias("sig"))

    q = queries.select(
        "query_id", "q_embedding", F.explode(signature_tables("q_embedding", n_planes, n_tables)).alias("b")
    ).select("query_id", "q_embedding", F.col("b.tbl").alias("tbl"), F.col("b.sig").alias("sig0"))
    if multiprobe:
        probes = F.array(
            F.col("sig0"), *[F.col("sig0").bitwiseXOR(F.lit(1 << h).cast("long")) for h in range(n_planes)]
        )
        q = q.select("query_id", "q_embedding", "tbl", F.explode(probes).alias("sig"))
    else:
        q = q.select("query_id", "q_embedding", "tbl", F.col("sig0").alias("sig"))

    joined = c.join(F.broadcast(q), ["tbl", "sig"]).where(F.col("vec_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine("embedding", "q_embedding").alias("sim"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", F.col("rnk").cast("long").alias("rnk"))
    )


def QUERY(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    return ann_lsh_topk(emb.select("vec_id", "embedding"), queries)
