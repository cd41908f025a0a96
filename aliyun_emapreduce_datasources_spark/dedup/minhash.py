"""MinHash + LSH banding near-duplicate detection — the unblocked
scale path for shingle-Jaccard dedup.

Pipeline (all built-in JVM expressions; no Python in the hot path):

1. signature: for each of P permutations, min over the doc's distinct
   shingles of xxhash64(shingle, seed=i)  → array<long> of length P.
2. banding: split the signature into B bands of R rows (P = B*R); hash
   each band. Docs sharing any band hash become candidates — the
   shuffle is O(docs × B) band keys, never O(docs²).
3. verify: exact shingle-Jaccard on candidate pairs only (join back to
   the shingle arrays), keep pairs >= threshold.

With P=128, B=32, R=4 the LSH S-curve crosses ~50% detection at
Jaccard ≈ (1/B)^(1/R) ≈ 0.42 — tuned for a 0.5 threshold.

Reference parity: this is the SURVEY.md §7.8 "north-star" MinHash/LSH
dedup operator; semantics follow the standard MinHash estimator
(Broder '97), not any reference code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import shingles, tokens
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["minhash_signature", "lsh_candidate_pairs", "minhash_dedup_pairs", "QUERY"]

N_PERM = 128
N_BANDS = 32
ROWS_PER_BAND = N_PERM // N_BANDS


def minhash_signature(sh: Column, n_perm: int = N_PERM) -> Column:
    """array<long> MinHash signature over a distinct-shingle array.

    Expression form (nested higher-order functions). Correct but
    interpreted — O(n_perm × shingles) per row outside codegen; use
    ``_with_signatures`` (explode + wide min-agg, whole-stage codegen)
    on anything bigger than a toy table.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_perm - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))),
    )


def _with_signatures(docs: DataFrame, n_perm: int = N_PERM) -> DataFrame:
    """(doc_id, sh, sig) via the relational plan: explode shingles,
    compute all permutation hashes in one codegen'd projection, take
    per-doc mins, reassemble the signature array. One shuffle on
    doc_id; scales linearly in docs × shingles."""
    sh = F.array_distinct(shingles(tokens("text")))
    base = docs.select("doc_id", sh.alias("sh")).where(F.size("sh") > 0)
    exploded = base.select("doc_id", F.explode("sh").alias("s"))
    mins = exploded.groupBy("doc_id").agg(
        *[F.min(F.xxhash64("s", F.lit(i))).alias(f"m{i}") for i in range(n_perm)]
    )
    sig = mins.select("doc_id", F.array(*[f"m{i}" for i in range(n_perm)]).alias("sig"))
    return base.join(sig, "doc_id")


def lsh_candidate_pairs(with_sig: DataFrame, n_bands: int = N_BANDS, rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """Distinct candidate (doc_a < doc_b) pairs via band-bucket join."""
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.xxhash64(F.concat_ws(",", F.transform(F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band), lambda v: v.cast("string"))), b).alias("bucket"),
        ),
    )
    exploded = with_sig.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_dedup_pairs(spark: SparkSession, sf_dir: str, threshold: float = 0.5) -> DataFrame:
    """Confirmed near-dup pairs: LSH candidates verified with exact
    shingle-Jaccard (two broadcast-free shuffles total)."""
    docs = t(spark, sf_dir, "documents")
    with_sig = _with_signatures(docs)
    cand = lsh_candidate_pairs(with_sig)
    sh_only = with_sig.select("doc_id", "sh")
    jac = (
        F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
        / F.size(F.array_distinct(F.concat("a_sh", "b_sh")))
    )
    return (
        cand.join(sh_only.withColumnsRenamed({"doc_id": "doc_a", "sh": "a_sh"}), "doc_a")
        .join(sh_only.withColumnsRenamed({"doc_id": "doc_b", "sh": "b_sh"}), "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def QUERY(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_dedup_pairs(spark, sf_dir)
