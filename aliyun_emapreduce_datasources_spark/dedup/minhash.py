"""MinHash + LSH banding near-duplicate detection — the unblocked
scale path for shingle-Jaccard dedup.

Pipeline:

1. **Signatures (map-side only).** Signature computation is per-
   document, so it runs in one ``mapInPandas`` pass: tokenize, shingle
   (k=3), hash each distinct shingle once (blake2b-64), fold into an
   P-slot one-permutation signature (Li et al. '12: slot = h mod P,
   keep the min per slot; empty slots densified from the doc's global
   min). Band bucket hashes are computed in the same pass. No shuffle,
   no per-pair work, vectorized numpy inner loop — this is the shape
   that sweeps 100 TB at scan speed.
2. **Banding (one shuffle).** posexplode the B bucket hashes; docs
   sharing any (band, bucket) key become candidates — shuffle volume
   O(docs × B), never O(docs²).
3. **Verify (small join).** Exact shingle-Jaccard on candidates only.

With P=128, B=32, R=4 the LSH S-curve crosses ~50% detection at
Jaccard ≈ (1/B)^(1/R) ≈ 0.42 — tuned for the 0.5 threshold.

Reference parity: SURVEY.md §7.8 north-star MinHash/LSH dedup;
semantics follow the standard MinHash estimator (Broder '97), not any
reference code.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aliyun_emapreduce_datasources_spark.functions.text import shingles, tokens
from aliyun_emapreduce_datasources_spark.operators.common import ensure_parallelism, t

__all__ = ["minhash_signature", "lsh_candidate_pairs", "minhash_dedup_pairs", "QUERY"]

N_PERM = 128
N_BANDS = 32
ROWS_PER_BAND = N_PERM // N_BANDS
SHINGLE_K = 3

SIG_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sh", T.ArrayType(T.StringType())),
        T.StructField("bands", T.ArrayType(T.LongType())),
    ]
)


def _h64(data: bytes) -> np.int64:
    return np.frombuffer(hashlib.blake2b(data, digest_size=8).digest(), dtype=np.int64)[0]


def _signature(text: str, n_perm: int, n_bands: int, rows_per_band: int) -> tuple[list[str], np.ndarray]:
    toks = text.split(" ")
    sh = list({" ".join(toks[i : i + SHINGLE_K]) for i in range(max(len(toks) - SHINGLE_K + 1, 0))})
    if not sh:
        return sh, np.zeros(0, dtype=np.int64)
    hs = np.fromiter((_h64(s.encode()) for s in sh), dtype=np.int64, count=len(sh))
    slots = (hs % n_perm + n_perm) % n_perm
    sig = np.full(n_perm, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(sig, slots, hs)
    empty = sig == np.iinfo(np.int64).max
    if empty.any():
        # densification: filler mixes the doc's global min hash with the
        # slot index — two docs share a filler only if they share their
        # min-hash shingle (itself a Jaccard-faithful collision)
        gmin = np.int64(hs.min())
        ks = np.arange(n_perm, dtype=np.int64)
        with np.errstate(over="ignore"):
            fill = (gmin * np.int64(-7046029254386353131)) ^ (ks * np.int64(1099511628211))
        sig[empty] = fill[empty]
    bands = np.empty(n_bands, dtype=np.int64)
    for b in range(n_bands):
        bands[b] = _h64(sig[b * rows_per_band : (b + 1) * rows_per_band].tobytes() + bytes([b]))
    return sh, bands


def _with_signatures(
    docs: DataFrame,
    n_perm: int = N_PERM,
    n_bands: int = N_BANDS,
    rows_per_band: int = ROWS_PER_BAND,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sh, bands) in one Arrow-batched map pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "sh": [], "bands": []}
            for _, row in pdf.iterrows():
                sh, bands = _signature(row[text_col], n_perm, n_bands, rows_per_band)
                if not sh:
                    continue
                out["doc_id"].append(int(row[id_col]))
                out["sh"].append(sh)
                out["bands"].append(bands.tolist())
            yield pd.DataFrame(out)

    return ensure_parallelism(docs.select(id_col, text_col)).mapInPandas(run, SIG_SCHEMA)


def minhash_signature(sh: Column, n_perm: int = N_PERM) -> Column:
    """Expression-form MinHash signature over a shingle array column
    (classic per-permutation formulation). Kept for composability in
    pure-SQL pipelines; the OPH mapInPandas path above is the fast one.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_perm - 1)),
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))),
    )


def lsh_candidate_pairs(with_sig: DataFrame) -> DataFrame:
    """Distinct candidate (doc_a < doc_b) pairs via band-bucket join."""
    exploded = with_sig.select("doc_id", F.posexplode("bands").alias("band", "bucket"))
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
    shingle-Jaccard. The signature table is persisted eagerly — the
    band self-join and the two verify joins all read it (at cluster
    scale this is a checkpointed intermediate)."""
        # NULL-text docs carry no shingles/fingerprint — the pandas UDFs
    # would crash on None; skip them like every per-text operator
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    with_sig = _with_signatures(docs).persist()
    with_sig.count()
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
