"""Bloom-filter decontamination: the broadcast-membership variant of
dedup/decontaminate.py for the case where the eval/benchmark set is a
SEPARATE, benchmark-sized table and the training corpus is 100 TB.

The postings-window formulation shuffles every training shingle once;
when the eval side is small, that shuffle is pure waste — the right
plan compresses the eval shingle set into a bit array (classic Bloom
filter, k hash probes per element) and broadcasts the bits, turning
decontamination into a SCAN-ONLY pass over the corpus: no shuffle, no
join, per-task O(1) memory for the filter.

Properties (and what the tests pin):
- no false negatives: every truly-contaminated doc is flagged
  (superset of the exact join answer — guaranteed by construction);
- false positives bounded by the standard (1 - e^{-kn/m})^k rate —
  m is sized for the requested rate, and flagged docs can be
  re-checked exactly with the join variant on the tiny flagged subset
  (two-phase: cheap probabilistic scan, exact verify on survivors).
- deterministic: hash probes are xxhash64(shingle, seed_i) — same
  as decontaminate.py's posting hash family.

The filter is built ONCE from the eval table (driver-side numpy over
the collected eval shingle hashes — the eval set is benchmark-sized
by contract, the same "small by contract" guard as the ANN query
side) and broadcast as raw bits: 1 M shingles at 1% fp ≈ 1.2 MB.

Membership runs in a vectorized Arrow-batched pandas UDF (numpy bit
indexing over the broadcast array) — no per-row Python, no JVM
round-trips per probe.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aliyun_emapreduce_datasources_spark.functions.text import shingles, tokens
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["build_bloom", "bloom_decontaminate", "QUERY"]

MAX_EVAL_SHINGLES = 50_000_000  # guard: eval side is benchmark-sized


def _params(n: int, fp_rate: float) -> tuple[int, int]:
    """(m bits, k hashes) for n elements at the target fp rate."""
    n = max(n, 1)
    m = int(np.ceil(-n * np.log(fp_rate) / (np.log(2) ** 2)))
    m = max(64, m)
    k = max(1, int(round(m / n * np.log(2))))
    return m, k


def _probe_positions(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(hashes), k) bit positions via double hashing
    h1 + i*h2 mod m (Kirsch–Mitzenmacher)."""
    h1 = hashes % np.uint64(m)
    h2 = (hashes >> np.uint64(17) | np.uint64(1)) % np.uint64(m)
    return (h1[:, None] + np.arange(k, dtype=np.uint64)[None, :] * h2[:, None]) % np.uint64(m)


def build_bloom(
    eval_shingle_hashes: np.ndarray, fp_rate: float = 0.01
) -> tuple[np.ndarray, int, int]:
    """(packed bit array, m, k) from an array of uint64 hashes.

    m is the TRUE modulus — np.packbits pads to a byte boundary, so
    the probe side must use this m, never ``packed.size * 8``."""
    m, k = _params(len(eval_shingle_hashes), fp_rate)
    bits = np.zeros(m, dtype=bool)
    if len(eval_shingle_hashes):
        pos = _probe_positions(eval_shingle_hashes.astype(np.uint64), m, k)
        bits[pos.ravel()] = True
    return np.packbits(bits), m, k


OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_flagged", T.LongType()),
    ]
)


def bloom_decontaminate(
    train: DataFrame, eval_df: DataFrame, fp_rate: float = 0.01
) -> DataFrame:
    """(doc_id, n_flagged) for every training doc with ≥1 shingle that
    the filter reports as present in the eval set. Scan-only over the
    training side."""
    spark = train.sparkSession
    eval_hashes_rows = (
        eval_df.select(
            F.explode(
                F.transform(
                    F.array_distinct(shingles(tokens("text"))), lambda s: F.xxhash64(s)
                )
            ).alias("h")
        )
        .distinct()
        .limit(MAX_EVAL_SHINGLES + 1)
        .collect()
    )
    if len(eval_hashes_rows) > MAX_EVAL_SHINGLES:
        raise ValueError(
            f"eval shingle set exceeds MAX_EVAL_SHINGLES={MAX_EVAL_SHINGLES}; "
            "the eval side is benchmark-sized by contract — for corpus-sized "
            "sides use dedup/decontaminate.py's postings-window form"
        )
    # int64 → uint64 bit pattern (xxhash64 is signed on the JVM side)
    eh = np.array([r.h for r in eval_hashes_rows], dtype=np.int64).astype(np.uint64)
    packed, m, k = build_bloom(eh, fp_rate)
    b = spark.sparkContext.broadcast((packed, m, k))

    train_hashed = train.select(
        "doc_id",
        F.transform(
            F.array_distinct(shingles(tokens("text"))), lambda s: F.xxhash64(s)
        ).alias("hs"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        packed_b, m_b, k_b = b.value
        bits = np.unpackbits(packed_b).astype(bool)
        for pdf in batches:
            if pdf.empty:
                continue
            ids, counts = [], []
            for doc_id, hs in zip(pdf["doc_id"], pdf["hs"]):
                # hs is None when the source text is NULL (tokens →
                # shingles → transform all propagate null) — treat as
                # an empty shingle set, don't crash the task
                if hs is None or len(hs) == 0:
                    continue
                h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
                pos = _probe_positions(h, m_b, k_b)
                hit = bits[pos].all(axis=1)
                n = int(hit.sum())
                if n:
                    ids.append(doc_id)
                    counts.append(n)
            yield pd.DataFrame({"doc_id": ids, "n_flagged": counts})

    return train_hashed.mapInPandas(run, OUT_SCHEMA)


def QUERY(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same eval split as dedup/decontaminate.py (doc_id % 10 == 0):
    train = the rest. Probabilistic → rows-only catalog check; the
    no-false-negative superset property vs the exact operator is
    pinned in tests/test_dedup.py."""
    docs = t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 0).select("doc_id", "text")
    eval_df = docs.where(F.col("doc_id") % 10 == 0).select("text")
    return bloom_decontaminate(train, eval_df)
