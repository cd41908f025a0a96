"""SimHash near-duplicate detection (Charikar '02 / Manku '07 shape).

64-bit SimHash per document: each distinct token votes +1/-1 on every
bit position according to its own 64-bit hash; the sign of each bit
sum is the fingerprint bit. Near-dups = small Hamming distance.

Fingerprinting is per-document map-side work, so it runs as one
Arrow-batched ``mapInPandas`` pass with the voting fully vectorized
(hash bytes → unpackbits → column sums) — no token explode, no 64-
column aggregate, no shuffle. At 100 TB this is the shape that
fingerprints at scan speed; the earlier explode + 64-conditional-sum
relational formulation shuffled every token and paid a 64-wide
aggregation per document.

Candidate generation uses the Manku trick: split the 64-bit print into
4 × 16-bit blocks; any pair within Hamming distance ≤ 3 must agree on
at least one block, so an exact equi-join per block finds all of them
with O(docs × 4) shuffle keys. The fingerprint table is persisted —
both sides of the self-join read it.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aliyun_emapreduce_datasources_spark.operators.common import ensure_parallelism, t

__all__ = ["simhash64", "simhash_candidates", "QUERY"]

N_BLOCKS = 4
BLOCK_BITS = 64 // N_BLOCKS
MAX_HAMMING = 3

FP_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
)


def _fingerprint(text: str) -> int:
    """64-bit SimHash of a document's distinct whitespace tokens."""
    toks = set(text.split(" "))
    if not toks:
        return 0
    hs = np.fromiter(
        (
            np.frombuffer(hashlib.blake2b(s.encode(), digest_size=8).digest(), dtype=np.int64)[0]
            for s in toks
        ),
        dtype=np.int64,
        count=len(toks),
    )
    # bit i of each hash, little-endian layout → column i
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - len(toks)
    fp_bits = (votes > 0).astype(np.uint8)
    return int(np.packbits(fp_bits, bitorder="little").view(np.int64)[0])


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash long) per document, one map-side pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "simhash": pdf[text_col].map(_fingerprint).astype("int64"),
                }
            )

    return ensure_parallelism(docs.select(id_col, text_col)).mapInPandas(run, FP_SCHEMA)


def _hamming(a: F.Column, b: F.Column) -> F.Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_candidates(fps: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pairs within Hamming distance MAX_HAMMING via block equi-join."""
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("simhash"), i * BLOCK_BITS).bitwiseAND(F.lit((1 << BLOCK_BITS) - 1)).alias("key"),
            )
            for i in range(N_BLOCKS)
        ]
    )
    ex = fps.select(F.col(id_col), F.col("simhash"), F.explode(blocks).alias("bb")).select(
        id_col, "simhash", F.col("bb.blk").alias("blk"), F.col("bb.key").alias("key")
    )
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            _hamming(F.col("a.simhash"), F.col("b.simhash")).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= MAX_HAMMING)
        .distinct()
    )


def QUERY(spark: SparkSession, sf_dir: str) -> DataFrame:
        # NULL-text docs carry no shingles/fingerprint — the pandas UDFs
    # would crash on None; skip them like every per-text operator
    docs = t(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    fps = simhash64(docs).persist()
    fps.count()  # materialize once; both self-join sides read the cache
    return simhash_candidates(fps)
