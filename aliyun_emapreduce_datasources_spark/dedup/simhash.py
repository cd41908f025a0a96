"""SimHash near-duplicate detection (Charikar '02 / Manku '07 shape).

64-bit SimHash per document: each distinct token votes +1/-1 on every
bit position according to its own 64-bit hash; the sign of each bit
sum is the fingerprint bit. Near-dups = small Hamming distance.

Candidate generation uses the Manku trick: split the 64-bit print into
4 × 16-bit blocks; any pair within Hamming distance ≤ 3 must agree on
at least one block, so an exact equi-join per block finds all of them
with O(docs × 4) shuffle keys.

Implementation is explode + 64 conditional sums — all JVM codegen; the
bit loop is generated Python-side but executes as one wide aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import tokens
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["simhash64", "simhash_candidates", "QUERY"]

N_BLOCKS = 4
BLOCK_BITS = 64 // N_BLOCKS
MAX_HAMMING = 3


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash long) per document."""
    n_parts = docs.sparkSession.sparkContext.defaultParallelism
    tok = docs.repartition(n_parts).select(
        id_col, F.explode(F.array_distinct(tokens(text_col))).alias("tok")
    )
    h = tok.withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(F.when(F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{bit}")
        for bit in range(64)
    ]
    agg = h.groupBy(id_col).agg(*votes)
    fp = None
    for bit in range(64):
        term = F.when(F.col(f"b{bit}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        shifted = F.shiftleft(term, bit)
        fp = shifted if fp is None else fp.bitwiseXOR(shifted)
    return agg.select(id_col, fp.alias("simhash"))


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
    docs = t(spark, sf_dir, "documents")
    return simhash_candidates(simhash64(docs))
