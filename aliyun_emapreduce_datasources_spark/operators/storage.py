"""Storage-layout maintenance: small-file compaction + clustered write.

A 100 TB table that ingests via streaming micro-batches or per-shard
writers accumulates millions of small files; scan throughput then dies
on open/footers, and range queries read every file because values are
scattered. The two standard maintenance passes (what table formats call
OPTIMIZE / CLUSTER BY) are expressible with plain Spark primitives:

- **compact**: rewrite a directory to files of a target size. The
  partition count comes from the actual input bytes, so the same call
  works at any scale; `repartition(n)` round-robins rows for even
  output sizes.
- **compact with sort_cols**: `repartitionByRange(n, cols)` +
  `sortWithinPartitions` — a range-clustered layout where each output
  file owns a disjoint slice of the sort key. Parquet min/max footer
  stats then let any engine (Spark row-group pruning, DuckDB zone
  maps) skip every file outside a range predicate, turning a
  full-table scan into a few-file read.

Both are single-shuffle linear passes; neither collects anything to
the driver (sizes come from the file listing). Reference parity: the
reference's connectors write through service-side sinks and leave
layout to the service (e.g. OTS/ODPS compaction); for our
parquet-backed engine the layout pass IS the engine's responsibility,
per SURVEY.md §"Optimize for scale" (partition sizing lever).
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["input_bytes", "compact", "zorder_key", "compact_zorder"]


def input_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes of the data files under ``path`` via the Hadoop FS
    listing (driver-side metadata only, no data read)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    total = 0
    while it.hasNext():
        f = it.next()
        name = f.getPath().getName()
        if not name.startswith(("_", ".")):
            total += f.getLen()
    return total


def compact(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: float = 512,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite parquet dir ``src`` into ``dst`` with files of roughly
    ``target_file_mb``; with ``sort_cols``, range-cluster so each file
    owns a disjoint key slice. Returns the output partition count."""
    df: DataFrame = spark.read.parquet(src)
    n = max(1, math.ceil(input_bytes(spark, src) / (target_file_mb * 1024 * 1024)))
    if sort_cols:
        out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> tuple[DataFrame, Column]:
    """Morton (Z-order) key over numeric columns, all JVM expressions.

    Linear sort clusters only its leading column; a range predicate on
    any OTHER column still reads every file. Interleaving the bits of
    min/max-normalized per-column bucket numbers gives every listed
    column locality in the SAME ordering, so
    parquet min/max footer stats prune files for predicates on any of
    them (the multi-dim analog of CLUSTER BY; what table formats call
    ZORDER BY).

    Buckets come from a single 1-row min/max aggregate (broadcast back
    — bytes), so the pass stays two scans total at any scale: one
    metadata-light stats pass, one shuffle+write. Bit interleave is a
    folded shift/or expression tree — whole-stage codegen, no UDF.
    """
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__max_{c}") for c in cols],
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    top = (1 << bits) - 1
    buckets = []
    for c in cols:
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        span = F.when(hi > lo, hi - lo).otherwise(F.lit(1.0))
        frac = (F.col(c).cast("double") - lo) / span
        # NULL column values must land in bucket 0 (the curve origin),
        # not bucket `top`: least() SKIPS nulls, so without the
        # coalesce a null frac would co-cluster nulls with max-value
        # rows and pollute those files' min/max footer stats
        buckets.append(
            F.coalesce(
                F.least(F.floor(frac * (top + 1)).cast("long"), F.lit(top)),
                F.lit(0).cast("long"),
            )
        )
    ncols = len(cols)
    terms = [
        F.shiftleft(
            F.shiftright(b, bit).bitwiseAND(F.lit(1)), bit * ncols + (ncols - 1 - i)
        )
        for i, b in enumerate(buckets)
        for bit in range(bits)
    ]
    key = reduce(lambda a, t: a.bitwiseOR(t), terms, F.lit(0).cast("long"))
    return with_stats, key


def compact_zorder(
    spark: SparkSession,
    src: str,
    dst: str,
    cols: list[str],
    target_file_mb: float = 512,
    bits: int = 8,
) -> int:
    """Rewrite ``src`` Z-ordered on ``cols``: each output file owns a
    compact Morton-curve segment, so footer stats prune on EVERY
    listed column, not just a leading one."""
    df = spark.read.parquet(src)
    n = max(1, math.ceil(input_bytes(spark, src) / (target_file_mb * 1024 * 1024)))
    with_stats, key = zorder_key(df, cols, bits=bits)
    out = (
        with_stats.withColumn("__zkey", key)
        .repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *[f"__min_{c}" for c in cols], *[f"__max_{c}" for c in cols])
    )
    out.write.mode("overwrite").parquet(dst)
    return n
