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

from pyspark.sql import DataFrame, SparkSession

__all__ = ["input_bytes", "compact"]


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
