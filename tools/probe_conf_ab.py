#!/usr/bin/env python
"""Config A/B probe: time a named subset of catalog entries under an
EXTRA set of Spark confs (applied at session build) and write the same
BENCH_DETAIL-shaped JSON as tools/probe_entries.py. Used by the r11
optimization round to measure guide §9 candidates (shuffled-hash join
conversion, shuffle codec) without touching session.py until a win is
proven.

Usage:
    python tools/probe_conf_ab.py <sf_dir> <out.json> <reps> \
        [--conf k=v ...] <entry> [<entry> ...]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir, out_p, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    rest = sys.argv[4:]
    confs: dict[str, str] = {}
    names: list[str] = []
    i = 0
    while i < len(rest):
        if rest[i] == "--conf":
            k, v = rest[i + 1].split("=", 1)
            confs[k] = v
            i += 2
        else:
            names.append(rest[i])
            i += 1

    import os

    import multiprocessing

    from pyspark.sql import SparkSession

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", multiprocessing.cpu_count()))
    shuffle_parts = int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(2 * cores))
    )
    # mirror session.get_session's builder exactly, then overlay confs
    builder = (
        SparkSession.builder.appName("probe-conf-ab")
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:MaxMetaspaceSize=2g",
        )
        .config("spark.cleaner.periodicGC.interval", "1min")
        .config("spark.sql.ui.retainedExecutions", "10")
        .config("spark.ui.retainedJobs", "100")
        .config("spark.ui.retainedStages", "100")
        .config("spark.ui.retainedTasks", "2000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES

    QUERIES["lr_scoring"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    best: dict[str, float] = {}
    allruns: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 4)
            allruns[name].append(dt)
            if name not in best or dt < best[name]:
                best[name] = dt
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
    with open(out_p, "w") as f:
        json.dump(
            {
                "metric": "probe_conf_ab",
                "queries": best,
                "runs": allruns,
                "confs": confs,
                "sf_dir": sf_dir,
            },
            f,
            indent=1,
        )
    print(out_p, json.dumps(best))


if __name__ == "__main__":
    main()
