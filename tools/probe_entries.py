#!/usr/bin/env python
"""Targeted per-entry wall probes: time a named subset of catalog
entries N times at one fixture and write a BENCH_DETAIL-shaped JSON
(`{"queries": {name: min_seconds}}`) suitable for
tools/sf1_exponents.py's comma-list min-merge. Same warmup + per-entry
GC discipline as bench.py's exponent-record mode.

Usage:
    python tools/probe_entries.py <sf_dir> <out.json> <reps> <entry> [<entry> ...]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    sf_dir, out_p, reps = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:]
    from aliyun_emapreduce_datasources_spark.session import get_session
    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES

    spark = get_session("probe")
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JIT + python workers + parquet metadata (bench.py's moves)
    QUERIES["lr_scoring"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    for name in names:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    best: dict[str, float] = {}
    for _ in range(reps):
        for name in names:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 4)
            if name not in best or dt < best[name]:
                best[name] = dt
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
    with open(out_p, "w") as f:
        json.dump({"metric": "probe", "queries": best, "sf_dir": sf_dir}, f, indent=1)
    print(out_p, best)


if __name__ == "__main__":
    main()
