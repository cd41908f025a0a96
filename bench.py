#!/usr/bin/env python
"""Benchmark harness: runs the headline catalog queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE compact JSON line:

    {"metric": "catalog_total", "value": N, "unit": "sec",
     "queries": {<slowest 10 only>}, "n_queries": 104, "sf": 0.1}

The stdout line is kept well under 2 KB (the driver captures only a
short stdout tail — round 1 lost its official number to truncation);
the full per-query timing map is written to BENCH_DETAIL.json next to
this file for round-over-round diffing.

Each query is executed to completion with a noop sink (full plan runs,
nothing is collected to the driver — the 100 TB-honest measurement).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES
from aliyun_emapreduce_datasources_spark.session import get_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers + Python/Arrow worker pool once so
    # per-query numbers measure execution, not first-touch JIT/metadata
    # or pyspark-worker fork costs
    QUERIES["q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    QUERIES["lr_scoring"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # JSON codec codegen (to_json/from_json JIT) — one tiny row
    spark.sql(
        "SELECT from_json(to_json(named_struct('a', 1)), 'a int')"
    ).write.format("noop").mode("overwrite").save()
    # Python DataSource planning/read workers (emrkv scan path)
    QUERIES["pyds_kv_scan"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # GC cadence between entries. The default (every 20) was tuned at
    # sf0.1; at the sf1 fixture each entry's heap debt is ~10x larger
    # and un-GC'd localCheckpoint/broadcast blocks from one entry
    # measurably inflate the NEXT entries (r09: the embedding-LSH
    # family read 19-20 s mid-sweep vs 11-13 s with per-entry GC —
    # same code, same data). Exponent-record sweeps therefore run with
    # SPARK_GRAFT_BENCH_GC_EVERY=1 so each entry measures its own
    # plan; the official sf0.1 sweep keeps the cheap default.
    # 0 reads as "never GC" and a silent max(1,...) clamp would give
    # the OPPOSITE (per-entry GC, the most aggressive cadence — r09
    # ADVICE); honor 0 as disable, reject negatives loudly
    gc_every = int(os.environ.get("SPARK_GRAFT_BENCH_GC_EVERY", "20"))
    if gc_every < 0:
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_GC_EVERY={gc_every}: must be >= 0 "
            "(0 disables inter-entry GC, N>=1 collects every N entries)"
        )
    timings: dict[str, float] = {}
    for i, (name, fn) in enumerate(sorted(QUERIES.items())):
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - start, 4)
        # entries that persist() intermediates (signature tables, pair
        # lists) would otherwise accumulate in the executor heap across
        # the sweep — later entries then measure the earlier entries'
        # GC pressure, not their own plan (r01->r02 diffs showed ±4s
        # noise on untouched queries from exactly this)
        spark.catalog.clearCache()
        if gc_every and i % gc_every == gc_every - 1:
            # unreferenced localCheckpoint/broadcast blocks are only
            # enqueued for ContextCleaner on a JVM GC; without one the
            # sweep measures earlier entries' heap debt (observed as a
            # 2-4x inflation of late-alphabet entries)
            spark.sparkContext._jvm.System.gc()

    detail = {
        "metric": "catalog_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "n_queries": len(timings),
        "sf": sf,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "catalog_total",
                "value": detail["value"],
                "unit": "sec",
                "queries": slowest,
                "n_queries": len(timings),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
