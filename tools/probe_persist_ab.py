#!/usr/bin/env python
"""A/B probe: eager localCheckpoint vs lazy persist() as the
materialize-once vehicle, on the trigram-postings shape
(text_trigram_novelty) — the r12 heap-release decision experiment.

Measures, per variant, min-of-N isolated end-to-end entry time (noop
sink), and then verifies the release story: storage blocks present
after the entry, and whether spark.catalog.clearCache() frees them.

Run: python tools/probe_persist_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import shingles, tokens
from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def entry(spark, sf_dir, mode: str):
    docs = t(spark, sf_dir, "documents")
    tg = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(tokens("text"), 3))).alias("tg"),
    )
    if mode == "ckpt":
        tg = tg.localCheckpoint()  # eager, the inherited shape
    elif mode == "persist":
        tg = tg.persist()  # lazy; the final job fills the cache once
    counts = tg.groupBy("tg").agg(F.count(F.lit(1)).cast("long").alias("n_docs_with"))
    return (
        tg.join(counts, "tg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_tg"),
            F.sum(F.when(F.col("n_docs_with") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
        .withColumn(
            "novelty_milli", F.expr("(1000 * n_novel) DIV n_distinct_tg").cast("long")
        )
        .orderBy("doc_id")
    )


def storage_mb(spark) -> float:
    sc = spark.sparkContext
    infos = sc._jsc.sc().getRDDStorageInfo()
    return sum(infos[i].memSize() + infos[i].diskSize() for i in range(len(infos))) / 1e6


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_session("probe-persist-ab")
    spark.sparkContext.setLogLevel("ERROR")
    # warm
    entry(spark, SF_DIR, "none").write.format("noop").mode("overwrite").save()

    results: dict[str, list[float]] = {}
    for rep in range(reps):
        for mode in ("ckpt", "persist"):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            time.sleep(0.5)
            t0 = time.perf_counter()
            df = entry(spark, SF_DIR, mode)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results.setdefault(mode, []).append(dt)
            before = storage_mb(spark)
            spark.catalog.clearCache()
            after_clear = storage_mb(spark)
            print(
                f"rep{rep} {mode}: {dt:.2f}s storage={before:.1f}MB "
                f"after_clearCache={after_clear:.1f}MB",
                flush=True,
            )
    for mode, ts in results.items():
        print(f"{mode}: min={min(ts):.2f} all={[round(x,2) for x in ts]}")


if __name__ == "__main__":
    main()
