#!/usr/bin/env python
"""Phase-level wall profile of the two IVF catalog entries (guide §1:
measure first). Runs each eager phase of ann_ivf_file_consistency_check /
ann_ivf_drift_check with its own timer + job description so the wall can
be attributed to train / write / append / search / compare instead of
guessed at. Repeats N times, prints min per phase."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.session import get_session
from aliyun_emapreduce_datasources_spark.similarity import ivf
from aliyun_emapreduce_datasources_spark.similarity.properties import (
    _scratch_index_dir,
    _touch_heartbeat,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))


def main() -> None:
    spark = get_session("profile-ivf")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, list[float]] = {}

    def phase(name: str, fn):
        spark.sparkContext.setJobDescription(name)
        start = time.perf_counter()
        out = fn()
        results.setdefault(name, []).append(time.perf_counter() - start)
        spark.sparkContext.setJobDescription(None)
        return out

    for _ in range(REPS):
        emb = t(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
        queries = emb.where(F.col("vec_id") < ivf.N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_embedding"),
        )
        base = emb.where(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
        increment = emb.where(F.pmod(F.col("vec_id"), F.lit(2)) == 1)
        C = phase("train", lambda: ivf.train_centroids(base))
        dst = _scratch_index_dir(spark, SF_DIR, "file_check")
        phase("write_clustered", lambda: ivf.write_clustered(base, C, dst))
        phase("append_clustered", lambda: ivf.append_clustered(increment, dst))
        _touch_heartbeat(dst)
        via_file = phase(
            "search_build(lazy+collects)",
            lambda: ivf.ivf_file_search_topk(spark, dst, queries).select(
                "query_id", "rnk", F.col("neighbor_id").alias("file_neighbor")
            ),
        )
        in_mem = phase(
            "inmem_build(lazy+collects)",
            lambda: ivf.ann_ivf_topk(emb, queries, centroids=C).select(
                "query_id", "rnk", F.col("neighbor_id").alias("mem_neighbor")
            ),
        )
        phase(
            "final_join_noop",
            lambda: (
                via_file.join(in_mem, ["query_id", "rnk"], "full_outer")
                .where(~F.col("file_neighbor").eqNullSafe(F.col("mem_neighbor")))
                .select("query_id", "rnk", "file_neighbor", "mem_neighbor")
                .orderBy("query_id", "rnk")
                .write.format("noop")
                .mode("overwrite")
                .save()
            ),
        )
        # drift check's unique tail
        phase(
            "drift_report_noop",
            lambda: (
                ivf.drift_report(spark, dst)
                .where(F.col("drifted"))
                .select("cluster", "build_resid", "cur_resid")
                .orderBy("cluster")
                .write.format("noop")
                .mode("overwrite")
                .save()
            ),
        )
        spark.catalog.clearCache()

    total = 0.0
    for name, vals in results.items():
        total += min(vals)
        print(f"{min(vals):8.3f}  (all: {[round(v, 2) for v in vals]})  {name}")
    print(f"{total:8.3f}  total(min)")


if __name__ == "__main__":
    main()
