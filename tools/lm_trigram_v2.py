#!/usr/bin/env python
"""lm_trigram_backoff candidate restructure (r12, VERDICT item 4): the
fourth — untried — shape: ONE token-grain explode pass feeds BOTH the
per-doc trigram table and a single combined (grain, ngram, source)
count table (grouping-sets style union of the uni/bi/tri grains), and
the five lookup levels run as ONE unpivoted probe join against it
instead of five separate joins against five inlined count subtrees.

Scans 8 → 2; probe joins 5 → 1 (plus one reassembly shuffle).

A/B harness: builds both the inherited entry and this variant, asserts
EXACT frame equality, then interleaved noop-sink timings.

    python tools/lm_trigram_v2.py <sf_dir> [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.lm import (
    BACKOFF_DEN,
    BACKOFF_NUM,
    SCALE,
    lm_trigram_backoff,
)
from aliyun_emapreduce_datasources_spark.functions.text import tokens
from aliyun_emapreduce_datasources_spark.operators.common import t


def lm_trigram_backoff_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    tok = tokens("text")

    # ONE token-grain pass: token i with its two lookaheads (null at the
    # doc tail; zip_with pads the shorter slice with nulls). Every
    # unigram is a row; bigrams are rows with w2, trigrams rows with w3.
    # Built with zip_with over an ATTRIBUTE (tk), not element_at inside
    # a transform over the split() expression — a lambda re-evaluates a
    # captured expression per element (the shingles() trap).
    base = docs.select("doc_id", "source", tok.alias("tk")).where(
        F.size("tk") > 0  # null text → size -1; also keeps sequence sane
    )
    grams = base.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "zip_with("
                "  zip_with(tk, slice(tk, 2, greatest(size(tk) - 1, 0)),"
                "           (x, y) -> struct(x AS w1, y AS w2)),"
                "  slice(tk, 3, greatest(size(tk) - 2, 0)),"
                "  (p, z) -> struct(p.w1 AS w1, p.w2 AS w2, z AS w3))"
            )
        ).alias("g"),
    ).select("doc_id", "source", "g.w1", "g.w2", "g.w3")

    # per-doc trigram occurrences (the scoring grain)
    per = (
        grams.where(F.col("w3").isNotNull())
        .groupBy("doc_id", "source", "w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    # ONE combined count table over all three grains: grain 1 = (w1),
    # grain 2 = (w1,w2), grain 3 = (w1,w2,w3); per-source counts plus
    # the corpus total via one window per key.
    from pyspark.sql import Window as W

    stacked = grams.select(
        "source",
        F.explode(
            F.array(
                F.struct(
                    F.lit(1).alias("gid"),
                    F.col("w1").alias("k1"),
                    F.lit(None).cast("string").alias("k2"),
                    F.lit(None).cast("string").alias("k3"),
                ),
                F.struct(
                    F.lit(2).alias("gid"),
                    F.col("w1").alias("k1"),
                    F.col("w2").alias("k2"),
                    F.lit(None).cast("string").alias("k3"),
                ),
                F.struct(
                    F.lit(3).alias("gid"),
                    F.col("w1").alias("k1"),
                    F.col("w2").alias("k2"),
                    F.col("w3").alias("k3"),
                ),
            )
        ).alias("e"),
    ).select("source", "e.gid", "e.k1", "e.k2", "e.k3")
    cnt = (
        stacked.where(
            (F.col("gid") == 1)
            | ((F.col("gid") == 2) & F.col("k2").isNotNull())
            | ((F.col("gid") == 3) & F.col("k3").isNotNull())
        )
        .groupBy("gid", "k1", "k2", "k3", "source")
        .agg(F.count(F.lit(1)).alias("cs"))
        .withColumn(
            "ct", F.sum("cs").over(W.partitionBy("gid", "k1", "k2", "k3"))
        )
    )

    # totals: nt (corpus tokens) and ns (per-source tokens) — derived
    # from the unigram grain of the SAME stacked pass? They are scalar /
    # |sources|-row aggregates over the corpus; keep them as their own
    # tiny aggregates over the token pass (2 extra scans would inline —
    # instead reuse grams, which inlines anyway; the subtree is shared
    # text-wise but Catalyst inlines it per consumer: 2 extra scans).
    uni = grams.select("source")
    nt = uni.agg(F.count(F.lit(1)).alias("nt"))
    ns = uni.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))

    # unpivot the five lookups per trigram row and join ONCE
    probes = per.select(
        "doc_id",
        "source",
        "w1",
        "w2",
        "w3",
        "c",
        F.explode(
            F.array(
                F.struct(F.lit("t3").alias("role"), F.lit(3).alias("gid"),
                         F.col("w1").alias("k1"), F.col("w2").alias("k2"),
                         F.col("w3").alias("k3")),
                F.struct(F.lit("b_ctx").alias("role"), F.lit(2).alias("gid"),
                         F.col("w1").alias("k1"), F.col("w2").alias("k2"),
                         F.lit(None).cast("string").alias("k3")),
                F.struct(F.lit("b_lo").alias("role"), F.lit(2).alias("gid"),
                         F.col("w2").alias("k1"), F.col("w3").alias("k2"),
                         F.lit(None).cast("string").alias("k3")),
                F.struct(F.lit("u_ctx").alias("role"), F.lit(1).alias("gid"),
                         F.col("w2").alias("k1"),
                         F.lit(None).cast("string").alias("k2"),
                         F.lit(None).cast("string").alias("k3")),
                F.struct(F.lit("u_lo").alias("role"), F.lit(1).alias("gid"),
                         F.col("w3").alias("k1"),
                         F.lit(None).cast("string").alias("k2"),
                         F.lit(None).cast("string").alias("k3")),
            )
        ).alias("p"),
    ).select("doc_id", "source", "w1", "w2", "w3", "c", "p.role", "p.gid", "p.k1", "p.k2", "p.k3")

    # null-safe on k2/k3: the lower grains carry NULL key components on
    # BOTH sides (<=> keeps the join hash-keyed)
    looked = probes.alias("p").join(
        cnt.alias("n"),
        (F.col("p.gid") == F.col("n.gid"))
        & (F.col("p.k1") == F.col("n.k1"))
        & F.col("p.k2").eqNullSafe(F.col("n.k2"))
        & F.col("p.k3").eqNullSafe(F.col("n.k3"))
        & (F.col("p.source") == F.col("n.source")),
    ).select(
        "p.doc_id", "p.source", "p.w1", "p.w2", "p.w3", "p.c", "p.role",
        "n.cs", "n.ct",
    )
    wide = (
        looked.groupBy("doc_id", "source", "w1", "w2", "w3", "c")
        .pivot("role", ["t3", "b_ctx", "b_lo", "u_ctx", "u_lo"])
        .agg(F.first("cs").alias("s"), F.first("ct").alias("t"))
    )
    j = (
        wide.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nt))
        .select(
            "doc_id", "c",
            F.col("t3_s").alias("c3s"), F.col("t3_t").alias("c3t"),
            F.col("b_ctx_s").alias("c2s_ctx"), F.col("b_ctx_t").alias("c2t"),
            F.col("b_lo_s").alias("c2s_lo"), F.col("b_lo_t").alias("c2t_lo"),
            F.col("u_ctx_s").alias("c1s_ctx"), F.col("u_ctx_t").alias("c1t_ctx"),
            F.col("u_lo_s").alias("c1s_lo"), F.col("u_lo_t").alias("c1t_lo"),
            "ns", "nt",
        )
    )
    o = lambda tot, own: f"({tot} - coalesce({own}, 0))"  # noqa: E731
    score = (
        f"CASE WHEN {o('c3t', 'c3s')} > 0 THEN ({SCALE} * {o('c3t', 'c3s')}) DIV {o('c2t', 'c2s_ctx')} "
        f"WHEN {o('coalesce(c2t_lo, 0)', 'c2s_lo')} > 0 THEN ({BACKOFF_NUM} * {SCALE} * {o('coalesce(c2t_lo, 0)', 'c2s_lo')}) DIV ({BACKOFF_DEN} * {o('c1t_ctx', 'c1s_ctx')}) "
        f"WHEN {o('coalesce(c1t_lo, 0)', 'c1s_lo')} > 0 THEN ({BACKOFF_NUM * BACKOFF_NUM} * {SCALE} * {o('coalesce(c1t_lo, 0)', 'c1s_lo')}) DIV ({BACKOFF_DEN * BACKOFF_DEN} * (nt - ns)) "
        f"ELSE 0 END"
    )
    branch = (
        f"CASE WHEN {o('c3t', 'c3s')} > 0 THEN 3 "
        f"WHEN {o('coalesce(c2t_lo, 0)', 'c2s_lo')} > 0 THEN 2 "
        f"WHEN {o('coalesce(c1t_lo, 0)', 'c1s_lo')} > 0 THEN 1 ELSE 0 END"
    )
    scored = j.withColumn("s", F.expr(score)).withColumn("br", F.expr(branch))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.col("s")).cast("long").alias("score_sum"),
            F.sum("c").cast("long").alias("n_trigrams"),
            F.sum(F.when(F.col("br") == 3, F.col("c")).otherwise(0)).cast("long").alias("n_tri_hit"),
            F.sum(F.when(F.col("br") == 2, F.col("c")).otherwise(0)).cast("long").alias("n_bi_backoff"),
            F.sum(F.when(F.col("br") == 1, F.col("c")).otherwise(0)).cast("long").alias("n_uni_backoff"),
            F.sum(F.when(F.col("br") == 0, F.col("c")).otherwise(0)).cast("long").alias("n_unseen"),
        )
        .orderBy("doc_id")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from aliyun_emapreduce_datasources_spark.session import get_session

    spark = get_session("lm-trigram-v2")
    spark.sparkContext.setLogLevel("ERROR")
    old = lm_trigram_backoff(spark, sf_dir)
    new = lm_trigram_backoff_v2(spark, sf_dir)
    a = old.toPandas().sort_values("doc_id", ignore_index=True)
    b = new.toPandas().sort_values("doc_id", ignore_index=True)
    b = b[a.columns]
    assert a.equals(b), "PARITY FAILED"
    print(f"parity OK on {len(a)} rows", flush=True)
    # scan counts
    import contextlib
    import io

    for nm, df in (("old", old), ("new", new)):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="simple")
        p = buf.getvalue()
        print(nm, "FileScan parquet:", p.count("FileScan parquet"),
              "Exchange:", p.count("Exchange"), flush=True)
    # interleaved timing
    times: dict[str, list] = {"old": [], "new": []}
    for _ in range(reps):
        for nm, fn in (("old", lm_trigram_backoff), ("new", lm_trigram_backoff_v2)):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[nm].append(round(time.perf_counter() - t0, 3))
    for nm, ts in times.items():
        print(nm, "min", min(ts), ts, flush=True)


if __name__ == "__main__":
    main()
