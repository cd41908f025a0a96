"""Storage-layout scale properties: partitioned writes with partition
pruning (S17's dynamic-partition write + ODPS partitionSpec pruning,
SURVEY §4) and bucketed tables whose co-located join plans drop the
shuffle entirely — the two layout levers a 100 TB deployment uses
before any query tuning."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import t


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_partitioned_write_and_partition_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "orders_by_year")
    orders = t(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    orders.write.partitionBy("o_year").mode("overwrite").parquet(out)

    back = spark.read.parquet(out)
    pruned = back.where(F.col("o_year") == 1997)
    plan = plan_of(pruned)
    assert "PartitionFilters: [" in plan and "o_year" in plan[plan.index("PartitionFilters") :].splitlines()[0]
    # pruning must actually cut the scan to one partition's files
    assert pruned.count() == orders.where(F.col("o_year") == 1997).count()
    total_files = plan_of(back).count("parquet")
    assert "isnotnull(o_year" in plan or "(o_year" in plan


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    """Both sides bucketed by the join key into the same bucket count:
    the join plan must contain NO Exchange (shuffle) — the co-located
    join layout for repeated fact-fact joins."""
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored); dropped again below
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")

    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # disable broadcast so the test proves bucketing (not broadcast)
    # removed the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        plan = plan_of(joined, mode="simple")
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    want = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert n == want
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compaction_produces_target_file_count(spark, sf_dir, tmp_path):
    """Many small files in → few right-sized files out; row set identical."""
    from aliyun_emapreduce_datasources_spark.operators.storage import compact, input_bytes

    src = str(tmp_path / "fragmented")
    li = t(spark, sf_dir, "lineitem")
    li.repartition(64).write.mode("overwrite").parquet(src)  # simulate micro-batch litter

    dst = str(tmp_path / "compacted")
    total_mb = max(1, input_bytes(spark, src) // (1024 * 1024))
    n = compact(spark, src, dst, target_file_mb=max(1, total_mb // 2))
    assert n <= 4  # 64 fragments → a handful of files

    import glob

    out_files = glob.glob(f"{dst}/part-*.parquet")
    assert len(out_files) == n
    assert spark.read.parquet(dst).count() == li.count()


def test_clustered_compaction_gives_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """With sort_cols the rewrite range-partitions: every output file
    owns a disjoint l_shipdate slice (parquet footer min/max), so any
    engine skips whole files for a date-range predicate."""
    import glob

    import pyarrow.parquet as pq

    from aliyun_emapreduce_datasources_spark.operators.storage import compact

    src = str(tmp_path / "scattered")
    t(spark, sf_dir, "lineitem").repartition(16).write.mode("overwrite").parquet(src)

    dst = str(tmp_path / "clustered")
    compact(spark, src, dst, target_file_mb=0.05, sort_cols=["l_shipdate"])

    ranges = []
    for f in glob.glob(f"{dst}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "l_shipdate"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) >= 3, "expected multiple clustered files"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"file ranges overlap: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_zorder_localizes_every_listed_column(spark, sf_dir, tmp_path):
    """Z-order on (l_partkey, l_suppkey): most output files must cover
    a narrow slice of BOTH columns (footer-stat prunable on either),
    whereas a linear sort on l_partkey leaves l_suppkey full-range in
    every file."""
    import glob

    import pyarrow.parquet as pq

    from aliyun_emapreduce_datasources_spark.operators.storage import (
        compact,
        compact_zorder,
    )

    src = str(tmp_path / "src")
    t(spark, sf_dir, "lineitem").repartition(8).write.mode("overwrite").parquet(src)

    def file_spans(d, col):
        spans = []
        for f in glob.glob(f"{d}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                for i in range(md.num_columns):
                    c = md.row_group(rg).column(i)
                    if c.path_in_schema == col and c.statistics is not None:
                        mins.append(c.statistics.min)
                        maxs.append(c.statistics.max)
            if mins:
                spans.append(max(maxs) - min(mins))
        return spans

    zdir = str(tmp_path / "z")
    n = compact_zorder(spark, src, zdir, ["l_partkey", "l_suppkey"], target_file_mb=0.008)
    assert n >= 12, "want enough z-ordered files for quadrant-level locality"

    ldir = str(tmp_path / "linear")
    compact(spark, src, ldir, target_file_mb=0.008, sort_cols=["l_partkey"])

    import duckdb

    glob_rng = {
        c: duckdb.sql(
            f"SELECT max({c}) - min({c}) FROM '{src}/*.parquet'"
        ).fetchone()[0]
        for c in ("l_partkey", "l_suppkey")
    }
    # z-order: BOTH columns localized in the median file
    for col in ("l_partkey", "l_suppkey"):
        spans = sorted(file_spans(zdir, col))
        med = spans[len(spans) // 2]
        assert med <= glob_rng[col] * 0.6, f"z-order failed to localize {col}: {med} vs {glob_rng[col]}"
    # linear sort: trailing column NOT localized (sanity of the metric)
    lin_spans = sorted(file_spans(ldir, "l_suppkey"))
    assert lin_spans[len(lin_spans) // 2] > glob_rng["l_suppkey"] * 0.6
