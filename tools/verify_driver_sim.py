#!/usr/bin/env python
"""Driver-harness simulation (the /verify recipe).

Fresh vanilla SparkSession with an adversarial non-UTC timezone, then:
  1. entry(spark) must produce >= 0 rows with a stable schema;
  2. every queries() key with an oracle_sql() twin is executed on both
     engines at sf0.01 and value-compared (order-insensitive, floats
     rtol=1e-9) — the same contract the external driver enforces.

Exit code 0 == all green. Prints one summary line at the end.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import duckdb
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("verify-driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from test_oracle_parity import assert_frames_match

    res = e.entry(spark)
    n = res.count()
    assert n >= 0 and res.schema is not None
    print(f"entry(): {n} rows", flush=True)

    con = duckdb.connect()
    from aliyun_emapreduce_datasources_spark.registry import TABLES

    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries, oracles = e.queries(), e.oracle_sql()
    failed: list[str] = []
    for i, (name, fn) in enumerate(queries.items()):
        if name not in oracles:
            continue
        try:
            spdf = fn(spark, SF_DIR).toPandas()
            odf = con.execute(oracles[name]).df()
            assert_frames_match(spdf, odf, name)
            print(f"[{i + 1}/{len(queries)}] {name}: OK ({len(spdf)} rows)", flush=True)
        except Exception:
            failed.append(name)
            print(f"[{i + 1}/{len(queries)}] {name}: FAIL", flush=True)
            traceback.print_exc()
    print(f"VERIFY {'PASS' if not failed else 'FAIL'}: "
          f"{len(queries)} queries, {len(oracles)} oracled, failed={failed}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
