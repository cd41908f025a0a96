#!/usr/bin/env python
"""Spot-check named catalog entries against their DuckDB oracles —
the verify_driver_sim contract restricted to the entries under edit,
for fast iteration (full sim stays the pre-commit gate).

    python tools/spot_verify.py events_value_percentiles eval_auc_binary
    VERIFY_SF_DIR=/root/testdata/sf0.1 python tools/spot_verify.py ...
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


def main(names: list[str]) -> int:
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("spot-verify")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from test_oracle_parity import assert_frames_match

    con = duckdb.connect()
    from aliyun_emapreduce_datasources_spark.registry import TABLES

    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries, oracles = e.queries(), e.oracle_sql()
    failed: list[str] = []
    for name in names:
        fn = queries[name]
        try:
            spdf = fn(spark, SF_DIR).toPandas()
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                assert_frames_match(spdf, odf, name)
                print(f"{name}: OK ({len(spdf)} rows)", flush=True)
            else:
                print(f"{name}: rows-only ({len(spdf)} rows)", flush=True)
        except Exception:
            failed.append(name)
            print(f"{name}: FAIL", flush=True)
            traceback.print_exc()
    print(f"SPOT {'PASS' if not failed else 'FAIL'}: failed={failed}", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
