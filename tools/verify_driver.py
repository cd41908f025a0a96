"""Driver-harness simulation (the /verify recipe, persisted).

Simulates the external driver's contract against ``__spark_entry__``:
a *vanilla* SparkSession with an adversarial non-UTC session timezone,
``entry()`` smoke check, then every ``queries()`` key with an
``oracle_sql()`` twin compared value-by-value against DuckDB over the
sf0.01 parquet tables. Rows-only entries are executed for count >= 0.

Usage: python tools/verify_driver.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("verify-driver")
        # deliberately NOT our tuned session: the driver builds its own,
        # and an east-coast TZ catches any window/date code that forgot
        # the UTC pin in operators/common.t()
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from test_oracle_parity import assert_frames_match

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )

    n = e.entry(spark).count()
    assert n > 0, "entry() returned 0 rows"
    print(f"entry(): {n} rows OK")

    queries, oracles = e.queries(), e.oracle_sql()
    failed: list[str] = []
    for name in sorted(queries):
        t0 = time.time()
        try:
            spark_pdf = queries[name](spark, sf_dir).toPandas()
            if name in oracles:
                oracle_pdf = con.execute(oracles[name]).df()
                assert_frames_match(spark_pdf, oracle_pdf, name)
                status = f"OK    ({len(spark_pdf)} rows)"
            else:
                status = f"ROWS  ({len(spark_pdf)} rows, no oracle)"
        except Exception as exc:  # noqa: BLE001 — report every failure
            status = f"FAIL  {type(exc).__name__}: {str(exc)[:200]}"
            failed.append(name)
        print(f"{name:32s} {status}  [{time.time() - t0:.1f}s]")

    print(f"\n{len(queries) - len(failed)}/{len(queries)} verified", end="")
    print(f", FAILED: {failed}" if failed else "")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
