"""Table registry: logical table names -> DataFrames.

Mirrors the reference's pattern of registering connector-backed tables by
name (``CREATE TABLE ... USING kafka/tablestore/odps OPTIONS(...)`` —
emr-baseline-testing/tables/kafka_store_sales.sql:1-14,
TableStoreSourceProvider.scala:76-119) with a local parquet-backed
catalog.  At cluster scale the paths would be object-store URIs and the
registry a metastore; the API is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "load_table", "register_all", "sf_dir"]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def load_table(spark: SparkSession, name: str, base_dir: str | None = None) -> DataFrame:
    """Load one logical table as a DataFrame (parquet scan; Catalyst
    handles column pruning + predicate pushdown, cf. SURVEY.md §4)."""
    base = base_dir or sf_dir()
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    from aliyun_emapreduce_datasources_spark.operators.common import t

    return t(spark, base, name)


def register_all(spark: SparkSession, base_dir: str | None = None) -> None:
    """Register every table as a temp view so ``spark.sql`` works on the
    same names the DuckDB oracle uses."""
    for name in TABLES:
        load_table(spark, name, base_dir).createOrReplaceTempView(name)
