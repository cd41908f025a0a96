"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``aliyun_emapreduce_datasources_spark``;
this module only adapts it to the driver's entry-point shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (corpus-q3-shaped star join) on sf0.001."""
    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES

    return QUERIES["q3_star_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from aliyun_emapreduce_datasources_spark.operators.catalog import ORACLES

    return dict(ORACLES)
