"""Relational operator surface of the reference's query corpus.

SURVEY.md §2.2: every operator class exercised by the 34-query streaming
TPC-DS corpus, re-expressed as PySpark DataFrame builders over the
driver's TPC-H-ish testdata. Each query has a DuckDB-oracle SQL twin in
the same module (see ``catalog.QUERIES`` / ``catalog.ORACLES``).
"""

from aliyun_emapreduce_datasources_spark.operators.catalog import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
