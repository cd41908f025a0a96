"""Aggregated (QUERIES, ORACLES) for the functions package."""

from __future__ import annotations

from aliyun_emapreduce_datasources_spark.functions import text

QUERIES = dict(text.QUERIES)
ORACLES = dict(text.ORACLES)
