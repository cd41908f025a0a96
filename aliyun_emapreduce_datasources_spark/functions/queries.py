"""Aggregated (QUERIES, ORACLES) for the functions package."""

from __future__ import annotations

from aliyun_emapreduce_datasources_spark.functions import lm, text, vocab

QUERIES = {**text.QUERIES, **vocab.QUERIES, **lm.QUERIES}
ORACLES = {**text.ORACLES, **vocab.ORACLES, **lm.ORACLES}
