"""Central query/oracle catalog.

Merges every module's (QUERIES, ORACLES) pair. ``__spark_entry__``
re-exports these for the driver's correctness gate; bench.py times the
headline subset.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _merge(mod) -> None:
    for k, v in mod.QUERIES.items():
        if k in QUERIES:
            raise ValueError(f"duplicate query name {k}")
        QUERIES[k] = v
    ORACLES.update(getattr(mod, "ORACLES", {}))


def _load() -> None:
    from aliyun_emapreduce_datasources_spark.operators import (
        analytic,
        corpus,
        events,
        pipeline,
        skew,
        tpch,
        tpch_extra,
    )

    _merge(tpch)
    _merge(tpch_extra)
    _merge(corpus)
    _merge(analytic)
    _merge(events)
    _merge(skew)
    _merge(pipeline)
    for modname in (
        "dedup.queries",
        "similarity.queries",
        "functions.queries",
        "sources.queries",
        "multimodal.queries",
    ):
        try:
            import importlib

            mod = importlib.import_module(f"aliyun_emapreduce_datasources_spark.{modname}")
        except ImportError:
            continue
        _merge(mod)


_load()
