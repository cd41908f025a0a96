"""Relational operator surface of the reference's query corpus.

SURVEY.md §2.2: every operator class exercised by the 34-query
streaming TPC-DS corpus, re-expressed as PySpark DataFrame builders
over the driver's TPC-H-ish testdata. Each query has a DuckDB-oracle
SQL twin in the same module.

Import ``operators.catalog`` for the merged (QUERIES, ORACLES) maps —
kept out of this __init__ to avoid import cycles with the packages the
catalog aggregates.
"""
