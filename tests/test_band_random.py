"""Property test: the shared centi-band expression bins identically in
Spark and DuckDB — including NEGATIVE values, where Spark's DIV
(truncates) and DuckDB's // (floors) would otherwise disagree. This is
the portability contract behind the batch/streaming drift monitors.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import centi_band, o_centi_band

# quarter-centi values, both signs, crossing band boundaries — odd
# multiples of 1/200 are exact half-centi ties, pinning the explicit
# ROUND in the conversion (a plain decimal→BIGINT cast truncates in
# Spark but rounds in DuckDB, so ties would bin differently)
VALUES = st.lists(
    st.integers(min_value=-200000, max_value=200000).map(lambda c: c / 200.0),
    min_size=1,
    max_size=40,
)
WIDTHS = st.sampled_from([100, 777, 5000])


@settings(max_examples=12, deadline=None)
@given(VALUES, WIDTHS)
def test_centi_band_portable(spark, values, width):
    df = spark.createDataFrame([(v,) for v in values], schema="value double")
    got = sorted(
        (r["value"], r["b"])
        for r in df.select("value", centi_band("value", width).alias("b")).collect()
    )
    con = duckdb.connect()
    want = sorted(
        (r[0], r[1])
        for r in con.execute(
            f"SELECT value, {o_centi_band('value', width)} FROM "
            "(SELECT unnest(?::DOUBLE[]) AS value)",
            [values],
        ).fetchall()
    )
    con.close()
    assert got == want
