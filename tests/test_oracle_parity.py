"""Differential test: every catalog query vs its DuckDB oracle.

Mirrors the driver's correctness gate (order-insensitive row compare)
so regressions surface locally before a round ends. Comparison is
strict: row counts equal, column names equal, values equal (floats to
1e-9 relative — the decimal-exact convention in operators/common.py
should make them byte-identical; the tolerance only absorbs
pandas/arrow conversion noise).
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from aliyun_emapreduce_datasources_spark.operators.catalog import ORACLES, QUERIES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            # unify resolution: Spark hands back ns, DuckDB us — raw
            # array comparison would otherwise fail on equal instants
            df[c] = (
                pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
            )
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: float(v) if hasattr(v, "as_tuple") else v)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), f"{name}: rowcount {len(spark_pdf)} vs {len(oracle_pdf)}"
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    for col in s.columns:
        sv, ov = s[col], o[col]
        if sv.dtype.kind == "f" or ov.dtype.kind == "f":
            sn, on = sv.astype(float), ov.astype(float)
            both_nan = sn.isna() & on.isna()
            close = pd.Series(
                [
                    (a == b) or (not math.isnan(a) and not math.isnan(b) and abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)))
                    for a, b in zip(sn.fillna(float("nan")), on.fillna(float("nan")))
                ]
            )
            assert (close | both_nan.reset_index(drop=True)).all(), f"{name}.{col}: value mismatch\n{s[~close]}\n{o[~close]}"
        else:
            pd.testing.assert_series_equal(sv, ov, check_dtype=False, check_names=False, obj=f"{name}.{col}")


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k in ORACLES))
def test_query_matches_oracle(name, spark, oracle, sf_dir):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    oracle_pdf = oracle.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


@pytest.mark.parametrize("name", sorted(k for k in QUERIES if k not in ORACLES))
def test_query_runs(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
