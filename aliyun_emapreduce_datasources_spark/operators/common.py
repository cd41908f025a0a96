"""Shared helpers for operator/query builders.

Determinism conventions shared by every (Spark query, DuckDB oracle)
pair — engine-native double aggregation is accumulation-order-dependent
and therefore not reproducible across engines, so:

- Numeric measures are cast to ``decimal(18,6)`` before aggregation.
  Every double column in the testdata is exactly representable at 6
  decimal places (verified), so the cast is exact in both Spark and
  DuckDB and sums become order-independent integer arithmetic.
- Products (e.g. price * (1 - discount)) are summed at full decimal
  precision — (18,6)×(18,6) → scale-12 exact in both engines — and
  only the final aggregate is cast back to ``double``, which yields
  the identical IEEE-754 value on both sides.
- Averages are exact-decimal-sum / count evaluated in double.
- Integer outputs are cast to ``long`` to match DuckDB's BIGINT-typed
  scalar functions.

This mirrors the reference corpus' exact-money model (Avro
``decimal(7,2)`` — FIXTURES.md §1, StoreSales.avsc).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["t", "m", "dsum", "davg", "o_m", "o_dsum", "o_davg", "md5_bucket", "ensure_parallelism", "revenue", "O_REVENUE", "centi_band", "o_centi_band"]

DEC = "decimal(18,6)"


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition ONLY when the input has fewer partitions than the
    cluster has slots — the local testdata is a single parquet file
    (one split), which would serialize expression/mapInPandas work
    onto one core. A production table has thousands of file splits, so
    this is a no-op there and the unconditional-repartition full-text
    shuffle the docstrings warn about never happens at scale."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def md5_bucket(col, modulus: int):
    """The engine's portable deterministic coin: first 32 bits of
    md5(col) mod modulus, as BIGINT. One definition — sampling, splits,
    per-source caps, DSIR buckets, and the inverted-index layout all
    derive from it, and every DuckDB oracle mirrors it as
    ``CAST(('0x' || substr(md5(x),1,8)) AS BIGINT) % modulus``. Change
    it here (e.g. widen the hex window) and every assignment moves in
    lockstep instead of silently diverging per module."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % modulus


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table (parquet scan → Catalyst prunes/pushes).

    events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark only reads via the nanosAsLong legacy conf; we floor-divide
    to micros (identical to DuckDB's nanos→micros truncation) so both
    engines see the same timestamps.
    """
    # Canonical engine timezone: all event-time semantics (windows,
    # year()/date_trunc extraction, timestamp literals) are UTC, like
    # the corpus' Avro timestamp-millis instants — and independent of
    # whatever session the caller hands us.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Parquet timestamp[us] without a timezone flag arrives as
    # TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ. Normalize to
    # the instant type (LTZ): with the UTC session TZ pinned above the
    # wall-clock value is unchanged and matches DuckDB's naive read,
    # while downstream epoch casts / interval arithmetic / windows keep
    # the instant-based semantics the engine standardizes on.
    for cname, ctype in df.dtypes:
        if ctype == "timestamp_ntz":
            df = df.withColumn(cname, F.col(cname).cast("timestamp"))
    return df


def m(col: str | Column) -> Column:
    """Exact-decimal view of a measure column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(expr: str | Column, alias: str) -> Column:
    """Order-independent sum: exact decimal in, double out."""
    e = m(expr) if isinstance(expr, str) else expr
    return F.sum(e).cast("double").alias(alias)


def davg(expr: str | Column, alias: str) -> Column:
    """Deterministic average: exact decimal sum (as double) / count."""
    e = m(expr) if isinstance(expr, str) else expr
    return (F.sum(e).cast("double") / F.count(e)).alias(alias)


# ---- Oracle-side (DuckDB SQL) twins ----------------------------------

def o_m(col: str) -> str:
    return f"CAST({col} AS DECIMAL(18,6))"


def o_dsum(expr: str, alias: str) -> str:
    """expr must already be decimal-exact (use o_m on raw columns)."""
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def o_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) / COUNT({expr}) AS {alias}"


def revenue() -> Column:
    """lineitem revenue ``price * (1 - discount)`` in exact decimal —
    the determinism-critical core expression of the TPC-H family,
    defined once (tpch.py and tpch_extra.py both consume it; a
    precision change in one inlined copy would silently skew the
    other module's 18 queries). O_REVENUE is its DuckDB twin."""
    return m("l_extendedprice") * (F.lit(1).cast("decimal(2,0)") - m("l_discount"))


O_REVENUE = f"{o_m('l_extendedprice')} * (1 - {o_m('l_discount')})"


def centi_band(value_col: str, width_centi: int):
    """Fixed-width value band on EXACT centi-integers, engine-portable
    for NEGATIVE and HALF-CENTI values too: the double->centi step is
    an explicit ROUND (ties away from zero in BOTH engines; a plain
    decimal->BIGINT cast truncates in Spark but rounds in DuckDB), and
    the band division truncates toward zero on both sides (Spark DIV
    natively; o_centi_band mirrors with a sign CASE because DuckDB's
    // floors). One definition shared by the batch
    drift monitor (operators/events.events_drift_tv) and its streaming
    twin (streaming/windows.windowed_value_histogram) so the two can
    never bin differently."""
    return F.expr(
        f"CAST(ROUND(CAST({value_col} AS DECIMAL(18,6)) * 100) AS BIGINT) DIV {width_centi}"
    )


def o_centi_band(value_col: str, width_centi: int) -> str:
    """DuckDB twin of centi_band (truncating division via sign CASE)."""
    c = f"CAST(ROUND(CAST({value_col} AS DECIMAL(18,6)) * 100) AS BIGINT)"
    return (
        f"CASE WHEN {c} < 0 THEN -((-({c})) // {width_centi}) "
        f"ELSE ({c}) // {width_centi} END"
    )
