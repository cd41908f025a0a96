"""Extended streaming-SQL window/watermark semantics on public PySpark.

The reference's closed-source EMR engine parses TUMBLING/HOPPING group
keys and `delay(col) < 'duration'` watermarks (emr-baseline-testing/
README.md "Extended Streaming SQL"; queries/q100.sql:33, q101.sql:33,
q102.sql:33). Public-Spark equivalents (SURVEY.md §2.2):

    TUMBLING(col, interval d)            -> window(col, d)
    HOPPING(col, interval d, interval s) -> window(col, d, s)
    delay(col) < 'd'                     -> withWatermark(col, d)

These helpers work identically on batch and streaming DataFrames
(window() is mode-agnostic; withWatermark is a no-op on batch), which
is how the conformance tests equate a replayed stream with its batch
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["tumbling", "hopping", "delay", "windowed_agg", "windowed_value_histogram"]


def tumbling(col: str | Column, duration: str) -> Column:
    """TUMBLING(col, interval duration) group key (epoch-aligned)."""
    return F.window(col, duration)


def hopping(col: str | Column, duration: str, slide: str) -> Column:
    """HOPPING(col, interval duration, interval slide) group key."""
    return F.window(col, duration, slide)


def delay(df: DataFrame, col: str, duration: str) -> DataFrame:
    """delay(col) < 'duration'  ->  event-time watermark.

    On a streaming DataFrame this bounds state and drops rows later
    than `duration` behind max(event time); on batch it is identity
    (matching the reference, where delay() only affects streaming
    state cleanup — README watermark section).
    """
    if df.isStreaming:
        return df.withWatermark(col, duration)
    return df


def windowed_agg(
    df: DataFrame,
    time_col: str,
    duration: str,
    *group_cols: str | Column,
    aggs: list[Column],
    slide: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """The corpus' windowed-aggregate shape: optional watermark, then
    groupBy(window, dims).agg(...), window struct flattened to
    window_start/window_end columns."""
    if watermark is not None:
        df = delay(df, time_col, watermark)
    win = hopping(time_col, duration, slide) if slide else tumbling(time_col, duration)
    out = df.groupBy(win.alias("w"), *group_cols).agg(*aggs)
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def windowed_value_histogram(
    df: DataFrame,
    time_col: str = "ts",
    value_col: str = "value",
    type_col: str = "event_type",
    duration: str = "1 week",
    band_centi: int = 5000,
    watermark: str = "1 hour",
    start_time: str | None = None,
) -> DataFrame:
    """Streaming half of the drift monitor (batch twin:
    operators/events.events_drift_tv): per (window, type, value band)
    event counts, bands on EXACT centi-integers so a streaming run and
    the batch recomputation bin identically. Downstream a foreachBatch
    (or the monitoring query itself) joins the reference histogram and
    cross-multiplies the integer TV distance per window.

    Scale: one windowed aggregate — state is windows x types x bands
    rows (bounded by the watermark), shuffle is map-side combined.
    """
    from aliyun_emapreduce_datasources_spark.operators.common import centi_band

    bucket = centi_band(value_col, band_centi)
    out = delay(df, time_col, watermark)
    return (
        out.groupBy(
            (
                F.window(time_col, duration, duration, start_time)
                if start_time
                else F.window(time_col, duration)
            ).alias("w"),
            F.col(type_col).alias("event_type"),
            bucket.alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "bucket",
            F.col("n").cast("long").alias("n"),
        )
    )
