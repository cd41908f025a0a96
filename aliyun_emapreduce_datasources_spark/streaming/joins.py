"""Streaming join shapes from the corpus (SURVEY.md §2.2).

- Stream-static star join (30 of 34 queries, e.g. q3.sql:28-30): the
  static dimension side is broadcast; no state, no watermark needed.
- Stream-stream event-time interval LEFT OUTER join with dual
  watermarks (q40.sql:26-41): both sides watermarked (`delay(cr) <
  '30 seconds' and delay(cs) < '60 seconds'`), join condition bounds
  event time both ways so Spark can evict state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_static_join", "interval_join"]


def stream_static_join(
    stream_df: DataFrame, static_df: DataFrame, on: Column | list[str], how: str = "inner"
) -> DataFrame:
    """Star-join a stream to a dimension table; dimension broadcast so
    the stream side never shuffles (the 100 TB-fact plan)."""
    return stream_df.join(F.broadcast(static_df), on, how)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    equi_keys: list[tuple[str, str]],
    interval: str,
    left_delay: str,
    right_delay: str,
    how: str = "left_outer",
) -> DataFrame:
    """q40-shaped dual-watermark interval join.

    Condition: equi keys AND right_time in [left_time, left_time +
    interval]. Both sides get watermarks so streaming state is bounded
    (q40.sql:41 `delay(cr_data_time) < '30 seconds' and
    delay(cs_data_time) < '60 seconds'`).
    """
    lw = left.withWatermark(left_time, left_delay) if left.isStreaming else left
    rw = right.withWatermark(right_time, right_delay) if right.isStreaming else right
    # start from the time predicate so an empty equi_keys list yields a
    # pure interval join (None & col would build a NULL condition that
    # silently matches nothing)
    cond = (rw[right_time] >= lw[left_time]) & (
        rw[right_time] <= lw[left_time] + F.expr(f"interval {interval}")
    )
    for lk, rk in equi_keys:
        cond = cond & (lw[lk] == rw[rk])
    return lw.join(rw, cond, how)
