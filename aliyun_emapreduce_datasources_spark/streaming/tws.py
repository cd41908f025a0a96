"""transformWithStateInPandas operators — the Spark 4.x arbitrary-
stateful-processing API (SPARK-46815, successor of
applyInPandasWithState): explicit named state variables with optional
TTL instead of a single opaque GroupState.

Reference parity: the reference's stateful surface is the closed EMR
engine's streaming SQL; our engine keeps both generations of the
public API — `streaming/stateful.py` (applyInPandasWithState
sessionization, the Spark 3.x shape) and this module (the 4.x shape)
— so users can migrate either direction.

`RunningUserTotals`: per-user running event count + value total in a
ValueState, emitted per micro-batch (update semantics). The TTL knob
bounds state for abandoned keys — at 100 TB-scale ingest the state
store only holds users active within the TTL horizon, the same
state-eviction contract `dropDuplicatesWithinWatermark` and
watermarked windows give the other streaming entries.

Determinism: totals are accumulated in integer micro-units
(value × 1e6 rounded), so replay/partition order cannot perturb the
emitted doubles — the same decimal-exact convention as
operators/common.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

__all__ = ["RunningUserTotals", "running_user_totals", "OUTPUT_SCHEMA"]

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_micro", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_micro", T.LongType()),
    ]
)


class RunningUserTotals(StatefulProcessor):
    """Named-ValueState running aggregate per grouping key."""

    def __init__(self, ttl_ms: int | None = None):
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.totals = handle.getValueState("totals", STATE_SCHEMA, self.ttl_ms)

    def handleInputRows(self, key, rows, timerValues):
        if self.totals.exists():
            n, total = self.totals.get()
        else:
            n, total = 0, 0
        for pdf in rows:
            n += len(pdf)
            # round each VALUE to micro-units, then sum integers:
            # rounding the float per-chunk sum instead would make the
            # total depend on Arrow batch boundaries (replay /
            # repartition could split chunks differently and flip the
            # last digit) — per-value rounding is order-free
            total += int(
                (pdf["value"].astype("float64") * 1_000_000)
                .round()
                .astype("int64")
                .sum()
            )
        self.totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_micro": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """events: streaming DF with (user_id long, value double)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningUserTotals(ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
