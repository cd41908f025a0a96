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

__all__ = [
    "RunningUserTotals",
    "running_user_totals",
    "OUTPUT_SCHEMA",
    "SessionizerTws",
    "sessionize_tws",
    "UserValueLog",
    "user_value_log",
    "UserTypeCounts",
    "user_type_counts",
]

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


# --- event-time sessionization via named state + event-time timers ----

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_micro", T.LongType()),
        T.StructField("session_end_micro", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_micro", T.LongType()),
        T.StructField("end_micro", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


class SessionizerTws(StatefulProcessor):
    """Event-time gap sessionization on the 4.x API: one ValueState
    holding the open session, an EVENT-TIME TIMER at ``end + gap``
    closing it when the watermark passes (the idiomatic
    transformWithState replacement for applyInPandasWithState's
    timeout-based sessionization in streaming/stateful.py — both
    generations stay available, same migration contract as
    running_user_totals).

    Emission contract (pinned by the differential test): a session is
    emitted exactly once: when its gap timer fires, when a
    later-session row supersedes it, or when a still-in-watermark
    batch reveals it as a separate LATER session (an out-of-order row
    more than gap before the open start closes as its own earlier
    session — interval merge, no in-order-per-key assumption beyond
    what the watermark itself bounds).

    State bound: one (3 longs) ValueState row + one timer per ACTIVE
    key — the state store holds only keys inside the gap horizon, the
    eviction contract that keeps 100 TB ingest bounded."""

    def __init__(self, gap_micro: int):
        self.gap_micro = gap_micro

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.sess = handle.getValueState("sess", SESSION_STATE_SCHEMA, None)

    def _emit(self, key, start, end, n) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start_micro": [start],
                "session_end_micro": [end],
                "n_events": [n],
            }
        )

    def handleInputRows(self, key, rows, timerValues):
        ts_all: list[int] = []
        for pdf in rows:
            ts_all.extend(int(v) for v in pdf["ts_micro"].astype("int64"))
        if not ts_all:
            return
        # a single micro-batch can span MANY sessions for one key, and
        # a still-in-watermark row may even predate the OPEN session by
        # more than the gap — interval-merge handles both: the open
        # state is one weighted interval among the batch's point
        # intervals, sorted and folded through the gap rule, so an
        # out-of-order row > gap below the open start becomes its own
        # closed earlier session instead of silently widening the open
        # one (matches the batch lag-gap twin for any arrival order the
        # watermark admits)
        intervals = [(v, v, 1) for v in ts_all]
        if self.sess.exists():
            start, end, n = self.sess.get()
            self.handle.deleteTimer(self._timer_ms(end))
            intervals.append((int(start), int(end), int(n)))
        intervals.sort()
        start, end, n = intervals[0]
        closed = []
        for s, e, c in intervals[1:]:
            if s > end + self.gap_micro:
                closed.append((start, end, n))
                start, end, n = s, e, c
            else:
                if e > end:
                    end = e
                n += c
        for s, e, c in closed:
            yield self._emit(key, s, e, c)
        self.sess.update((start, end, n))
        self.handle.registerTimer(self._timer_ms(end))

    def _timer_ms(self, end_micro: int) -> int:
        # ms timer granularity: round UP so the timer never fires
        # before the true micro deadline
        return -(-(end_micro + self.gap_micro) // 1000)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self.sess.exists():
            start, end, n = self.sess.get()
            yield self._emit(key, start, end, n)
            self.sess.clear()

    def close(self) -> None:
        pass


def sessionize_tws(
    events: DataFrame, gap: str = "1 hour", delay: str = "10 minutes"
) -> DataFrame:
    """events: streaming DF with (user_id long, ts timestamp)."""
    from pyspark.sql import functions as F

    gap_micro = {"1 hour": 3_600_000_000, "30 minutes": 1_800_000_000}[gap]
    with_micro = events.withWatermark("ts", delay).select(
        "user_id", (F.unix_micros("ts")).alias("ts_micro"), "ts"
    )
    return (
        with_micro.groupBy("user_id")
        .transformWithStateInPandas(
            SessionizerTws(gap_micro),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


# --- ListState value log (protocol coverage: appendList + iterator) ---

LOG_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("sum_micro", T.LongType()),
    ]
)

LOG_STATE_SCHEMA = T.StructType([T.StructField("v_micro", T.LongType())])


class UserValueLog(StatefulProcessor):
    """Append every value (integer micro-units) to a named ListState,
    then RE-READ the whole list each batch to emit count + sum — the
    re-read is deliberate: it drives the paginated listStateGet
    iterator protocol rather than caching a running total, so the
    differential test validates list round-trips, not just appends."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.log = handle.getListState("log", LOG_STATE_SCHEMA, None)

    def handleInputRows(self, key, rows, timerValues):
        new = []
        for pdf in rows:
            new.extend(
                (int(v),)
                for v in (pdf["value"].astype("float64") * 1_000_000)
                .round()
                .astype("int64")
            )
        if new:
            self.log.appendList(new)
        vals = [v[0] for v in self.log.get()]
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_values": [len(vals)],
                "sum_micro": [sum(vals)],
            }
        )

    def close(self) -> None:
        pass


def user_value_log(events: DataFrame) -> DataFrame:
    """events: streaming DF with (user_id long, value double)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserValueLog(),
            outputStructType=LOG_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# --- MapState per-type counters (protocol coverage: map calls) --------

TYPE_COUNT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)

_TYPE_KEY_SCHEMA = T.StructType([T.StructField("event_type", T.StringType())])
_TYPE_VAL_SCHEMA = T.StructType([T.StructField("n", T.LongType())])


class UserTypeCounts(StatefulProcessor):
    """Per-(user, event_type) running counts in a named MapState —
    the sub-keyed state shape (user → {type: count}) that a ValueState
    would force into a full-row rewrite per update. Each batch emits
    the CURRENT count for every type seen in the batch by reading the
    map back (getValue/updateValue/containsKey round-trips), and the
    final snapshot iterates the whole map — together driving the
    MapState message family of the state-server protocol."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.counts = handle.getMapState(
            "counts", _TYPE_KEY_SCHEMA, _TYPE_VAL_SCHEMA, None
        )

    def handleInputRows(self, key, rows, timerValues):
        batch: dict[str, int] = {}
        for pdf in rows:
            for et in pdf["event_type"]:
                if et is not None:
                    batch[et] = batch.get(et, 0) + 1
        out_types, out_counts = [], []
        for et, add in sorted(batch.items()):
            cur = (
                self.counts.getValue((et,))[0]
                if self.counts.containsKey((et,))
                else 0
            )
            self.counts.updateValue((et,), (cur + add,))
            out_types.append(et)
            out_counts.append(cur + add)
        if out_types:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_types),
                    "event_type": out_types,
                    "n": out_counts,
                }
            )

    def close(self) -> None:
        pass


def user_type_counts(events: DataFrame) -> DataFrame:
    """events: streaming DF with (user_id long, event_type string)."""
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            UserTypeCounts(),
            outputStructType=TYPE_COUNT_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
