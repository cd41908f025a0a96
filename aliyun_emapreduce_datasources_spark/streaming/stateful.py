"""Custom stateful streaming operator: event-time session windows via
``applyInPandasWithState``.

The reference's streaming engine has no session operator (its corpus
uses only TUMBLING/HOPPING — SURVEY.md §2.2); session windows are the
canonical *custom* stateful operator a training-data/clickstream
pipeline adds, and ``applyInPandasWithState`` is the public-Spark
escape hatch for exactly this (arbitrary per-key state + event-time
timeout).

Semantics (matching the batch lag-gap twin,
operators/analytic.win_sessionize): a session is a maximal run of a
user's events where consecutive gaps are ≤ gap; a session CLOSES when
the watermark passes session_end + gap, at which point one row
(user_id, session_start, session_end, n_events) is emitted
(append-mode output). In-flight sessions stay in state — bounded by
(#active users × 3 longs), the 100 TB-honest state size.

State transition per micro-batch: merge the batch's (min ts, max ts,
count) into the open session if it overlaps within gap, else emit the
old session inline and start a new one (batch boundaries are
watermark-ordered per key, so cross-batch merges only ever touch the
single open session).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["sessionize_stream", "SESSION_OUTPUT_SCHEMA", "growth_classify_stream", "GROWTH_OUTPUT_SCHEMA"]

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# The stateful operator emits epoch-micros LONGS, not timestamps: a
# TimestampType column in applyInPandasWithState output is treated as
# the operator's event-time and append mode drops rows behind the
# watermark — which closed sessions always are (they close BECAUSE the
# watermark passed end+gap). The timestamps are reconstructed in a
# projection after the stateful exec, outside the late-row filter.
_RAW_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events) stream of CLOSED
    sessions (append mode) from an event stream."""
    n, unit = gap.split(" ")
    gap_us = int(n) * {"seconds": 1, "minutes": 60, "hours": 3600}[unit.rstrip("s") + "s"] * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        if state.hasTimedOut:
            start_us, end_us, cnt = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user],
                    "start_us": [start_us],
                    "end_us": [end_us],
                    "n_events": [cnt],
                }
            )
            return

        closed: list[tuple[int, int, int]] = []
        late: list[tuple[int, int, int]] = []
        cur = state.get if state.exists else None

        def reconcile(cur, late):
            """Cascade-merge late sessions into cur: merging an event
            into cur can extend cur DOWNWARD, bringing previously
            gap-separated late sessions within range — and each merge
            can enable the next, so iterate to fixpoint. Without this
            a late event within gap of the finally-extended session is
            emitted as a spurious singleton (batch lag-gap semantics
            would have merged it)."""
            changed = True
            while changed and late:
                changed = False
                keep = []
                for s in late:
                    if s[0] - gap_us <= cur[1] and cur[0] <= s[1] + gap_us:
                        cur = (min(s[0], cur[0]), max(s[1], cur[1]), s[2] + cur[2])
                        changed = True
                    else:
                        keep.append(s)
                late = keep
            return cur, late

        for pdf in pdfs:
            if pdf.empty:
                continue
            # datetime64[ns] → int64 microseconds
            ts_us = (pdf[ts_col].astype("int64") // 1000).sort_values().to_numpy()
            for t_us in ts_us:
                t_us = int(t_us)
                if cur is None:
                    cur = (t_us, t_us, 1)
                elif cur[0] - gap_us <= t_us <= cur[1] + gap_us:
                    # interval merge (min/max): correct for in-window
                    # out-of-order arrivals, not just ascending input
                    cur = (min(cur[0], t_us), max(cur[1], t_us), cur[2] + 1)
                elif t_us > cur[1] + gap_us:
                    # reconcile pending late sessions against the
                    # session being closed — its min may have moved
                    # down since they were set aside
                    cur, late = reconcile(cur, late)
                    closed.append(cur)
                    cur = (t_us, t_us, 1)
                else:
                    # entirely before the open session: an earlier,
                    # gap-separated session. Merge consecutive late
                    # events among themselves (interval merge against
                    # every candidate, coalescing chains) so two late
                    # events within gap yield ONE session — the batch
                    # lag-gap semantics (win_sessionize).
                    merged = (t_us, t_us, 1)
                    keep: list[tuple[int, int, int]] = []
                    for s in late:
                        if s[0] - gap_us <= merged[1] and merged[0] <= s[1] + gap_us:
                            merged = (
                                min(s[0], merged[0]),
                                max(s[1], merged[1]),
                                s[2] + merged[2],
                            )
                        else:
                            keep.append(s)
                    keep.append(merged)
                    late = keep
        if cur is not None:
            cur, late = reconcile(cur, late)
        closed.extend(late)
        if cur is not None:
            deadline_ms = cur[1] // 1000 + gap_us // 1000
            if deadline_ms <= state.getCurrentWatermarkMs():
                # watermark already passed end+gap (late-but-in-window
                # data): the session is closed as of this batch
                closed.append(cur)
                if state.exists:
                    state.remove()
            else:
                state.update(cur)
                # close when the event-time watermark passes end + gap
                state.setTimeoutTimestamp(deadline_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user] * len(closed),
                    "start_us": [s for s, _, _ in closed],
                    "end_us": [e for _, e, _ in closed],
                    "n_events": [c for _, _, c in closed],
                }
            )

    raw = (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=_RAW_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return raw.select(
        "user_id",
        F.timestamp_micros("start_us").alias("session_start"),
        F.timestamp_micros("end_us").alias("session_end"),
        "n_events",
    )


# --- weekly growth-accounting classifier (streaming twin) ---------------

GROWTH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("week", T.LongType()),
        T.StructField("cls", T.StringType()),
    ]
)

_GROWTH_STATE_SCHEMA = T.StructType([T.StructField("last_w", T.LongType())])


def growth_classify_stream(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of events_growth_accounting's classification leg:
    per user, each NEWLY active week is emitted exactly once as
    (user_id, week, cls) with cls ∈ {new, retained, resurrected} — the
    growth-accounting flows maintained ON INGEST, so the weekly
    new/retained/resurrected rollup is a plain downstream count by
    (week, cls) instead of a nightly batch over all history.

    State is ONE int64 per user (the last active week) — the minimal
    possible, and strictly smaller than the sessionizer's 3 longs; no
    timeout is needed because the state never grows per event.

    Contract (same as the batch twin's lag semantics): week indices
    arrive non-decreasing per user. The replay harness's ts-ordered
    chunks guarantee it; a week arriving ≤ the recorded last week is a
    duplicate of an already-classified week and is skipped, while a
    genuinely out-of-order EARLIER week (possible only past the
    watermark) is a batch-reconciliation concern, the repo's standard
    ingest-dedup discipline (streaming/ingest.py)."""
    weeks = events.withWatermark(ts_col, watermark_delay).select(
        F.col(user_col).alias("user_id"),
        F.expr(f"unix_date(to_date({ts_col})) DIV 7").cast("long").alias("week"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        last_w = state.get[0] if state.exists else None
        out_w: list[int] = []
        out_c: list[str] = []
        ws = sorted({int(w) for pdf in pdfs for w in pdf["week"].tolist()})
        for w in ws:
            if last_w is None:
                cls = "new"
            elif w <= last_w:
                continue  # duplicate of an already-classified week
            elif w == last_w + 1:
                cls = "retained"
            else:
                cls = "resurrected"
            out_w.append(w)
            out_c.append(cls)
            last_w = w
        if last_w is not None:
            state.update((int(last_w),))
        if out_w:
            yield pd.DataFrame(
                {"user_id": [user] * len(out_w), "week": out_w, "cls": out_c}
            )

    return weeks.groupBy("user_id").applyInPandasWithState(
        fn,
        GROWTH_OUTPUT_SCHEMA,
        _GROWTH_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
