"""Streaming per-key EWMA anomaly detection via
``applyInPandasWithState`` — the streaming twin of the batch
trailing-baseline monitor (operators/events.events_error_anomaly).

Maintains, per event_type, an exponentially-weighted moving average of
`value` and of the absolute deviation, both as EXACT integer millis
with alpha = 1/8 folded into integer arithmetic:

    ewma'  = (x + 7*ewma)  DIV 8
    adev'  = (|x - ewma| + 7*adev) DIV 8
    anomaly iff |x - ewma| > K * adev   (strictly, using the PRE-update
    baseline — the event is judged against history, not itself)

Integer recursion means a replayed stream reproduces flags
byte-for-byte (no float accumulation drift), and the pure-Python
differential in tests/test_ewma.py can assert exact equality.

Scale shape: state is 3 longs per key; events are processed in
(ts, event_id) order WITHIN each batch and batches arrive in
watermark order per key, so the recursion order is total and
deterministic. One shuffle on the key per micro-batch — the same cost
as any keyed stateful op.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["ewma_anomaly_stream", "ewma_step", "EWMA_OUTPUT_SCHEMA"]

ALPHA_DEN = 8  # alpha = 1/8
K_SIGMA = 4

EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("val_milli", T.LongType()),
        T.StructField("ewma_milli", T.LongType()),
        T.StructField("adev_milli", T.LongType()),
        T.StructField("is_anomaly", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("ewma", T.LongType()),
        T.StructField("adev", T.LongType()),
    ]
)


def ewma_step(n: int, ewma: int, adev: int, x: int) -> tuple[int, int, int, bool]:
    """One recursion step (shared by the stream op and the reference
    differential): returns (n', ewma', adev', is_anomaly). The first
    observation seeds the baseline and is never anomalous."""
    if n == 0:
        return 1, x, 0, False
    dev = abs(x - ewma)
    # judged against the PRE-update baseline; warmup (n < 8) never flags
    is_anom = n >= ALPHA_DEN and dev > K_SIGMA * adev
    ewma2 = (x + (ALPHA_DEN - 1) * ewma) // ALPHA_DEN
    adev2 = (dev + (ALPHA_DEN - 1) * adev) // ALPHA_DEN
    return n + 1, ewma2, adev2, is_anom


def ewma_anomaly_stream(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Append-mode stream of every event with its EWMA baseline and
    anomaly flag."""
    src = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).cast("long").alias("event_id"),
        (F.col(value_col).cast("decimal(18,6)") * 1000).cast("long").alias("val_milli"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        n, ewma, adev = state.get if state.exists else (0, 0, 0)
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"])
            for _, r in batch.iterrows():
                x = int(r["val_milli"])
                pre_e, pre_d = ewma, adev
                n, ewma, adev, is_anom = ewma_step(n, ewma, adev, x)
                rows.append((k, int(r["event_id"]), x, pre_e, pre_d, is_anom))
        state.update((n, ewma, adev))
        yield pd.DataFrame(
            rows,
            columns=[
                "event_type",
                "event_id",
                "val_milli",
                "ewma_milli",
                "adev_milli",
                "is_anomaly",
            ],
        )

    return src.groupBy("key").applyInPandasWithState(
        fn,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
