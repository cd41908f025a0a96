"""Streaming query metrics capture (reference S29 parity, re-homed).

The reference ships a Kafka *client* metrics reporter that forwards
consumer/producer metrics to a topic (emr-kafka/.../
EMRClientMetricsReporter.java — not a datasource, SURVEY.md §2.1 S29).
The Spark-native equivalent of "operational metrics as a queryable
stream" is the StreamingQueryListener: every micro-batch already
emits rows/s, input counts, and stage durations; this module collects
those progress events and exposes them as a DataFrame so the same
engine that runs the pipeline can monitor it (lag dashboards, rate
alerts, backpressure checks).

Scale note: progress events are driver-side, one small dict per
micro-batch per query — collecting them is O(batches), independent of
data volume. The DataFrame conversion happens only when asked.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQueryListener

__all__ = ["StreamingMetricsCollector", "METRICS_SCHEMA"]

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("query_name", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("num_input_rows", T.LongType()),
        T.StructField("input_rows_per_second", T.DoubleType()),
        T.StructField("processed_rows_per_second", T.DoubleType()),
        T.StructField("trigger_execution_ms", T.LongType()),
        T.StructField("add_batch_ms", T.LongType()),
        T.StructField("num_state_rows", T.LongType()),
        T.StructField("num_rows_dropped_by_watermark", T.LongType()),
    ]
)


class StreamingMetricsCollector(StreamingQueryListener):
    """Collects per-batch progress for every query on the session.

    Usage::

        mc = StreamingMetricsCollector.install(spark)
        ... run queries ...
        mc.to_df(spark)   # metrics as a DataFrame
        mc.uninstall(spark)
    """

    def __init__(self) -> None:
        self._rows: list[tuple] = []
        self._lock = threading.Lock()

    # -- listener callbacks -------------------------------------------

    def onQueryStarted(self, event) -> None:
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        ops = p.stateOperators or []
        state_rows = sum((s.numRowsTotal or 0) for s in ops)
        dropped = sum((s.numRowsDroppedByWatermark or 0) for s in ops)
        dur = p.durationMs or {}
        with self._lock:
            self._rows.append(
                (
                    str(p.id),
                    p.name,
                    p.batchId,
                    p.timestamp,
                    p.numInputRows,
                    _nan_to_none(p.inputRowsPerSecond),
                    _nan_to_none(p.processedRowsPerSecond),
                    dur.get("triggerExecution"),
                    dur.get("addBatch"),
                    state_rows,
                    dropped,
                )
            )

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    # -- surface -------------------------------------------------------

    def snapshot(self) -> list[tuple]:
        with self._lock:
            return list(self._rows)

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.snapshot(), METRICS_SCHEMA)

    @classmethod
    def install(cls, spark: SparkSession) -> "StreamingMetricsCollector":
        mc = cls()
        spark.streams.addListener(mc)
        return mc

    def uninstall(self, spark: SparkSession) -> None:
        spark.streams.removeListener(self)


def _nan_to_none(v):
    if v is None:
        return None
    try:
        return None if v != v else float(v)
    except TypeError:
        return None
