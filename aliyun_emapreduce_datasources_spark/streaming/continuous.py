"""Continuous-processing conformance path (S10).

Reference: LoghubContinuousReader.scala:38-294 and
DatahubContinuousReader.scala implement DSv2 ContinuousReader — the
epoch-based ~1 ms-latency execution mode, restricted (like all of
Spark's continuous processing) to map-only pipelines: projections,
filters, and per-row transforms, no aggregations or joins.

Public-Spark mapping: the same engine those readers plug into ships in
Spark as `trigger(continuous=...)` over the built-in continuous-capable
sources (Kafka, rate). Our Python connectors (sources/pyds.py) are
micro-batch by design — the `pyspark.sql.datasource` API deliberately
exposes no continuous reader contract — so S10 is served by Spark's
built-in continuous engine, not re-implemented: a user with a
sub-100 ms pipeline points the same DataFrame code at the Kafka source
with a continuous trigger; everything else in this repo (watermarks,
windowed aggs, stateful sessions) is outside continuous mode's
operator whitelist *by Spark's own contract*, exactly as it is outside
the reference's ContinuousReader deployments.

`start_continuous` is the thin, tested entry point proving the engine
path works end to end (rate source → map-only transform → sink) with
epoch checkpointing.

Deployment note: continuous mode schedules one LONG-RUNNING task per
source partition for the lifetime of the query — size the cluster (or
local[] core count) for #partitions + whatever else must run; a query
whose partitions equal the core count starves every other job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

__all__ = ["start_continuous"]


def start_continuous(
    df: DataFrame,
    *,
    queryName: str,
    checkpointLocation: str,
    interval: str = "1 second",
    sink_format: str = "memory",
    outputMode: str = "append",
) -> StreamingQuery:
    """Start a map-only streaming plan under the continuous trigger.

    The plan must satisfy continuous mode's whitelist (select / where /
    map-like only); Spark raises AnalysisException otherwise, which is
    the correct conformance signal — callers needing aggregation use
    the micro-batch path.
    """
    return (
        df.writeStream.format(sink_format)
        .queryName(queryName)
        .option("checkpointLocation", checkpointLocation)
        .outputMode(outputMode)
        .trigger(continuous=interval)
        .start()
    )
