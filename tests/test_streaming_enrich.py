"""Streaming event enrichment against a TEMPORAL (SCD2) dimension:
each micro-batch joins events to the dimension version that was
active at the event's timestamp (valid_from <= ts < valid_to) via
foreachBatch — the production pattern for "enrich the stream with the
dimension as of event time" (the Kudu-CDC + Delta-CDC composition:
KuduUpdatableRelation.scala:39-73 op-column merges feeding a versioned
dimension, applied stream-side).

Correctness bar: the union of all per-batch enrichments equals the
one-shot batch enrichment of the full event table — enrichment must
not depend on micro-batch boundaries (the dimension is static here;
for a dimension that itself streams, the watermark interval-join twin
in streaming/joins.py applies).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.sources.cdc import scd2_history
from aliyun_emapreduce_datasources_spark.streaming.sources import (
    StreamTable,
    replay_to_json_dir,
)
from tests.test_stateful import EVENTS_SCHEMA


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="enrich-stream-")
    replay_to_json_dir(t(spark, sf_dir, "events"), d, n_chunks=4, order_col="ts")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _dimension(spark):
    """SCD2 user-tier dimension from a CDC log: users change tier over
    January; DELETE closes u2's history mid-month."""
    rows = [
        (1, "bronze", "PUT", "2024-01-01 00:00:00"),
        (1, "silver", "UPDATE", "2024-01-10 00:00:00"),
        (1, "gold", "UPDATE", "2024-01-20 00:00:00"),
        (2, "bronze", "PUT", "2024-01-05 00:00:00"),
        (2, None, "DELETE", "2024-01-15 00:00:00"),
    ]
    log = spark.createDataFrame(
        rows, schema="user_mod long, tier string, op string, seq string"
    ).withColumn("seq", F.col("seq").cast("timestamp"))
    return scd2_history(log, ["user_mod"], "op", "seq")


def _enrich(events, dim):
    e = events.withColumn("user_mod", F.pmod(F.col("user_id"), F.lit(2)) + 1)
    cond = (
        (e.user_mod == dim.user_mod)
        & (e.ts >= dim.valid_from)
        & (dim.valid_to.isNull() | (e.ts < dim.valid_to))
    )
    return e.join(dim, cond, "left").select(
        "event_id", e.user_mod.alias("um"), "tier"
    )


def test_stream_scd2_enrichment_matches_batch(spark, sf_dir, stream_dir):
    dim = _dimension(spark)
    assert dim.count() == 4  # DELETE row itself excluded, closes u2

    st = StreamTable("events", EVENTS_SCHEMA, stream_dir, {"maxFilesPerTrigger": "1"})
    name = f"enr_{uuid.uuid4().hex[:8]}"
    acc = []

    def enrich_batch(batch_df, batch_id):
        acc.append({(r.event_id, r.um, r.tier) for r in _enrich(batch_df, dim).collect()})

    q = st.read_stream(spark).writeStream.foreachBatch(enrich_batch).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = set().union(*acc) if acc else set()
    want = {
        (r.event_id, r.um, r.tier)
        for r in _enrich(t(spark, sf_dir, "events"), dim).collect()
    }
    assert got == want
    # sanity on temporal semantics: events before any version exist
    tiers = {x[2] for x in want}
    assert None in tiers and {"bronze", "silver", "gold"} <= tiers
