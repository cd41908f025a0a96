"""Streaming space-saving heavy hitters vs exact batch counts.

Guarantee checks (Metwally et al.): coverage of every key with true
count > N_shard/capacity; per-key bounds true <= est <= true + err;
and exactness when capacity >= #distinct keys in the shard.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.streaming.heavy_hitters import (
    heavy_hitters_stream,
)
from aliyun_emapreduce_datasources_spark.streaming.sources import (
    StreamTable,
    replay_to_json_dir,
)
from tests.test_stateful import EVENTS_SCHEMA


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="hh-stream-")
    replay_to_json_dir(t(spark, sf_dir, "events"), d, n_chunks=4, order_col="ts")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, stream_dir, key_col, capacity, n_shards):
    st = StreamTable("events", EVENTS_SCHEMA, stream_dir, {"maxFilesPerTrigger": "1"})
    out = heavy_hitters_stream(
        st.read_stream(spark), key_col=key_col, capacity=capacity, n_shards=n_shards
    )
    name = f"hh_{uuid.uuid4().hex[:8]}"
    q = out.writeStream.format("memory").queryName(name).outputMode("update").start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    snap = spark.table(name).collect()
    last = {}
    for r in snap:
        last[r.shard] = max(last.get(r.shard, 0), r.batch_seq)
    return [r for r in snap if r.batch_seq == last[r.shard]]


def _truth(spark, sf_dir, key_col, n_shards):
    ev = t(spark, sf_dir, "events").select(
        F.col(key_col).cast("string").alias("key"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )
    true_counts = {
        (r.shard, r.key): r.n
        for r in ev.groupBy("shard", "key").agg(F.count("*").alias("n")).collect()
    }
    shard_n = {}
    for (shard, _), n in true_counts.items():
        shard_n[shard] = shard_n.get(shard, 0) + n
    return true_counts, shard_n


def test_exact_when_capacity_covers_distinct(spark, sf_dir, stream_dir):
    # event_type has a handful of distinct values; capacity 32 covers
    # them all => summary must equal exact counts with zero error
    rows = _run(spark, stream_dir, "event_type", capacity=32, n_shards=2)
    true_counts, _ = _truth(spark, sf_dir, "event_type", 2)
    got = {(r.shard, r.key): (r.est, r.err) for r in rows}
    assert got == {k: (n, 0) for k, n in true_counts.items()}


def test_space_saving_guarantees_under_eviction(spark, sf_dir, stream_dir):
    # key = user_id (hundreds of distinct values), tiny capacity =>
    # evictions happen; check the classical guarantees per shard
    cap, shards = 8, 4
    rows = _run(spark, stream_dir, "user_id", capacity=cap, n_shards=shards)
    true_counts, shard_n = _truth(spark, sf_dir, "user_id", shards)
    got = {(r.shard, r.key): (r.est, r.err) for r in rows}

    # bound: true <= est <= true + err for every kept key
    for (shard, key), (est, err) in got.items():
        true = true_counts.get((shard, key), 0)
        assert true <= est <= true + err, (shard, key, true, est, err)

    # coverage: every key with true > N_shard/capacity is kept
    for (shard, key), true in true_counts.items():
        if true > shard_n[shard] / cap:
            assert (shard, key) in got, (shard, key, true)

    # state is bounded
    per_shard = {}
    for shard, _ in got:
        per_shard[shard] = per_shard.get(shard, 0) + 1
    assert all(v <= cap for v in per_shard.values())


def test_fold_differential_random():
    """Randomized differential of the space-saving fold against a
    brute-force simulation of the same merge rule, plus exactness when
    capacity covers the alphabet."""
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    from aliyun_emapreduce_datasources_spark.streaming.heavy_hitters import _fold

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=30),
            min_size=1,
            max_size=6,
        ),
        st.integers(min_value=1, max_value=8),
    )
    def run(batches, cap):
        summary: dict = {}
        truth: dict = {}
        total = 0
        for batch in batches:
            for k in batch:
                truth[k] = truth.get(k, 0) + 1
                total += 1
            if batch:
                _fold(summary, pd.Series(batch).value_counts(), cap)
        assert len(summary) <= cap
        for k, (est, err) in summary.items():
            assert truth[k] <= est <= truth[k] + err, (k, truth[k], est, err)
        # coverage guarantee
        for k, n in truth.items():
            if n > total / cap:
                assert k in summary, (k, n, total, cap)
        # exact when capacity covers every distinct key
        if cap >= len(truth):
            assert {k: v[0] for k, v in summary.items()} == truth
            assert all(v[1] == 0 for v in summary.values())

    run()
