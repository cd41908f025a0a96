"""Streaming heavy hitters: sharded space-saving summaries via
``applyInPandasWithState``.

The batch twin is ``functions/sketch.py`` (count-min top-k). On a
stream you want the frequent-items table to be maintained
INCREMENTALLY with bounded state — the classic answer is the
space-saving summary (Metwally et al. 2005), which keeps at most
``capacity`` (key, count, error) entries and guarantees:

- every key with true frequency > N/capacity is in the summary;
- for every kept key: true_count <= est_count <= true_count + error.

Scale shape: ONE global summary would funnel the stream through a
single task, so the operator shards by ``hash(key) % n_shards`` and
keeps an independent summary per shard — per-shard state is a fixed
``3 x capacity`` array struct (bounded, watermark-free), shards run in
parallel, and the per-key guarantee still holds globally because a key
lives in exactly one shard (its per-shard frequency IS its global
frequency, and shard N_shard <= N). Per micro-batch the batch's counts
are folded in with the mergeable-summaries rule (add if present; else
evict the min entry, inheriting its count as error).

Emission: Update mode — each batch yields the shard's current summary
(shard, key, est, err). Readers take the latest batch per shard and
union shards for the global table; the test asserts both guarantees
against exact batch counts, and exactness when capacity >= #distinct.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["heavy_hitters_stream", "HH_OUTPUT_SCHEMA"]

HH_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType()),
        T.StructField("batch_seq", T.LongType()),
        T.StructField("key", T.StringType()),
        T.StructField("est", T.LongType()),
        T.StructField("err", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("keys", T.ArrayType(T.StringType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errors", T.ArrayType(T.LongType())),
    ]
)


def _fold(summary: dict, batch_counts, capacity: int) -> None:
    """Fold (key -> c) batch counts (any mapping with .items()) into
    {key: [est, err]} in place,
    space-saving eviction: deterministic iteration order (key-sorted)
    so replays reproduce the identical summary."""
    for key, c in sorted(batch_counts.items()):
        c = int(c)
        if key in summary:
            summary[key][0] += c
        elif len(summary) < capacity:
            summary[key] = [c, 0]
        else:
            # evict the min-count entry (ties: lexicographically
            # smallest key — deterministic)
            mk = min(summary, key=lambda k: (summary[k][0], k))
            m = summary.pop(mk)[0]
            summary[key] = [m + c, m]


def heavy_hitters_stream(
    events: DataFrame,
    key_col: str = "event_type",
    capacity: int = 8,
    n_shards: int = 4,
) -> DataFrame:
    """(shard, batch_seq, key, est, err) stream of per-shard summary
    snapshots in Update mode; take max(batch_seq) per shard for the
    current global frequent-items table."""
    sharded = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            seq, keys, counts, errors = state.get
            summary = {k: [int(c), int(e)] for k, c, e in zip(keys, counts, errors)}
        else:
            seq, summary = 0, {}
        # accumulate the WHOLE micro-batch before folding: Arrow chunk
        # boundaries (and their row order) are nondeterministic, so a
        # per-chunk fold would evict differently across replays — one
        # combined fold per batch is what makes recovery reproducible
        batch_counts: dict = {}
        for pdf in pdfs:
            for k, c in pdf["key"].value_counts().items():
                batch_counts[k] = batch_counts.get(k, 0) + int(c)
        if batch_counts:
            _fold(summary, batch_counts, capacity)
        seq += 1
        ks = sorted(summary)
        state.update((seq, ks, [summary[k][0] for k in ks], [summary[k][1] for k in ks]))
        yield pd.DataFrame(
            {
                "shard": [shard] * len(ks),
                "batch_seq": [seq] * len(ks),
                "key": ks,
                "est": [summary[k][0] for k in ks],
                "err": [summary[k][1] for k in ks],
            }
        )

    return sharded.groupBy("shard").applyInPandasWithState(
        fn,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
