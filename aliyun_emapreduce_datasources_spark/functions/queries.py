"""Aggregated (QUERIES, ORACLES) for the functions package."""

from __future__ import annotations

from aliyun_emapreduce_datasources_spark.functions import (
    bm25,
    bpe_train,
    hybrid,
    keyness,
    lm,
    sketch,
    text,
    vocab,
)

QUERIES = {
    **text.QUERIES,
    **vocab.QUERIES,
    **lm.QUERIES,
    **sketch.QUERIES,
    **bm25.QUERIES,
    **hybrid.QUERIES,
    **bpe_train.QUERIES,
    **keyness.QUERIES,
}
ORACLES = {
    **text.ORACLES,
    **vocab.ORACLES,
    **lm.ORACLES,
    **sketch.ORACLES,
    **bm25.ORACLES,
    **hybrid.ORACLES,
    **bpe_train.ORACLES,
    **keyness.ORACLES,
}
