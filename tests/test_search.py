"""Materialized inverted index: lookups must be partition-pruned to
the term's hash bucket and agree exactly with corpus re-scans."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.bm25 import QUERY_TERMS, bm25_topk
from aliyun_emapreduce_datasources_spark.functions.text import tokens
from aliyun_emapreduce_datasources_spark.operators.common import t
from aliyun_emapreduce_datasources_spark.operators.search import (
    bm25_lookup,
    build_inverted_index,
    lookup_term,
)


def _index(spark, sf_dir, tmp_path) -> str:
    dst = str(tmp_path / "idx")
    build_inverted_index(t(spark, sf_dir, "documents").select("doc_id", "text"), dst)
    return dst


def test_lookup_matches_rescan_and_prunes_partitions(spark, sf_dir, tmp_path):
    idx = _index(spark, sf_dir, tmp_path)
    got = {(r.doc_id, r.tf) for r in lookup_term(spark, idx, "hash").collect()}
    tok = tokens("text")
    want = {
        (r.doc_id, r.tf)
        for r in t(spark, sf_dir, "documents")
        .select("doc_id", F.explode(tok).alias("term"))
        .where(F.col("term") == "hash")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .collect()
    }
    assert got == want and got
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        lookup_term(spark, idx, "hash").explain(mode="formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "bucket" in plan, plan


def test_bm25_from_index_equals_corpus_scan(spark, sf_dir, tmp_path):
    idx = _index(spark, sf_dir, tmp_path)
    from_index = [
        (r.doc_id, r.score_micro, r.n_terms_hit)
        for r in bm25_lookup(spark, idx, list(QUERY_TERMS), top_n=15).collect()
    ]
    from_scan = [
        (r.doc_id, r.score_micro, r.n_terms_hit)
        for r in bm25_topk(spark, sf_dir).collect()
    ]
    assert from_index == from_scan
