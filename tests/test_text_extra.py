"""Pinned-value test for the zlib compression-ratio quality signal
(engine-hashed → no DuckDB oracle; the driver records a rows-only
check, this test supplies the value-level evidence)."""

from __future__ import annotations

import zlib

from aliyun_emapreduce_datasources_spark.operators.catalog import QUERIES
from aliyun_emapreduce_datasources_spark.operators.common import t


def test_compression_ratio_matches_direct_zlib(spark, sf_dir):
    got = {
        r.doc_id: r for r in QUERIES["text_compression_ratio"](spark, sf_dir).collect()
    }
    docs = t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(got) == len(docs)
    for row in docs:
        raw = row.text.encode("utf-8")
        want_c = len(zlib.compress(raw, 6))
        g = got[row.doc_id]
        assert g.n_bytes == len(raw)
        assert g.n_compressed == want_c
        assert abs(g.ratio - want_c / len(raw)) < 1e-12
        assert g.keep == (0.1 < g.ratio < 0.6)


def test_cms_never_underestimates_and_bounds_error(spark, sf_dir):
    """CMS invariants on real data: est >= true for every probed
    token; and with d=4 rows the min-estimate should stay within
    2*N/w of truth (loose 2x slack on the epsilon bound)."""
    from aliyun_emapreduce_datasources_spark.functions import sketch as sk

    rows = sk.cms_estimate_topk(spark, sf_dir).collect()
    assert rows
    n_total = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr("sum(size(split(text, ' '))) AS n")
        .collect()[0].n
    )
    for r in rows:
        assert r.est_c >= r.true_c, f"CMS underestimated {r.token}"
        assert r.est_c - r.true_c <= 2 * n_total / sk.W_BUCKETS, (
            f"CMS error blown for {r.token}: {r.est_c} vs {r.true_c}"
        )


def test_bm25_ranks_multi_term_docs_over_saturated_single_term(spark, tmp_path):
    """BM25 semantics: a doc hitting all query terms once beats a doc
    repeating one term (tf saturation), and a doc with no query terms
    never appears."""
    from aliyun_emapreduce_datasources_spark.functions.bm25 import bm25_topk

    filler = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, f"hash join scan {filler}"),          # all three terms
        (2, f"hash hash hash hash {filler}"),     # one term, saturated
        (3, f"join {filler}"),                    # one term once
        (4, filler),                              # no terms
        (5, f"hash join {filler} scan scan"),     # all terms, extra tf
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/documents.parquet")

    out = bm25_topk(spark, sf_dir).collect()
    order = [r.doc_id for r in out]
    assert 4 not in order
    hits = {r.doc_id: r.n_terms_hit for r in out}
    assert hits[1] == 3 and hits[2] == 1
    assert order.index(1) < order.index(2), order
    assert order.index(5) < order.index(3), order
