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
