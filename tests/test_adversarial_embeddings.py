"""Adversarial-embeddings differential suite — the third leg next to
the NULL and adversarial-values suites, which perturb only events and
documents: until now NOTHING stressed the embeddings table, yet an
entire operator family (similarity/, eval metrics, embedding dedup)
quantizes it with ``floor(double(x)·1e6)`` and claims bit-exact
parity.

A deterministic ~3% of embedding components is replaced with values
chosen to sit exactly on the quantization recipe's fault lines while
staying INSIDE its documented budget (the operators guard, not
handle, magnitudes beyond it):

- ``-0.0`` / ``0.0``           — signed zero must quantize to the same 0
- ``1e-7`` / ``-1e-7``         — below the micro quantum; floor(-1e-1) = -1
                                  (negatives round AWAY from zero — the
                                  asymmetry a truncation-based port gets wrong)
- ``5e-323`` (denormal)        — subnormal doubles through float32→double
- ``±10.0``                    — 20× the organic range: q = ±1e7, pair dots
                                  64·1e14 = 6.4e15 — still < 2⁵³, so DuckDB's
                                  double list_inner_product stays exact
- ``0.4999995`` (half-micro)   — the .5-micro rounding boundary

Every oracled entry whose oracle touches ``embeddings`` must still
match DuckDB byte-for-byte on the perturbed table. NOTE: values are
written through float32 (the column's physical type) so both engines
read the identical bit pattern.
"""

from __future__ import annotations

import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aliyun_emapreduce_datasources_spark.operators.catalog import ORACLES, QUERIES
from aliyun_emapreduce_datasources_spark.registry import TABLES
from test_oracle_parity import assert_frames_match

ADV_EVERY = 33  # ~3% of components

ADV_COMPONENTS = np.array(
    [-0.0, 0.0, 1e-7, -1e-7, 5e-323, 10.0, -10.0, 0.4999995],
    dtype=np.float32,
)


def _rewrite_embeddings(src: str, dst: str) -> int:
    t = pq.read_table(src)
    ids = t.column("vec_id").to_numpy()
    vecs = t.column("embedding").to_pylist()
    n_hit = 0
    for row_i, (vid, vec) in enumerate(zip(ids, vecs)):
        for j in range(len(vec)):
            # deterministic multiplicative-hash coin per (vec, dim)
            h = (np.uint64(vid * 64 + j) * np.uint64(2654435761)) % ADV_EVERY
            if h == 0:
                vec[j] = float(
                    ADV_COMPONENTS[(vid * 64 + j) % len(ADV_COMPONENTS)]
                )
                n_hit += 1
        vecs[row_i] = vec
    arr = pa.array(vecs, type=t.schema.field("embedding").type)
    t = t.set_column(
        t.schema.get_field_index("embedding"), t.schema.field("embedding"), arr
    )
    pq.write_table(t, dst)
    return n_hit


@pytest.fixture(scope="module")
def adv_emb_dir(sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adv-emb-sf"))
    for name in TABLES:
        src = os.path.join(sf_dir, f"{name}.parquet")
        dst = os.path.join(d, f"{name}.parquet")
        if name == "embeddings":
            n = _rewrite_embeddings(src, dst)
            assert n > 0, "no adversarial components injected"
        else:
            shutil.copyfile(src, dst)
    return d


@pytest.fixture(scope="module")
def adv_emb_oracle(adv_emb_dir):
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{adv_emb_dir}/{name}.parquet'"
        )
    yield con
    con.close()


EMB_ORACLED = sorted(
    n
    for n, sql in ORACLES.items()
    if sql is not None and re.search(r"\bembeddings\b", sql)
)


@pytest.mark.parametrize("name", EMB_ORACLED)
def test_oracled_entry_parity_under_adversarial_embeddings(
    spark, adv_emb_dir, adv_emb_oracle, name
):
    spark_pdf = QUERIES[name](spark, adv_emb_dir).toPandas()
    oracle_pdf = adv_emb_oracle.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, f"{name}[adv-emb]")


# rows-only embedding entries (approximate ANN variants, kmeans):
# must not crash on the perturbed vectors, and the numpy kernels'
# int64 overflow guards must NOT fire at the ±10 band
EMB_ROWS_ONLY = [
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_int8_topk",
    "ann_pq_topk",
    "dedup_embedding_cosine",
    "emb_kmeans_train",
    "dedup_semantic",
]


@pytest.mark.parametrize("name", [n for n in EMB_ROWS_ONLY if n in QUERIES])
def test_rows_only_embedding_entry_survives(spark, adv_emb_dir, name):
    # collect(), not count(): materialize every column so pandas-UDF
    # work can't be pruned away
    assert len(QUERIES[name](spark, adv_emb_dir).collect()) >= 0
