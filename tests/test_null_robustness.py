"""NULL-robustness differential suite.

The driver's parquet never carries NULL ``events.value`` or
``documents.text`` — but field data will, and NULL is exactly where
Spark and DuckDB disagree by default (NULLS FIRST vs NULLS LAST window
ordering, null-key join semantics, NULL propagation through
higher-order functions). The round-3 advisor caught two such latent
divergences (events_ks_drift, events_robust_outliers); this suite
generalizes the check instead of waiting for the next one:

- rewrite the sf0.001 tables with a deterministic ~2% of
  ``events.value`` / ``documents.text`` set to NULL (pyarrow rewrite,
  byte-identical schema — timestamps, field order, everything else
  untouched);
- every oracled catalog entry whose oracle SQL touches the nulled
  table must STILL match DuckDB on the nulled data (parity under
  NULLs, not equality with the original results);
- every rows-only entry touching the nulled table must still execute
  (no pandas-UDF crash on None).
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

NULL_EVERY = 50  # ~2% of rows


def _null_mask(ids: np.ndarray) -> np.ndarray:
    # deterministic multiplicative-hash coin on the row id
    return ((ids.astype(np.uint64) * np.uint64(2654435761)) % NULL_EVERY) == 0


def _rewrite_with_nulls(src: str, dst: str, id_col: str, cols: list[str]) -> int:
    t = pq.read_table(src)
    ids = t.column(id_col).to_numpy()
    total = 0
    for i, col in enumerate(cols):
        # distinct offset per column so the null sets don't coincide
        mask = _null_mask(ids + np.int64(i * 7919))
        arr = t.column(col)
        nulled = pa.array(
            [None if m else v for v, m in zip(arr.to_pylist(), mask)],
            type=arr.type,
        )
        t = t.set_column(t.schema.get_field_index(col), t.schema.field(col), nulled)
        total += int(mask.sum())
    pq.write_table(t, dst)
    return total


@pytest.fixture(scope="module")
def nulled_dir(sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nulled-sf"))
    for name in TABLES:
        src = os.path.join(sf_dir, f"{name}.parquet")
        dst = os.path.join(d, f"{name}.parquet")
        if name == "events":
            n = _rewrite_with_nulls(
                src, dst, "event_id", ["value", "props", "user_id", "event_type"]
            )
            assert n > 0, "no NULLs injected into events"
        elif name == "documents":
            n = _rewrite_with_nulls(
                src, dst, "doc_id", ["text", "source", "lang"]
            )
            assert n > 0, "no NULLs injected into documents"
        else:
            shutil.copyfile(src, dst)
    return d


@pytest.fixture(scope="module")
def nulled_oracle(nulled_dir):
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{nulled_dir}/{name}.parquet'"
        )
    yield con
    con.close()


def _touches(sql_or_none: str | None, table: str) -> bool:
    return sql_or_none is not None and re.search(
        rf"\b{table}\b", sql_or_none
    ) is not None


EVENTS_ORACLED = sorted(
    n for n, sql in ORACLES.items() if _touches(sql, "events")
)
DOCS_ORACLED = sorted(
    n for n, sql in ORACLES.items() if _touches(sql, "documents")
)


@pytest.mark.parametrize("name", EVENTS_ORACLED + DOCS_ORACLED)
def test_oracled_entry_parity_under_nulls(spark, nulled_dir, nulled_oracle, name):
    spark_pdf = QUERIES[name](spark, nulled_dir).toPandas()
    oracle_pdf = nulled_oracle.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, f"{name}[nulled]")


# rows-only entries over the nulled tables: must not crash. The text
# family's pandas UDFs see None where they always saw str.
ROWS_ONLY_TOUCHING = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_winnow_fingerprint",
    "dedup_bloom_decontaminate",
    "dedup_minhash_clusters",
    "dedup_scrub_fixpoint",
    "bpe_train_merges",
    "bpe_encode_corpus",
    "text_compression_ratio",
]


@pytest.mark.parametrize("name", ROWS_ONLY_TOUCHING)
def test_rows_only_entry_survives_nulls(spark, nulled_dir, name):
    # collect(), NOT count(): count() lets Catalyst prune every output
    # column, silently skipping the pandas-UDF/expression work under
    # test (a real NULL crash in compression_ratio hid that way)
    assert len(QUERIES[name](spark, nulled_dir).collect()) >= 0


# property-violation / error-bound oracles: their trivial oracles never
# mention a table name, so the auto-derived parity lists above skip
# them — but the guarantees they pin must hold on NULL-bearing data
# too (violations stay EMPTY, matching the empty-set oracle).
PROPERTY_EMPTY_UNDER_NULLS = [
    "dedup_bloom_no_false_negatives",
    "dedup_minhash_precision_check",
    "dedup_winnow_containment_check",
    "dedup_embedding_lsh_precision_check",
    "bpe_roundtrip_check",
    "dedup_simhash_bits_check",
    "dedup_minhash_cluster_containment_check",
    "dedup_scrub_fixpoint_check",
    "distinct_users_hll_bound_check",
    "doc_length_quantiles_rank_check",
    "text_compression_bound_check",
    "distinct_users_sketch_merge_check",
]


@pytest.mark.parametrize("name", PROPERTY_EMPTY_UNDER_NULLS)
def test_property_oracle_empty_under_nulls(spark, nulled_dir, name):
    assert QUERIES[name](spark, nulled_dir).count() == 0


# The four round-9 PROMOTED oracles (dedup/queries.PROMOTED_R09, in
# ORACLES since r09) keep the same NULL-parity treatment they had
# while staged: Spark and DuckDB must agree on the nulled fixture too
# (all four consume documents.text).
from aliyun_emapreduce_datasources_spark.dedup.queries import (  # noqa: E402
    ORACLES as DEDUP_ORACLES,
    PROMOTED_R09,
)


@pytest.mark.parametrize("name", sorted(PROMOTED_R09))
def test_promoted_oracle_parity_under_nulls(
    spark, nulled_dir, nulled_oracle, name
):
    spark_pdf = QUERIES[name](spark, nulled_dir).toPandas()
    oracle_pdf = nulled_oracle.execute(DEDUP_ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, f"{name}[nulled-promoted]")
