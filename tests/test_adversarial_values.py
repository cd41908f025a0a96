"""Adversarial-value differential suite (companion to the NULL suite).

Same engine-parity contract, nastier inputs: a deterministic ~3% of
``events.value`` replaced with signed zero / sub-precision /
decimal-range-edge doubles, and ~3% of ``documents.text`` replaced
with unicode torture strings (emoji, CJK, combining accents, Turkish
dotless-i, zero-width joiners, lone surrogates are excluded — parquet
strings must be valid UTF-8). Every oracled entry touching the table
must still match DuckDB byte-for-byte.

What this pins that the clean driver data cannot:
- signed-zero grouping (Spark normalizes -0.0 into the 0.0 group);
- centi/micro quantization rounding at .005 boundaries and at 1e-7
  (below the quantum);
- decimal(18,6) casts at ±1e9 (inside range, 12 integer digits);
- tokenization / md5 / length semantics over multi-byte, combining,
  and zero-width code points, where JVM and DuckDB could disagree on
  case mapping or grapheme handling (the operators deliberately use
  only locale-insensitive primitives — this suite is the proof).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aliyun_emapreduce_datasources_spark.operators.catalog import ORACLES, QUERIES
from aliyun_emapreduce_datasources_spark.registry import TABLES
from test_null_robustness import DOCS_ORACLED, EVENTS_ORACLED, ROWS_ONLY_TOUCHING
from test_oracle_parity import assert_frames_match

ADV_EVERY = 33  # ~3% of rows

ADV_VALUES = [
    -0.0,
    0.0,
    1e-7,  # below the centi/micro quantum
    0.005,  # half-centi rounding boundary
    -0.005,
    123456789.123456,  # 9 integer digits, full 6-digit fraction
    -987654321.654321,
]

ADV_TEXTS = [
    "emoji \U0001f600\U0001f680 mixed with ascii tokens",
    "combining á é accents and precomposed á é",
    "中文文本 no spaces CJK run",
    # NOTE: capital İ (U+0130) is deliberately absent — lower('İ') is
    # 'i'+U+0307 on the JVM (SpecialCasing) but 'i' in DuckDB (simple
    # mapping); test_lower_special_casing_divergence_is_known pins it.
    "turkish i̇stanbul i̇ dotless ı casing trap",
    "greek ΣΙΓΜΑ Σ sigma and german ß STRASSE",
    "zero​width‍joiners between tokens",
    "mixed    multiple   spaces\tand\ttabs",
    "",  # empty (but not NULL) text
    "a",  # single char, shorter than any shingle/k-gram
]


def _adv_mask(ids: np.ndarray, salt: int) -> np.ndarray:
    return (
        (ids.astype(np.uint64) + np.uint64(salt)) * np.uint64(2654435761)
    ) % ADV_EVERY == 0


def _rewrite(src: str, dst: str, id_col: str, col: str, pool: list) -> int:
    t = pq.read_table(src)
    ids = t.column(id_col).to_numpy()
    mask = _adv_mask(ids, 17)
    vals = t.column(col).to_pylist()
    out_vals = [
        pool[int(i) % len(pool)] if m else v
        for i, (v, m) in zip(ids, zip(vals, mask))
    ]
    arr = pa.array(out_vals, type=t.column(col).type)
    t = t.set_column(t.schema.get_field_index(col), t.schema.field(col), arr)
    pq.write_table(t, dst)
    return int(mask.sum())


@pytest.fixture(scope="module")
def adv_dir(sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("adv-sf"))
    for name in TABLES:
        src = os.path.join(sf_dir, f"{name}.parquet")
        dst = os.path.join(d, f"{name}.parquet")
        if name == "events":
            n = _rewrite(src, dst, "event_id", "value", ADV_VALUES)
            assert n > 0
        elif name == "documents":
            n = _rewrite(src, dst, "doc_id", "text", ADV_TEXTS)
            assert n > 0
        else:
            shutil.copyfile(src, dst)
    return d


@pytest.fixture(scope="module")
def adv_oracle(adv_dir):
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{adv_dir}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", EVENTS_ORACLED + DOCS_ORACLED)
def test_oracled_entry_parity_under_adversarial_values(
    spark, adv_dir, adv_oracle, name
):
    spark_pdf = QUERIES[name](spark, adv_dir).toPandas()
    oracle_pdf = adv_oracle.execute(ORACLES[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, f"{name}[adv]")


@pytest.mark.parametrize("name", ROWS_ONLY_TOUCHING)
def test_rows_only_entry_survives_adversarial_values(spark, adv_dir, name):
    # collect(), NOT count() — see the null suite's twin for why
    assert len(QUERIES[name](spark, adv_dir).collect()) >= 0


def test_lower_special_casing_divergence_is_known(spark, adv_oracle):
    """Pin the ONE documented cross-engine canonicalization divergence
    (normalize_ws docstring): lower('I-dot-above') follows Unicode
    SpecialCasing on the JVM (2 code points) vs simple mapping in
    DuckDB (1). If either engine changes behavior, this fails and the
    docstring + adversarial pool need revisiting."""
    s = "İ"  # LATIN CAPITAL LETTER I WITH DOT ABOVE
    jvm = spark.sql(f"SELECT lower('{s}') AS x").collect()[0].x
    duck = adv_oracle.execute(f"SELECT lower('{s}')").fetchone()[0]
    assert jvm == "i̇"
    assert duck == "i"


# property/bound oracles: guarantees must hold on adversarial values
# too (violations stay empty — e.g. zero-length texts through the
# fingerprint/compression paths, boundary floats through the sketches)
from test_null_robustness import PROPERTY_EMPTY_UNDER_NULLS


@pytest.mark.parametrize("name", PROPERTY_EMPTY_UNDER_NULLS)
def test_property_oracle_empty_under_adversarial_values(spark, adv_dir, name):
    assert QUERIES[name](spark, adv_dir).count() == 0
