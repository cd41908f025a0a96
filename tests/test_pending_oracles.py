"""Round-8 staged promotions (verdict ask #5): dedup_simhash and
dedup_minhash_lsh now run the PORTABLE md5 hash family, and each has a
full DuckDB twin staged in dedup.queries.ORACLES_PENDING (the r08
oracled set is frozen for the rotation drain; r09 merges these into
ORACLES). This suite runs the EXACT driver comparison on them today —
Spark result vs DuckDB oracle at the test SF, value-compared through
assert_frames_match — plus detector-sensitivity mutations proving each
staged oracle can fail."""

from __future__ import annotations

import pytest

from aliyun_emapreduce_datasources_spark.dedup import minhash, simhash
from aliyun_emapreduce_datasources_spark.dedup.queries import (
    ORACLES_PENDING,
    QUERIES,
)
from test_oracle_parity import assert_frames_match


@pytest.mark.parametrize("name", sorted(ORACLES_PENDING))
def test_pending_oracle_matches(name, spark, oracle, sf_dir):
    spark_pdf = QUERIES[name](spark, sf_dir).toPandas()
    assert len(spark_pdf) > 0, f"{name}: vacuous parity (no rows)"
    oracle_pdf = oracle.execute(ORACLES_PENDING[name]).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_catalog_hash_is_portable_family():
    # the oracles above are only valid under the md5 pin — a drive-by
    # hash swap must fail here, not as a driver mismatch in r09
    assert simhash.CATALOG_HASH == "md5"
    assert minhash.CATALOG_HASH == "md5"


def test_simhash_oracle_rejects_corrupted_hamming(spark, oracle, sf_dir):
    pdf = QUERIES["dedup_simhash"](spark, sf_dir).toPandas()
    pdf.loc[pdf.index[0], "hamming"] += 1
    with pytest.raises(AssertionError):
        assert_frames_match(
            pdf, oracle.execute(ORACLES_PENDING["dedup_simhash"]).df(), "mut"
        )


def test_minhash_oracle_rejects_dropped_pair(spark, oracle, sf_dir):
    pdf = QUERIES["dedup_minhash_lsh"](spark, sf_dir).toPandas()
    with pytest.raises(AssertionError):
        assert_frames_match(
            pdf.iloc[1:],
            oracle.execute(ORACLES_PENDING["dedup_minhash_lsh"]).df(),
            "mut",
        )


def test_md5_variant_requires_power_of_two_perms():
    with pytest.raises(ValueError, match="power-of-two"):
        minhash._signature("a b c d e f", 100, 25, 4, "md5")


def test_bloom_catalog_hash_is_portable():
    from aliyun_emapreduce_datasources_spark.dedup import bloom

    assert bloom.CATALOG_HASH == "md5"


def test_bloom_oracle_rejects_corrupted_flag_count(spark, oracle, sf_dir):
    pdf = QUERIES["dedup_bloom_decontaminate"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    pdf.loc[pdf.index[0], "n_flagged"] += 1
    with pytest.raises(AssertionError):
        assert_frames_match(
            pdf,
            oracle.execute(ORACLES_PENDING["dedup_bloom_decontaminate"]).df(),
            "mut",
        )


def test_bloom_pow2_params_integer_exact():
    from aliyun_emapreduce_datasources_spark.dedup.bloom import _params

    assert _params(4, 0.01, "pow2") == (64, 7)       # 16n exactly 64
    assert _params(5, 0.01, "pow2") == (128, 7)      # next pow2 above 80
    assert _params(1, 0.01, "pow2") == (64, 7)       # floor
    m, k = _params(26_000, 0.01, "pow2")
    assert m == 1 << 19 and k == 7                   # 416k -> 524288


def test_pending_set_invariants():
    """r09 merges ORACLES_PENDING into ORACLES — guard the merge
    preconditions now: every staged name is a live catalog entry, none
    is already oracled (a double entry would silently shadow), and the
    staged set is exactly the four round-8 promotions."""
    from aliyun_emapreduce_datasources_spark.dedup.queries import ORACLES

    assert set(ORACLES_PENDING) == {
        "dedup_simhash",
        "dedup_minhash_lsh",
        "dedup_bloom_decontaminate",
        "dedup_winnow_fingerprint",
    }
    assert set(ORACLES_PENDING) <= set(QUERIES)
    assert not (set(ORACLES_PENDING) & set(ORACLES))


def test_winnow_oracle_rejects_corrupted_containment(spark, oracle, sf_dir):
    pdf = QUERIES["dedup_winnow_fingerprint"](spark, sf_dir).toPandas()
    assert len(pdf) > 0
    pdf.loc[pdf.index[0], "containment"] *= 0.75
    with pytest.raises(AssertionError):
        assert_frames_match(
            pdf,
            oracle.execute(ORACLES_PENDING["dedup_winnow_fingerprint"]).df(),
            "mut",
        )
