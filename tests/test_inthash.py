"""Wrap-arithmetic expression helpers vs numpy int64 ground truth.

The MinHash densification filler is DEFINED by numpy wrap semantics
(dedup/minhash.py), so the JVM rebuild must match bit-for-bit on
adversarial operands — extremes, sign boundaries, carry chains — and a
broad random sample, all under ANSI mode (where a plain ``*`` would
raise instead of wrap).
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.inthash import (
    h64_md5,
    wadd,
    wmul_const,
)

EDGE = [
    0,
    1,
    -1,
    2**63 - 1,
    -(2**63),
    2**32,
    2**32 - 1,
    -(2**32),
    0x9E3779B97F4A7C15 - 2**64,  # MinHash _FILL_C1
    1099511628211,  # _FILL_C2
]
rng = random.Random(0xD1CE)
RAND = [rng.randrange(-(2**63), 2**63) for _ in range(200)]


@pytest.fixture(scope="module")
def ansi(spark):
    """The driver's vanilla session runs ANSI-on (Spark 4 default);
    the shared test session may not — force it for this module so a
    wrapping `+`/`*` that only works ANSI-off cannot pass here."""
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


def test_wadd_matches_numpy(ansi):
    pairs = [(a, b) for a in EDGE for b in EDGE] + list(
        zip(RAND[:100], RAND[100:])
    )
    df = ansi.createDataFrame(pairs, "a long, b long")
    got = df.select(wadd(F.col("a"), F.col("b")).alias("s")).collect()
    with np.errstate(over="ignore"):
        want = [
            int(np.int64(a) + np.int64(b)) for a, b in pairs
        ]
    assert [r.s for r in got] == want


@pytest.mark.parametrize(
    "c",
    [0, 1, -1, 0x9E3779B97F4A7C15, -7046029254386353131, 1099511628211, 2**63],
)
def test_wmul_const_matches_numpy(ansi, c):
    df = ansi.createDataFrame([(v,) for v in EDGE + RAND], "a long")
    got = df.select(wmul_const(F.col("a"), c).alias("p")).collect()
    cs = c % 2**64
    if cs >= 1 << 63:
        cs -= 1 << 64
    with np.errstate(over="ignore"):
        want = [int(np.int64(v) * np.int64(cs)) for v in EDGE + RAND]
    assert [r.p for r in got] == want


def test_h64_md5_matches_python(ansi):
    strs = ["", "a", "hello world", "the quick brown fox", "é中文"]
    df = ansi.createDataFrame([(s,) for s in strs], "s string")
    got = df.select(h64_md5(F.col("s")).alias("h")).collect()
    for row, s in zip(got, strs):
        u = int(hashlib.md5(s.encode()).hexdigest()[:16], 16)
        want = u - (1 << 64) if u >= (1 << 63) else u
        assert row.h == want, s
