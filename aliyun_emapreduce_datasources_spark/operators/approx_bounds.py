"""Driver-visible error-bound oracles for the sketch/approximate
aggregate entries (round-4 companions, completing the pattern
dedup/properties.py established for the hash-based dedup family).

`distinct_users_approx` (HLL++), `doc_length_quantiles_approx`
(approx_percentile / KLL-style sketch) and `text_compression_ratio`
(zlib signal) are rows-only in the catalog — their values are
implementation-defined. What IS deterministic is the error contract
each one ships with; every check below recomputes that contract
through an independent exact path and emits the VIOLATIONS, pinned to
the empty set by the oracle. A sketch regression (merge bug, wrong
rsd, an accuracy knob silently dropped, a corrupted keep flag) shows
up as a non-empty, hash-mismatching Spark result.

Bounds are deliberately loose multiples of the configured error (HLL
rsd 0.02 → 6 % bound; approx_percentile accuracy 1000 → 2 % rank
bound; measured worst cases at sf0.001/0.01/0.1 are 0.4 % and 0.14 %)
so the rows stay deterministic-green on the fixed testdata while any
real regression — which lands orders of magnitude outside — still
fires. Detector sensitivity (the bound DOES fire on a seeded
violation) is pinned in tests/test_property_mutation.py.

All comparisons are integer cross-multiplies — no ratio ever
materializes, so the violation sets are byte-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import local_df, t

__all__ = ["QUERIES", "ORACLES"]

# |approx − exact| ≤ HLL_BOUND_PCT % of exact (3× the configured rsd)
HLL_BOUND_PCT = 6
# approx_percentile rank error ≤ RANK_BOUND_MILLIS ‰ of the group size
# (20× the 1/accuracy=0.1 % theoretical bound)
RANK_BOUND_MILLIS = 20


def hll_bound_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event types where the HLL++ estimate strays more than
    HLL_BOUND_PCT % from the exact distinct count — empty by the
    sketch's rsd=0.02 accuracy contract. Exact side = the
    oracle-checked `distinct_users_exact` twin."""
    from aliyun_emapreduce_datasources_spark.operators import analytic

    exact = analytic.distinct_users_exact(spark, sf_dir)
    approx = analytic.distinct_users_approx(spark, sf_dir).withColumnsRenamed(
        {"event_type": "a_event_type"}
    )
    err = F.abs(F.col("n_users_approx") - F.col("n_users")) * F.lit(100)
    return (
        # null-safe join: a NULL event_type stratum (NULL-robustness
        # suite) must line its exact and approx rows up, not orphan both
        exact.join(
            approx, exact["event_type"].eqNullSafe(approx["a_event_type"]), "full"
        )
        .where(
            F.col("n_users").isNull()
            | F.col("n_users_approx").isNull()
            | (err > F.col("n_users") * F.lit(HLL_BOUND_PCT))
        )
        .select(F.coalesce("event_type", "a_event_type").alias("event_type"))
        .orderBy("event_type")
    )


def quantile_rank_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, p_millis) where the approx_percentile value's true rank
    interval misses the target rank by more than RANK_BOUND_MILLIS ‰
    of the language's non-null count — empty by the Greenwald-Khanna
    guarantee (accuracy 1000 ⇒ 1 ‰ rank error).

    Independent path: the check never calls a percentile function — it
    COUNTS rows strictly below / at-or-below the returned value per
    language in one scan and tests
    ``lt·1000 ≤ (p+ε)·n  ∧  le·1000 ≥ (p−ε)·n`` in integers.
    """
    from aliyun_emapreduce_datasources_spark.operators import pipeline

    appr = pipeline.doc_length_quantiles_approx(spark, sf_dir)
    qs = appr.select(
        F.col("lang").alias("q_lang"),
        F.expr(
            "stack(3, 500, p50_chars, 900, p90_chars, 990, p99_chars)"
            " AS (p_millis, qv)"
        ),
    ).where(F.col("qv").isNotNull())
    docs = t(spark, sf_dir, "documents").select("lang", "n_chars")
    # broadcast the tiny quantile table against one corpus scan; the
    # null-safe join keeps a NULL-lang stratum honest
    joined = docs.join(
        F.broadcast(qs), docs["lang"].eqNullSafe(qs["q_lang"]), "inner"
    )
    counts = joined.groupBy("q_lang", "p_millis", "qv").agg(
        F.count("n_chars").alias("n"),
        F.sum((F.col("n_chars") < F.col("qv")).cast("long")).alias("lt"),
        F.sum((F.col("n_chars") <= F.col("qv")).cast("long")).alias("le"),
    )
    eps = F.lit(RANK_BOUND_MILLIS)
    return (
        counts.where(
            (F.col("lt") * 1000 > (F.col("p_millis") + eps) * F.col("n"))
            | (F.col("le") * 1000 < (F.col("p_millis") - eps) * F.col("n"))
        )
        .select(F.col("q_lang").alias("lang"), F.col("p_millis").cast("long").alias("p_millis"))
        .orderBy("lang", "p_millis")
    )


def sketch_global_estimate(spark: SparkSession, sf_dir: str) -> int:
    """Global distinct-user estimate via MERGED per-shard HLL
    sketches: `hll_sketch_agg` per event_type (the map-side partial a
    1000-executor job computes per partition/day), `hll_union_agg`
    across shards, one estimate — the mergeable-sketch path that
    replaces exact global distinct at 100 TB. Kept as a module-level
    seam so the mutation test can corrupt it independently."""
    from aliyun_emapreduce_datasources_spark.operators.common import t as _t

    ev = _t(spark, sf_dir, "events")
    shards = ev.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    row = shards.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    ).collect()[0]
    return int(row.est or 0)


def sketch_merge_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row ('global') when the merged-sketch estimate strays more
    than HLL_BOUND_PCT % from the exact global distinct count — empty
    by the HLL union contract (merging per-shard sketches is lossless
    w.r.t. the sketch's own accuracy: the union of sketches equals the
    sketch of the union). This is the property that makes the sketch
    the 100 TB path — partial sketches can be computed wherever the
    data lives and merged without re-reading it."""
    ev = t(spark, sf_dir, "events")
    exact = int(ev.agg(F.count_distinct("user_id")).collect()[0][0] or 0)
    from aliyun_emapreduce_datasources_spark.operators import approx_bounds as _self

    est = _self.sketch_global_estimate(spark, sf_dir)
    violated = abs(est - exact) * 100 > exact * HLL_BOUND_PCT
    rows = [("global",)] if violated else []
    return local_df(spark, rows, "scope string")


def compression_bound_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs whose emitted compression stats break zlib's hard bounds or
    whose keep flag contradicts the integer re-derivation — empty.

    Properties pinned (all integer arithmetic, no zlib call):
    - deflate never expands beyond ``n + n/100 + 64`` bytes (a loose
      cover of zlib's documented compressBound);
    - a zlib stream is never shorter than 8 bytes (2-byte header +
      4-byte adler32 + minimal deflate block);
    - ``keep`` must equal ``0.1 < ratio < 0.6`` re-derived as
      ``10·c > b ∧ 10·c < 6·b`` — exact-boundary rows (10·c = b or
      10·c = 6·b), where the double comparison may legitimately go
      either way, are exempt.
    """
    from aliyun_emapreduce_datasources_spark.functions import text as text_fns

    res = text_fns.compression_ratio(spark, sf_dir)
    b, c = F.col("n_bytes"), F.col("n_compressed")
    keep_int = ((c * 10 > b) & (c * 10 < b * 6))
    on_boundary = (c * 10 == b) | (c * 10 == b * 6)
    return (
        # a NULL-text doc has NULL stats end to end — no bounds to pin
        res.where(b.isNotNull() & c.isNotNull())
        .where(
            (c > b + F.floor(b / 100) + F.lit(64))
            | (c < F.lit(8))
            | (~on_boundary & (F.col("keep") != keep_int))
        )
        .select("doc_id")
        .orderBy("doc_id")
    )


QUERIES = {
    "distinct_users_hll_bound_check": hll_bound_violations,
    "distinct_users_sketch_merge_check": sketch_merge_violations,
    "doc_length_quantiles_rank_check": quantile_rank_violations,
    "text_compression_bound_check": compression_bound_violations,
}

ORACLES = {
    "distinct_users_hll_bound_check": (
        "SELECT CAST(NULL AS VARCHAR) AS event_type WHERE FALSE"
    ),
    "distinct_users_sketch_merge_check": (
        "SELECT CAST(NULL AS VARCHAR) AS scope WHERE FALSE"
    ),
    "doc_length_quantiles_rank_check": (
        "SELECT CAST(NULL AS VARCHAR) AS lang, CAST(NULL AS BIGINT) AS p_millis"
        " WHERE FALSE"
    ),
    "text_compression_bound_check": (
        "SELECT CAST(NULL AS BIGINT) AS doc_id WHERE FALSE"
    ),
}
