"""Skew mitigation: salted aggregation and salted join.

At 100 TB a handful of hot keys (one customer, one null-ish default)
concentrate a shuffle partition onto one task. Two standard remedies,
both expressed as plain DataFrame plans so results are EXACTLY the
unsalted answer (oracle-checked):

- **Salted two-phase aggregation**: group by (key, salt) first (spreads
  the hot key over n_salt reducers, partials stay small), then by key.
  For algebraic aggregates this is semantically identity; with the
  decimal-exact sum convention it is also bit-identity.
- **Salted join**: the skewed (big) side gets a per-row salt; the small
  side is replicated n_salt times so (key, salt) equi-join keeps
  correctness. Replication factor × small-side size is the price; use
  for the hot-key subset only in production (or rely on AQE skew-join
  splitting, enabled in session.py — this module is the explicit form
  for when AQE's heuristics miss).

Salt derivation is deterministic (xxhash64 of the whole row id-ish
columns mod n_salt) — no RNG, so plans are replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import dsum, m, o_dsum, o_m, t

__all__ = ["salted_agg", "salted_join", "QUERIES", "ORACLES"]

N_SALT = 16


def _salt(cols: list[str], n_salt: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt))


def salted_agg(
    df: DataFrame,
    key: str,
    sum_col: str,
    n_salt: int = N_SALT,
    *,
    salt_source: list[str],
) -> DataFrame:
    """(key, cnt, total): two-phase decimal-exact sum/count spread over
    n_salt partial groups per key. ``salt_source`` must name columns
    that VARY within a key (row ids, line numbers): an earlier default
    salted by the measure column, so a hot key with a constant measure
    (exactly the null-ish-default scenario above) still collapsed onto
    one reducer — silently paying the extra stage for nothing."""
    salted = df.withColumn("_salt", _salt(salt_source, n_salt))
    partial = salted.groupBy(key, "_salt").agg(
        F.count(F.lit(1)).alias("_cnt"), F.sum(m(sum_col)).alias("_sum")
    )
    return partial.groupBy(key).agg(
        F.sum("_cnt").alias("cnt"),
        F.sum("_sum").cast("double").alias("total"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salt: int = N_SALT,
    *,
    salt_source: list[str],
) -> DataFrame:
    """Inner equi-join with the big side salted and the small side
    replicated n_salt times; output = exactly the unsalted join.
    ``salt_source`` must vary within a join key (an earlier default of
    the join key itself gave every hot-key row the same salt — no
    spread at all)."""
    bs = big.withColumn("_salt", _salt(salt_source, n_salt))
    ss = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return bs.join(
        ss,
        (F.col(big_key) == F.col(small_key)) & (bs["_salt"] == ss["_salt"]),
    ).drop("_salt")


# --- oracle-checked catalog entries ------------------------------------

def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted per-customer order totals == plain GROUP BY (identity
    proof under the oracle)."""
    orders = t(spark, sf_dir, "orders")
    return salted_agg(orders, "o_custkey", "o_totalprice", salt_source=["o_orderkey"]).select(
        F.col("o_custkey").alias("custkey"), "cnt", "total"
    )


ORACLE_SALTED_AGG = f"""
SELECT o_custkey AS custkey, COUNT(*) AS cnt, {o_dsum(o_m('o_totalprice'), 'total')}
FROM orders GROUP BY o_custkey
"""


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted lineitem⋈orders == plain join, aggregated per status."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    joined = salted_join(li, orders, "l_orderkey", "o_orderkey", salt_source=["l_orderkey", "l_linenumber"])
    return joined.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("cnt"), dsum("l_extendedprice", "sum_price")
    )


ORACLE_SALTED_JOIN = f"""
SELECT o_orderstatus AS status, COUNT(*) AS cnt, {o_dsum(o_m('l_extendedprice'), 'sum_price')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


QUERIES = {
    "skew_salted_agg": skew_salted_agg,
    "skew_salted_join": skew_salted_join,
}

ORACLES = {
    "skew_salted_agg": ORACLE_SALTED_AGG,
    "skew_salted_join": ORACLE_SALTED_JOIN,
}
