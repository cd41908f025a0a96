"""Count-min sketch over the token stream (Cormode & Muthukrishnan
2005): d hash rows × w counters estimate any token's frequency with
est ≥ true and est ≤ true + εN w.h.p. — the fixed-memory substitute
for an exact vocabulary table when the vocabulary itself doesn't fit
(URLs, n-grams, user ids at 100 TB).

Construction here is the DataFrame the executors would build at any
scale:

1. exact per-token partial counts (map-side combined, vocab-bounded);
2. for each hash row i: bucket = md5-coin(i‖token) mod w, groupBy
   bucket → SUM — the sketch materializes as ≤ d·w rows TOTAL,
   independent of corpus size;
3. point queries (here: the exact top-K tokens, so the test can
   compare) join the candidates to the d sketch rows and take
   MIN over i — the classic CMS estimate.

Because the hash family is the engine's portable md5 coin
(operators/pipeline.py convention), DuckDB can rebuild the IDENTICAL
sketch in SQL — so unlike most sketch implementations this one is
value-exact oracle-checked, not just error-bound tested. The
overestimate-only invariant (est ≥ true) is additionally pinned in
tests/test_text_extra.py.

Scale shape: two vocabulary-bounded aggregates (tokens, then buckets)
plus a broadcast join of a ≤ d·w-row sketch to K candidate rows. The
corpus is scanned once; nothing row-scale crosses the shuffle after
the first map-side combine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import tokens
from aliyun_emapreduce_datasources_spark.operators.common import md5_bucket, t

__all__ = ["cms_estimate_topk", "QUERIES", "ORACLES"]

D_ROWS = 4
W_BUCKETS = 512
TOP_K = 20


def _bucket(row_i: int, col: F.Column) -> F.Column:
    # the engine's one portable coin, salted per sketch row
    return md5_bucket(F.concat(F.lit(f"r{row_i}|"), col), W_BUCKETS)


def cms_estimate_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, true_c, est_c) for the exact top-K tokens; est_c is the
    CMS estimate min_i sketch[i][h_i(token)]."""
    docs = t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = counts.orderBy(F.col("c").desc(), F.col("tok")).limit(TOP_K)
    ests = []
    for i in range(D_ROWS):
        sketch_i = (
            counts.groupBy(_bucket(i, F.col("tok")).alias("b"))
            .agg(F.sum("c").alias("cnt"))
        )
        probe = top.withColumn("b", _bucket(i, F.col("tok"))).join(
            F.broadcast(sketch_i), "b"
        )
        ests.append(probe.select("tok", "c", F.col("cnt").alias(f"e{i}")))
    joined = reduce(lambda a, b: a.join(b.drop("c"), "tok"), ests)
    return joined.select(
        F.col("tok").alias("token"),
        F.col("c").cast("long").alias("true_c"),
        F.least(*[F.col(f"e{i}") for i in range(D_ROWS)]).cast("long").alias("est_c"),
    ).orderBy(F.col("true_c").desc(), "token")


def _o_bucket(i: int, col: str) -> str:
    return f"CAST(('0x' || substr(md5('r{i}|' || {col}), 1, 8)) AS BIGINT) % {W_BUCKETS}"


_SKETCHES = ",\n".join(
    f"s{i} AS (SELECT {_o_bucket(i, 'tok')} AS b, SUM(c) AS e{i} FROM counts GROUP BY 1)"
    for i in range(D_ROWS)
)
_JOINS = "\n".join(
    f"JOIN s{i} ON s{i}.b = {_o_bucket(i, 'top.tok')}" for i in range(D_ROWS)
)

ORACLE_CMS = f"""
WITH counts AS (
  SELECT tok, COUNT(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY 1
), top AS (
  SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT {TOP_K}
),
{_SKETCHES}
SELECT top.tok AS token,
       CAST(top.c AS BIGINT) AS true_c,
       CAST(least({", ".join(f"e{i}" for i in range(D_ROWS))}) AS BIGINT) AS est_c
FROM top
{_JOINS}
ORDER BY true_c DESC, token
"""

QUERIES = {"sketch_cms_topk": cms_estimate_topk}
ORACLES = {"sketch_cms_topk": ORACLE_CMS}
