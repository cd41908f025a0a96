"""BM25 full-text retrieval over the token postings (Robertson &
Zaragoza 2009) — the ranked keyword-search primitive a corpus engine
owes its users once it already maintains postings for dedup/vocab.

Integer-exact formulation: with k1 = 1.2, b = 0.75 the per-term score

    idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

becomes, after clearing denominators (×10·AV, avgdl = AV/N):

    idf_scaled(t) = (S · (2N − 2df + 1)) div (2df + 1)        # ×S
    term_micro    = (idf_scaled · 22 · tf · AV)
                    div (10·tf·AV + 3·AV + 9·dl·N)

— every factor BIGINT, so document scores are order-free integer sums
and the DuckDB differential is value-exact (the same convention as
functions/lm.py; engine-native float BM25 would drift in the last
ulp and flip near-tie ranks). S = 1000 keeps the largest intermediate
(idf_scaled·22·tf·AV) within int64 out to ~sf10 corpora; beyond that,
widen to decimal(38,0) on both engines.

Scale shape: postings (doc, term, tf) are map-side-combined; df and
dl are vocabulary- and corpus-row-bounded aggregates; the QUERY terms
filter cuts the postings to |terms| rows per doc BEFORE any join; the
df/avgdl sides are broadcast (bytes). One doc_id shuffle, then a
TakeOrderedAndProject top-k. No driver-side anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import tokens
from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["bm25_topk", "QUERIES", "ORACLES"]

QUERY_TERMS = ("hash", "join", "scan")
S = 1000
TOP_N = 15


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score_micro, n_terms_hit) for every document hitting
    ≥1 query term — the un-truncated scoring used by composers
    (hybrid retrieval ranks this to its own candidate depth);
    ``bm25_topk`` is this plus the ordered top-N cut."""
    docs = t(spark, sf_dir, "documents")
    tok = tokens("text")
    base = docs.select("doc_id", F.explode(tok).alias("term"), F.size(tok).alias("dl"))
    terms = F.array(*[F.lit(q) for q in QUERY_TERMS])
    postings = (
        base.where(F.array_contains(terms, F.col("term")))
        .groupBy("doc_id", "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tok)).alias("av"),
    )
    df_tbl = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        postings.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf_s", F.expr(f"({S} * (2 * n_docs - 2 * df + 1)) div (2 * df + 1)")
        )
        .withColumn(
            "term_micro",
            F.expr(
                "(idf_s * 22 * tf * av) div (10 * tf * av + 3 * av + 9 * dl * n_docs)"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("term_micro").cast("long").alias("score_micro"),
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
    )


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        bm25_scores(spark, sf_dir)
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(TOP_N)
    )


_TERMS_SQL = ", ".join(f"'{q}'" for q in QUERY_TERMS)

# the scoring CTE chain, shared with hybrid.py's oracle (one
# definition of the integer BM25 formulation — a change here, e.g.
# widening S for sf10+, updates every consumer's oracle in lockstep)
BM25_SCORED_CTES = f"""base AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         len(string_split(text, ' ')) AS dl
  FROM documents
), postings AS (
  SELECT doc_id, term, dl, COUNT(*) AS tf
  FROM base WHERE term IN ({_TERMS_SQL})
  GROUP BY 1, 2, 3
), stats AS (
  SELECT COUNT(*) AS n_docs,
         SUM(len(string_split(text, ' '))) AS av
  FROM documents
), df_tbl AS (
  SELECT term, COUNT(*) AS df FROM postings GROUP BY 1
), scored AS (
  SELECT doc_id,
         (({S} * (2 * n_docs - 2 * df + 1)) // (2 * df + 1))
           * 22 * tf * av
           // (10 * tf * av + 3 * av + 9 * dl * n_docs) AS term_micro
  FROM postings JOIN df_tbl USING (term) CROSS JOIN stats
)"""

ORACLE_BM25 = f"""
WITH {BM25_SCORED_CTES}
SELECT doc_id,
       CAST(SUM(term_micro) AS BIGINT) AS score_micro,
       CAST(COUNT(*) AS BIGINT) AS n_terms_hit
FROM scored
GROUP BY doc_id
ORDER BY score_micro DESC, doc_id
LIMIT {TOP_N}
"""

QUERIES = {"bm25_topk": bm25_topk}
ORACLES = {"bm25_topk": ORACLE_BM25}
