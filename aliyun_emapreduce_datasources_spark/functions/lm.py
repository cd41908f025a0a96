"""Data-selection scoring: DSIR-style hashed-n-gram importance
weights and a bigram-LM surprise score (the KenLM-perplexity-filter
shape) — the two standard "which documents do I keep for training"
signals that operate on corpus statistics rather than per-doc
heuristics.

- DSIR (Xie et al., 2023, arXiv:2302.03169): importance weight of a
  document under a *target* distribution vs the *raw* distribution,
  estimated over hashed n-gram buckets. Here target = the corpus'
  English slice, features = word bigrams hashed into NB buckets with
  the engine's portable md5 coin (operators/pipeline.py convention).
- Bigram surprise: per-occurrence inverse conditional probability
  under an add-one-smoothed bigram LM trained on the corpus itself;
  high total surprise ≈ high perplexity ≈ OCR noise / gibberish.

Cross-engine exactness: both scores are kept in *integer-scaled
rational* form — bucket weight and per-bigram surprise are
``(1e6 · num) div den`` BIGINT floor divisions, and per-doc scores are
BIGINT sums of those — so accumulation order cannot perturb a single
bit and the DuckDB differential hashes exactly. (A production pipeline
would sum float log-ratios; the ranking semantics are the same, the
integer form is what makes the oracle byte-exact. See
operators/common.py for the convention.)

Scale shape (100 TB): per-doc bucket counts reduce map-side before the
shuffle; the bucket-weight table is NB rows (bytes — broadcast); the
bigram LM tables are vocabulary-bounded aggregates (heavy-tailed but
∝ vocab², not corpus rows) joined back to map-side-reduced per-doc
postings — broadcast-eligible, AQE decides. One doc_id shuffle each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.functions.text import _O_BG, shingles, tokens
from aliyun_emapreduce_datasources_spark.operators.common import bucketed_rank, md5_bucket, ntile_case, t

__all__ = ["dsir_importance", "lm_bigram_surprise", "QUERIES", "ORACLES"]

N_BUCKETS = 256
SCALE = 1_000_000
TARGET_LANG = "en"


def _bucket(col: F.Column) -> F.Column:
    """Portable md5 coin: first 32 bits of md5(s) mod N_BUCKETS."""
    return md5_bucket(col, N_BUCKETS)


def _doc_bigram_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket, c): per-doc hashed-bigram occurrence
    counts — the map-side-reduced posting list."""
    return (
        docs.select(
            "doc_id", "lang", F.explode(shingles(tokens("text"), 2)).alias("b")
        )
        .select("doc_id", "lang", _bucket(F.col("b")).alias("bucket"))
        .groupBy("doc_id", "lang", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance: sum over the doc's hashed-bigram
    occurrences of the integer-scaled target/raw bucket ratio
    ``(1e6·(target_b+1)) div (raw_b+1)``. Docs with zero bigrams are
    out of the feature space and not emitted (both engines agree)."""
    docs = t(spark, sf_dir, "documents")
    per = _doc_bigram_buckets(docs)
    stats = per.groupBy("bucket").agg(
        F.sum("c").alias("raw_c"),
        F.sum(F.when(F.col("lang") == TARGET_LANG, F.col("c")).otherwise(F.lit(0))).alias(
            "target_c"
        ),
    )
    weighted = per.join(F.broadcast(stats), "bucket").withColumn(
        "w",
        F.expr(f"({SCALE} * (target_c + 1)) div (raw_c + 1)"),
    )
    return (
        weighted.groupBy("doc_id", "lang")
        .agg(
            F.sum(F.col("c") * F.col("w")).cast("long").alias("importance"),
            F.sum("c").cast("long").alias("n_feat"),
        )
        .withColumn(
            "avg_importance",
            F.col("importance").cast("double") / F.col("n_feat").cast("double"),
        )
        .orderBy("doc_id")
    )


ORACLE_DSIR = f"""
WITH per AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(b), 1, 8)) AS BIGINT) % {N_BUCKETS} AS bucket,
         COUNT(*) AS c
  FROM (SELECT doc_id, lang, unnest({_O_BG}) AS b FROM documents)
  GROUP BY 1, 2, 3
), stats AS (
  SELECT bucket, SUM(c) AS raw_c,
         SUM(CASE WHEN lang = '{TARGET_LANG}' THEN c ELSE 0 END) AS target_c
  FROM per GROUP BY 1
)
SELECT doc_id, lang,
       CAST(SUM(c * (({SCALE} * (target_c + 1)) // (raw_c + 1))) AS BIGINT) AS importance,
       CAST(SUM(c) AS BIGINT) AS n_feat,
       CAST(SUM(c * (({SCALE} * (target_c + 1)) // (raw_c + 1))) AS DOUBLE)
         / CAST(SUM(c) AS DOUBLE) AS avg_importance
FROM per JOIN stats USING (bucket)
GROUP BY 1, 2
ORDER BY doc_id
"""


def lm_bigram_surprise(
    spark: SparkSession, sf_dir: str, materialize: bool = True
) -> DataFrame:
    """Per-document total/mean surprise under an add-one-smoothed
    corpus bigram LM: per occurrence of bigram (w1 w2),
    ``(1e6·(C(w1)+V)) div (C(w1 w2)+1)`` — the integer-scaled inverse
    conditional probability; V = corpus unigram vocabulary size.

    ``materialize=False`` keeps the inherited three-builds-of-per
    groupBy+join-back shape for plan inspection / A-B; the default
    attaches both counts with unordered windows over ``per`` itself —
    identical integer sums, one build of the fat per-doc table (see
    tests/test_materialize_once.py)."""
    docs = t(spark, sf_dir, "documents")
    tok = tokens("text")
    # per-doc bigram occurrence counts, with the context word split out
    per = (
        docs.select("doc_id", F.explode(shingles(tok, 2)).alias("bg"))
        .withColumn("w1", F.substring_index("bg", " ", 1))
        .groupBy("doc_id", "bg", "w1")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = (
        docs.select(F.explode(tok).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    if materialize:
        # the corpus-wide bigram count and the context count (= w1's
        # occurrences as a bigram's FIRST token) are partition sums
        # OVER per itself — attach them with two unordered windows
        # (exchange, no sort) instead of building per three times and
        # joining the two count tables back (guide §2.4: two
        # operations keyed the same way share one pass; the fat
        # per-doc table is never materialized or rebuilt).
        scored = (
            per.withColumn(
                "bg_c", F.sum("c").over(Window.partitionBy("bg"))
            )
            .withColumn("ctx_c", F.sum("c").over(Window.partitionBy("w1")))
            .crossJoin(F.broadcast(vocab))
            .withColumn("s", F.expr(f"({SCALE} * (ctx_c + v)) div (bg_c + 1)"))
        )
    else:
        bigram_lm = per.groupBy("bg").agg(F.sum("c").alias("bg_c"))
        # context count = occurrences of w1 as the *first* token of a
        # bigram (i.e. unigram count excluding each doc's last token)
        ctx_lm = per.groupBy("w1").agg(F.sum("c").alias("ctx_c"))
        scored = (
            per.join(bigram_lm, "bg")
            .join(ctx_lm, "w1")
            .crossJoin(F.broadcast(vocab))
            .withColumn("s", F.expr(f"({SCALE} * (ctx_c + v)) div (bg_c + 1)"))
        )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.col("s")).cast("long").alias("surprise"),
            F.sum("c").cast("long").alias("n_bigrams"),
        )
        .withColumn(
            "avg_surprise",
            F.col("surprise").cast("double") / F.col("n_bigrams").cast("double"),
        )
        .orderBy("doc_id")
    )


ORACLE_SURPRISE = f"""
WITH per AS (
  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1, COUNT(*) AS c
  FROM (SELECT doc_id, unnest({_O_BG}) AS bg FROM documents)
  GROUP BY 1, 2, 3
), bigram_lm AS (
  SELECT bg, SUM(c) AS bg_c FROM per GROUP BY 1
), ctx_lm AS (
  SELECT w1, SUM(c) AS ctx_c FROM per GROUP BY 1
), vocab AS (
  SELECT COUNT(DISTINCT w) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
)
SELECT doc_id,
       CAST(SUM(c * (({SCALE} * (ctx_c + v)) // (bg_c + 1))) AS BIGINT) AS surprise,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       CAST(SUM(c * (({SCALE} * (ctx_c + v)) // (bg_c + 1))) AS DOUBLE)
         / CAST(SUM(c) AS DOUBLE) AS avg_surprise
FROM per
JOIN bigram_lm USING (bg)
JOIN ctx_lm USING (w1)
CROSS JOIN vocab
GROUP BY doc_id
ORDER BY doc_id
"""

def text_ccnet_buckets(
    spark: SparkSession,
    sf_dir: str,
    cut: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data",
    LREC 2020): per LANGUAGE, rank documents by their LM score and cut
    the ranking into head / middle / tail terciles — the standard
    "keep head+middle, drop tail" pre-training data split. The LM
    score is this engine's ``lm_bigram_surprise`` average (CCNet uses
    a KenLM 5-gram; the add-one bigram surprise is the same signal at
    oracle-exact integer arithmetic — see lm_bigram_surprise above).

    Per-language partitioning matters: perplexity scales differ across
    languages, so a global cut would silently drop entire low-resource
    languages — the tercile is computed within each ``lang``.

    Docs with zero bigrams are outside the LM's domain and not
    emitted (the dsir_importance convention; both engines agree).

    Determinism: ``avg_surprise`` is an exact-int64 / exact-int64
    IEEE division, so the tercile ordering (score asc, doc_id asc) is
    bit-identical across engines and NTILE boundaries cannot flip.

    Scale shape (round-7 swap of the per-``lang`` raw-row NTILE — a
    language is a coarse partition key with heavy 'en' skew at web
    scale, so that window put one language's entire score table in ONE
    task): rides lm_bigram_surprise's plan (vocabulary-bounded LM
    tables, one doc_id shuffle), then the distributed exact rank of
    common.bucketed_rank — scores bucket by shiftright(floor(avg), 18)
    (monotone; the occupied-bucket grid is score-range/2¹⁸ ≈ 150 rows
    at test scale, the eval_auc_binary range-bounded argument), bucket
    offsets come from a grid-only window, and the sole raw-row window
    is partitioned by (lang, bucket). NTILE(3) is its closed-form size
    rule evaluated in-row (common.ntile_case) — bit-identical to the
    single-window NTILE because (offset + in-bucket row_number) IS the
    (avg_surprise, doc_id) per-lang rank.

    ``cut="approx"`` is the 100 TB swap (round-7 verdict ask #3,
    SCALING.md "Quantiles"): per-lang tercile CUT VALUES from ONE
    ``percentile_approx`` sketch aggregate (bounded memory per lang,
    map-side partials) broadcast back as a |langs|-row table — zero
    windows, zero rank passes, one corpus scan. Semantics differ from
    NTILE only at the boundaries: equal scores land in one bucket by
    VALUE (CCNet's actual published behavior — its buckets are
    perplexity-threshold cuts, not rank cuts) and the sketch places
    each cut within n/``accuracy`` ranks of the exact tercile.
    Bounded-deviation parity vs the exact path is pinned in
    tests/test_ccnet_approx.py.
    """
    docs = t(spark, sf_dir, "documents").select("doc_id", "lang")
    scores = lm_bigram_surprise(spark, sf_dir).select("doc_id", "avg_surprise")

    if cut == "approx":
        joined = docs.join(scores, "doc_id")
        cuts = joined.groupBy("lang").agg(
            F.percentile_approx(
                "avg_surprise", [1.0 / 3.0, 2.0 / 3.0], accuracy
            ).alias("cuts")
        ).select(
            F.col("lang").alias("_cl"),
            F.col("cuts")[0].alias("_c1"),
            F.col("cuts")[1].alias("_c2"),
        )
        # null-safe: a NULL lang is a legitimate stratum with its own
        # cuts (same convention as bucketed_rank's grid join)
        return (
            joined.join(
                F.broadcast(cuts), F.col("lang").eqNullSafe(F.col("_cl"))
            )
            .withColumn(
                "bucket_id",
                F.when(F.col("avg_surprise") <= F.col("_c1"), F.lit(1))
                .when(F.col("avg_surprise") <= F.col("_c2"), F.lit(2))
                .otherwise(F.lit(3))
                .cast("long"),
            )
            .withColumn(
                "bucket",
                F.when(F.col("bucket_id") == 1, F.lit("head"))
                .when(F.col("bucket_id") == 2, F.lit("middle"))
                .otherwise(F.lit("tail")),
            )
            .select("doc_id", "lang", "avg_surprise", "bucket_id", "bucket")
            .orderBy("doc_id")
        )
    if cut != "exact":
        raise ValueError(f"text_ccnet_buckets: unknown cut mode {cut!r}")

    ranked = bucketed_rank(
        docs.join(scores, "doc_id"),
        bucket=F.shiftright(F.floor("avg_surprise").cast("long"), 18),
        order=[F.asc("avg_surprise"), F.asc("doc_id")],
        part_cols=("lang",),
        bucket_asc=True,
        rn="rn",
        n="n_lang",
    )
    return (
        ranked.withColumn("bucket_id", ntile_case("rn", "n_lang", 3).cast("long"))
        .withColumn(
            "bucket",
            F.when(F.col("bucket_id") == 1, F.lit("head"))
            .when(F.col("bucket_id") == 2, F.lit("middle"))
            .otherwise(F.lit("tail")),
        )
        .select("doc_id", "lang", "avg_surprise", "bucket_id", "bucket")
        .orderBy("doc_id")
    )


ORACLE_CCNET = f"""
WITH per AS (
  SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1, COUNT(*) AS c
  FROM (SELECT doc_id, unnest({_O_BG}) AS bg FROM documents)
  GROUP BY 1, 2, 3
), bigram_lm AS (
  SELECT bg, SUM(c) AS bg_c FROM per GROUP BY 1
), ctx_lm AS (
  SELECT w1, SUM(c) AS ctx_c FROM per GROUP BY 1
), vocab AS (
  SELECT COUNT(DISTINCT w) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
), scored AS (
  SELECT doc_id,
         CAST(SUM(c * (({SCALE} * (ctx_c + v)) // (bg_c + 1))) AS DOUBLE)
           / CAST(SUM(c) AS DOUBLE) AS avg_surprise
  FROM per
  JOIN bigram_lm USING (bg)
  JOIN ctx_lm USING (w1)
  CROSS JOIN vocab
  GROUP BY doc_id
), ranked AS (
  SELECT d.doc_id, d.lang, s.avg_surprise,
         CAST(NTILE(3) OVER (PARTITION BY d.lang
                             ORDER BY s.avg_surprise, d.doc_id) AS BIGINT)
           AS bucket_id
  FROM documents d JOIN scored s USING (doc_id)
)
SELECT doc_id, lang, avg_surprise, bucket_id,
       CASE bucket_id WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked
ORDER BY doc_id
"""


QUERIES = {
    "dsir_importance": dsir_importance,
    "lm_bigram_surprise": lm_bigram_surprise,
    "text_ccnet_buckets": text_ccnet_buckets,
}
ORACLES = {
    "dsir_importance": ORACLE_DSIR,
    "lm_bigram_surprise": ORACLE_SURPRISE,
    "text_ccnet_buckets": ORACLE_CCNET,
}


# --- Cross-source trigram LM with stupid backoff ----------------------

_O_TRI = (
    "list_transform(generate_series(1, greatest(len(string_split(text,' ')) - 2, 0)), "
    "i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || "
    "string_split(text,' ')[i+2])"
)

BACKOFF_NUM, BACKOFF_DEN = 2, 5  # stupid-backoff alpha = 0.4 as an exact ratio


def lm_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram score under a CROSS-SOURCE LM with stupid
    backoff (Brants et al. 2007): every doc is scored against the
    n-gram counts of all OTHER sources (total minus own-source — the
    leave-one-source-out trick that makes backoff actually fire, since
    a corpus scored on its own LM never sees an unseen n-gram). Per
    trigram occurrence, integer-scaled:

      seen trigram:  1e6·C3/C2(ctx)
      -> bigram:     0.4·1e6·C2/C1(ctx)      = (2·1e6·C2) div (5·C1)
      -> unigram:    0.4²·1e6·C1/N           = (4·1e6·C1) div (25·N)
      -> unseen:     0

    The score is the domain-shift signal of a curation pipeline (how
    "expected" is this doc under everything else), and the branch
    counters expose the backoff mix per doc.

    Scale shape: three count tables (tri/bi/uni), each kept twice
    (total, per-source) — all map-side-combined aggregates over one
    corpus scan each; scoring joins the per-doc trigram table against
    them on the n-gram key (hash joins on n-gram hash keys; the uni
    and totals sides are small and broadcast-eligible). Everything
    integer ⇒ byte-exact oracle.
    """
    docs = t(spark, sf_dir, "documents")
    tok = tokens("text")

    per = (
        docs.select("doc_id", "source", F.explode(shingles(tok, 3)).alias("tg"))
        .withColumn("w12", F.concat_ws(" ", F.split("tg", " ")[0], F.split("tg", " ")[1]))
        .withColumn("w23", F.concat_ws(" ", F.split("tg", " ")[1], F.split("tg", " ")[2]))
        .withColumn("w2", F.split("tg", " ")[1])
        .withColumn("w3", F.split("tg", " ")[2])
        .groupBy("doc_id", "source", "tg", "w12", "w23", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = docs.select("source", F.explode(shingles(tok, 2)).alias("bg"))
    uni = docs.select("source", F.explode(tok).alias("w"))

    # every (ngram, source) the scorer needs EXISTS in the per-source
    # count table (the n-gram came from a doc of that source), so each
    # lookup level is ONE inner join on (ngram, source) against a
    # table that carries both the own-source count and the corpus
    # total (window sum over the same aggregate — no second join).
    # This halves the join chain vs separate total+source joins:
    # 5 shuffled joins of the trigram table instead of 10.
    from pyspark.sql import Window as W

    def counts(df, key, cname):
        agg = df.groupBy(key, "source").agg(F.count(F.lit(1)).alias(f"{cname}s"))
        return agg.withColumn(
            f"{cname}t", F.sum(f"{cname}s").over(W.partitionBy(key))
        )

    c3 = per.groupBy("tg", "source").agg(F.sum("c").alias("c3s")).withColumn(
        "c3t", F.sum("c3s").over(W.partitionBy("tg"))
    )
    c2 = counts(bi, "bg", "c2")
    c1 = counts(uni, "w", "c1")
    nt = uni.agg(F.count(F.lit(1)).alias("nt"))
    ns = uni.groupBy("source").agg(F.count(F.lit(1)).alias("ns"))

    j = (
        per.join(c3, ["tg", "source"])
        .join(
            c2.select(
                F.col("bg").alias("w12"),
                "source",
                F.col("c2s").alias("c2s_ctx"),
                F.col("c2t"),
            ),
            ["w12", "source"],
        )
        .join(
            c2.select(
                F.col("bg").alias("w23"),
                "source",
                F.col("c2s").alias("c2s_lo"),
                F.col("c2t").alias("c2t_lo"),
            ),
            ["w23", "source"],
        )
        .join(
            c1.select(
                F.col("w").alias("w2"),
                "source",
                F.col("c1s").alias("c1s_ctx"),
                F.col("c1t").alias("c1t_ctx"),
            ),
            ["w2", "source"],
        )
        .join(
            c1.select(
                F.col("w").alias("w3"),
                "source",
                F.col("c1s").alias("c1s_lo"),
                F.col("c1t").alias("c1t_lo"),
            ),
            ["w3", "source"],
        )
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nt))
    )
    o = lambda tot, own: f"({tot} - coalesce({own}, 0))"
    score = (
        f"CASE WHEN {o('c3t', 'c3s')} > 0 THEN ({SCALE} * {o('c3t', 'c3s')}) DIV {o('c2t', 'c2s_ctx')} "
        f"WHEN {o('coalesce(c2t_lo, 0)', 'c2s_lo')} > 0 THEN ({BACKOFF_NUM} * {SCALE} * {o('coalesce(c2t_lo, 0)', 'c2s_lo')}) DIV ({BACKOFF_DEN} * {o('c1t_ctx', 'c1s_ctx')}) "
        f"WHEN {o('coalesce(c1t_lo, 0)', 'c1s_lo')} > 0 THEN ({BACKOFF_NUM * BACKOFF_NUM} * {SCALE} * {o('coalesce(c1t_lo, 0)', 'c1s_lo')}) DIV ({BACKOFF_DEN * BACKOFF_DEN} * (nt - ns)) "
        f"ELSE 0 END"
    )
    branch = (
        f"CASE WHEN {o('c3t', 'c3s')} > 0 THEN 3 "
        f"WHEN {o('coalesce(c2t_lo, 0)', 'c2s_lo')} > 0 THEN 2 "
        f"WHEN {o('coalesce(c1t_lo, 0)', 'c1s_lo')} > 0 THEN 1 ELSE 0 END"
    )
    scored = j.withColumn("s", F.expr(score)).withColumn("br", F.expr(branch))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.col("s")).cast("long").alias("score_sum"),
            F.sum("c").cast("long").alias("n_trigrams"),
            F.sum(F.when(F.col("br") == 3, F.col("c")).otherwise(0)).cast("long").alias("n_tri_hit"),
            F.sum(F.when(F.col("br") == 2, F.col("c")).otherwise(0)).cast("long").alias("n_bi_backoff"),
            F.sum(F.when(F.col("br") == 1, F.col("c")).otherwise(0)).cast("long").alias("n_uni_backoff"),
            F.sum(F.when(F.col("br") == 0, F.col("c")).otherwise(0)).cast("long").alias("n_unseen"),
        )
        .orderBy("doc_id")
    )


ORACLE_TRIGRAM = f"""
WITH per AS (
  SELECT doc_id, source, tg,
         string_split(tg, ' ')[1] || ' ' || string_split(tg, ' ')[2] AS w12,
         string_split(tg, ' ')[2] || ' ' || string_split(tg, ' ')[3] AS w23,
         string_split(tg, ' ')[2] AS w2,
         string_split(tg, ' ')[3] AS w3,
         COUNT(*) AS c
  FROM (SELECT doc_id, source, unnest({_O_TRI}) AS tg FROM documents)
  GROUP BY 1, 2, 3, 4, 5, 6, 7
), c3t AS (SELECT tg, SUM(c) AS c3t FROM per GROUP BY 1),
c3s AS (SELECT tg, source, SUM(c) AS c3s FROM per GROUP BY 1, 2),
bi AS (SELECT source, unnest({_O_BG}) AS bg FROM documents),
c2t AS (SELECT bg, COUNT(*) AS c2t FROM bi GROUP BY 1),
c2s AS (SELECT bg, source, COUNT(*) AS c2s FROM bi GROUP BY 1, 2),
uni AS (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
c1t AS (SELECT w, COUNT(*) AS c1t FROM uni GROUP BY 1),
c1s AS (SELECT w, source, COUNT(*) AS c1s FROM uni GROUP BY 1, 2),
nt AS (SELECT COUNT(*) AS nt FROM uni),
ns AS (SELECT source, COUNT(*) AS ns FROM uni GROUP BY 1),
j AS (
  SELECT per.*,
         (c3t.c3t - COALESCE(x3.c3s, 0)) AS c3o,
         (c2a.c2t - COALESCE(x2a.c2s, 0)) AS c2o_ctx,
         (COALESCE(c2b.c2t, 0) - COALESCE(x2b.c2s, 0)) AS c2o_lo,
         (c1a.c1t - COALESCE(x1a.c1s, 0)) AS c1o_ctx,
         (COALESCE(c1b.c1t, 0) - COALESCE(x1b.c1s, 0)) AS c1o_lo,
         (nt.nt - ns.ns) AS no
  FROM per
  JOIN c3t ON per.tg = c3t.tg
  LEFT JOIN c3s x3 ON per.tg = x3.tg AND per.source = x3.source
  JOIN c2t c2a ON per.w12 = c2a.bg
  LEFT JOIN c2s x2a ON per.w12 = x2a.bg AND per.source = x2a.source
  LEFT JOIN c2t c2b ON per.w23 = c2b.bg
  LEFT JOIN c2s x2b ON per.w23 = x2b.bg AND per.source = x2b.source
  JOIN c1t c1a ON per.w2 = c1a.w
  LEFT JOIN c1s x1a ON per.w2 = x1a.w AND per.source = x1a.source
  LEFT JOIN c1t c1b ON per.w3 = c1b.w
  LEFT JOIN c1s x1b ON per.w3 = x1b.w AND per.source = x1b.source
  JOIN ns ON per.source = ns.source
  CROSS JOIN nt
), sc AS (
  SELECT doc_id, c,
         CASE WHEN c3o > 0 THEN ({SCALE} * c3o) // c2o_ctx
              WHEN c2o_lo > 0 THEN ({BACKOFF_NUM} * {SCALE} * c2o_lo) // ({BACKOFF_DEN} * c1o_ctx)
              WHEN c1o_lo > 0 THEN ({BACKOFF_NUM * BACKOFF_NUM} * {SCALE} * c1o_lo) // ({BACKOFF_DEN * BACKOFF_DEN} * no)
              ELSE 0 END AS s,
         CASE WHEN c3o > 0 THEN 3 WHEN c2o_lo > 0 THEN 2
              WHEN c1o_lo > 0 THEN 1 ELSE 0 END AS br
  FROM j
)
SELECT doc_id,
       CAST(SUM(c * s) AS BIGINT) AS score_sum,
       CAST(SUM(c) AS BIGINT) AS n_trigrams,
       CAST(SUM(CASE WHEN br = 3 THEN c ELSE 0 END) AS BIGINT) AS n_tri_hit,
       CAST(SUM(CASE WHEN br = 2 THEN c ELSE 0 END) AS BIGINT) AS n_bi_backoff,
       CAST(SUM(CASE WHEN br = 1 THEN c ELSE 0 END) AS BIGINT) AS n_uni_backoff,
       CAST(SUM(CASE WHEN br = 0 THEN c ELSE 0 END) AS BIGINT) AS n_unseen
FROM sc
GROUP BY doc_id
ORDER BY doc_id
"""

QUERIES["lm_trigram_backoff"] = lm_trigram_backoff
ORACLES["lm_trigram_backoff"] = ORACLE_TRIGRAM
