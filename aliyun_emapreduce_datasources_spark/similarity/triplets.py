"""Contrastive training-pair generation: deterministic
(anchor, positive, negative) triplets from a labeled embedding table —
the data-prep step for contrastive/metric-learning fine-tunes
(in-batch negatives, triplet loss).

Sampling rules are pure window arithmetic so the output is
reproducible under repartition/retry AND expressible in SQL for the
oracle (the same portability argument as the md5 sampling coins):

- positive: the next vec_id within the anchor's label, cyclically —
  every anchor gets exactly one positive, every vector serves as a
  positive exactly once per label;
- negative: in the NEXT label (cyclic by dense label rank), the
  vector whose row-number equals the anchor's row-number modulo that
  label's size — deterministic, roughly uniform over the negative
  label, never the anchor's own label.

Labels with a single member emit no triplet (a positive would equal
the anchor), and a corpus with a single DISTINCT label emits none at
all (the "next label" would be the anchor's own, making the anchor
its own negative) — both mirrored in the oracle.

Scale shape: two window passes over (label, vec_id) ordering — one
shuffle on label — plus one join keyed by (label_rank, row_number) on
pre-reduced per-label sizes (broadcast; |labels| rows). No pair
explosion: output is exactly one row per eligible anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = ["contrastive_triplets", "QUERY", "ORACLE"]


def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings").select("vec_id", "label")
    w = Window.partitionBy("label").orderBy("vec_id")
    sizes = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    # dense cyclic label order
    lw = Window.orderBy("label")
    labels = sizes.withColumn("lrank", F.row_number().over(lw))
    n_labels = labels.select(F.count(F.lit(1)).alias("n_labels"))

    anchors = (
        emb.withColumn("rn", F.row_number().over(w))
        .withColumn("pos_id", F.lead("vec_id").over(w))
        .withColumn("first_id", F.first("vec_id").over(w))
        .withColumn("pos_id", F.coalesce("pos_id", "first_id"))
        .where(F.col("pos_id") != F.col("vec_id"))  # singleton labels drop
    )
    a = (
        anchors.join(F.broadcast(labels), "label")
        .crossJoin(F.broadcast(n_labels))
        # with one distinct label the "next label" cycles back to the
        # anchor's own and the negative degenerates to the anchor —
        # emit nothing instead of useless triplets
        .where(F.col("n_labels") >= 2)
        .withColumn("neg_lrank", F.col("lrank") % F.col("n_labels") + 1)
    )
    negatives = (
        emb.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(labels), "label")
        .select(
            F.col("lrank").alias("neg_lrank"),
            F.col("rn").alias("neg_rn"),
            F.col("vec_id").alias("neg_id"),
        )
    )
    neg_sizes = labels.select(
        F.col("lrank").alias("neg_lrank"), F.col("n").alias("neg_n")
    )
    return (
        a.join(F.broadcast(neg_sizes), "neg_lrank")
        .withColumn("neg_rn", (F.col("rn") - 1) % F.col("neg_n") + 1)
        .join(negatives, ["neg_lrank", "neg_rn"])
        .select(
            F.col("vec_id").alias("anchor_id"),
            F.col("pos_id").cast("long").alias("pos_id"),
            F.col("neg_id").cast("long").alias("neg_id"),
            F.col("label").cast("long").alias("anchor_label"),
        )
        .orderBy("anchor_id")
    )


QUERY = contrastive_triplets

ORACLE = """
WITH e AS (
  SELECT vec_id, label,
         row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn,
         lead(vec_id) OVER (PARTITION BY label ORDER BY vec_id) AS nxt,
         first_value(vec_id) OVER (PARTITION BY label ORDER BY vec_id) AS fst
  FROM embeddings
), sizes AS (
  SELECT label, COUNT(*) AS n,
         row_number() OVER (ORDER BY label) AS lrank
  FROM embeddings GROUP BY label
), nl AS (
  SELECT COUNT(*) AS n_labels FROM sizes
), anchors AS (
  SELECT e.vec_id, e.label, e.rn, COALESCE(e.nxt, e.fst) AS pos_id,
         s.lrank % nl.n_labels + 1 AS neg_lrank
  FROM e JOIN sizes s USING (label) CROSS JOIN nl
  WHERE COALESCE(e.nxt, e.fst) != e.vec_id AND nl.n_labels >= 2
), negatives AS (
  SELECT s.lrank AS neg_lrank, e.rn AS neg_rn, e.vec_id AS neg_id
  FROM e JOIN sizes s USING (label)
)
SELECT a.vec_id AS anchor_id,
       CAST(a.pos_id AS BIGINT) AS pos_id,
       CAST(n.neg_id AS BIGINT) AS neg_id,
       CAST(a.label AS BIGINT) AS anchor_label
FROM anchors a
JOIN sizes ns ON ns.lrank = a.neg_lrank
JOIN negatives n
  ON n.neg_lrank = a.neg_lrank AND n.neg_rn = (a.rn - 1) % ns.n + 1
ORDER BY anchor_id
"""
