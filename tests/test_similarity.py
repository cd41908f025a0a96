"""ANN quality: the LSH-bucketed and IVF-probed searches must reach
usable recall@k against the exact brute-force baseline on the same
query set."""

from __future__ import annotations

from aliyun_emapreduce_datasources_spark.similarity import bruteforce, ivf, lsh


def _recall(exact_rows, approx_rows) -> float:
    exact_sets = {}
    for r in exact_rows:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx_sets = {}
    for r in approx_rows:
        approx_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(v) for v in exact_sets.values())
    return hits / total


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    exact = bruteforce.QUERY(spark, sf_dir).collect()
    approx = lsh.QUERY(spark, sf_dir).collect()
    recall = _recall(exact, approx)
    # multi-probe 12-bit LSH on 64-dim random vectors: recall is
    # modest by construction; the floor guards against regressions
    # (e.g. a broken signature making buckets random).
    assert recall >= 0.3, f"LSH recall@5 collapsed: {recall:.2f}"


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    exact = bruteforce.QUERY(spark, sf_dir).collect()
    approx = ivf.QUERY(spark, sf_dir).collect()
    recall = _recall(exact, approx)
    # nprobe/K = 4/16 of the corpus scanned; near-neighbors concentrate
    # in the probed clusters so recall should beat the scan fraction
    assert recall >= 0.4, f"IVF recall@5 collapsed: {recall:.2f}"


def test_bruteforce_ranks_are_dense_per_query(spark, sf_dir):
    rows = bruteforce.QUERY(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rnk)
    for q, rnks in by_q.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))


def test_int8_recall_vs_bruteforce(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.similarity import quantize

    exact = bruteforce.QUERY(spark, sf_dir).collect()
    approx = quantize.QUERY(spark, sf_dir).collect()
    recall = _recall(exact, approx)
    # int8 error ~1e-2 with 4x candidate oversampling + exact rescore:
    # near-lossless in practice
    assert recall >= 0.9, f"int8+rescore recall@5 collapsed: {recall:.2f}"


def test_ann_query_batch_cap_fires(spark):
    """The driver-side query collect refuses batches above the cap with
    a clear remediation, and never materializes more than cap+1 rows
    (the limit is in-plan)."""
    import pytest
    from pyspark.sql import functions as F

    from aliyun_emapreduce_datasources_spark.similarity.guard import collect_query_batch

    q = spark.range(50).select(
        F.col("id").alias("query_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("q_embedding"),
    )
    with pytest.raises(ValueError, match="query batch exceeds"):
        collect_query_batch(q, ["query_id", "q_embedding"], cap=10)
    # under the cap: passes rows through untouched
    assert len(collect_query_batch(q, ["query_id", "q_embedding"], cap=100)) == 50


def test_pq_recall_vs_bruteforce(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.similarity import pq

    exact = bruteforce.QUERY(spark, sf_dir).collect()
    approx = pq.QUERY(spark, sf_dir).collect()
    recall = _recall(exact, approx)
    # ADC over 4x32 codebooks with a 40-candidate exact rescore: the
    # shortlist is 8x the final k, so true neighbors that survive
    # quantization are re-ranked exactly — recall well above the
    # no-rescore ADC ceiling.
    assert recall >= 0.5, f"PQ recall@5 collapsed: {recall:.2f}"


def test_contrastive_triplets_semantics(spark, sf_dir):
    """Positives share the anchor's label, negatives never do, one
    triplet per eligible anchor, and no degenerate pairs."""
    from aliyun_emapreduce_datasources_spark.similarity.triplets import (
        contrastive_triplets,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    label_of = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    rows = contrastive_triplets(spark, sf_dir).collect()
    assert rows
    anchors = [r.anchor_id for r in rows]
    assert len(anchors) == len(set(anchors))
    for r in rows:
        assert label_of[r.pos_id] == label_of[r.anchor_id]
        assert label_of[r.neg_id] != label_of[r.anchor_id]
        assert r.pos_id != r.anchor_id and r.neg_id != r.anchor_id
