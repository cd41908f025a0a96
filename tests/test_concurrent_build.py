"""Round-11 optimization: check entries whose two independent sides run
EAGER construction phases (checkpointed pair pipelines, bounded edge
collects, quantizer-sample collects) build those sides from a small
thread pool (guide §2.6) so the phases overlap instead of serializing.

Each thread only CONSTRUCTS its side's DataFrame, so the assembled plan
— and therefore the result — must be identical to the sequential build.
These tests pin that parity for both pooled entries
(`ann_rank_consistency_check` got the treatment in continuation 2 with
A/B-time parity asserts only; `dedup_minhash_cluster_containment_check`
joined in continuation 3).
"""

from __future__ import annotations


def _canon(df):
    pdf = df.toPandas()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def test_containment_check_concurrent_equals_sequential(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.dedup.properties import (
        minhash_cluster_containment_violations,
    )

    seq = _canon(minhash_cluster_containment_violations(spark, sf_dir, concurrent=False))
    con = _canon(minhash_cluster_containment_violations(spark, sf_dir, concurrent=True))
    assert seq.equals(con)


def test_ann_rank_check_concurrent_equals_sequential(spark, sf_dir):
    from aliyun_emapreduce_datasources_spark.similarity.properties import (
        ann_rank_consistency_violations,
    )

    seq = _canon(ann_rank_consistency_violations(spark, sf_dir, concurrent=False))
    con = _canon(ann_rank_consistency_violations(spark, sf_dir, concurrent=True))
    assert seq.equals(con)
