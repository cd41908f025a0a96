"""Exact distributed embedding covariance + All-but-the-Top transform.

``emb_covariance`` computes the full (upper-triangle) covariance
matrix of the embedding corpus as ONE distributed aggregate — the
cluster-side half of every whitening / PCA / anisotropy-correction
pipeline. The architectural point: at any corpus size the hard part
is the Σ x xᵀ reduction over the data; the eigendecomposition of the
resulting dims×dims table (64×64 here, a few thousand square at
production dims) is driver/numpy work BY DESIGN — a 16 MB matrix does
not need a cluster. This is the standard split (Spark MLlib's
``RowMatrix.computePrincipalComponents`` does exactly this: gramian
on executors, LAPACK on the driver).

Exactness: elements quantize to micro ints (the label_centroids /
dim_profile convention); the pairwise sums Σ q_a·q_b are int64
(|q|≤2e6 → products ≤ 4e12; safe through ~10⁶ vectors per the int64
budget), and the covariance finishes with the SAME written-out IEEE
sequence both engines evaluate identically:
``cov = (s_ab/n)/1e12 − ((s_a/n)/1e6)·((s_b/n)/1e6)`` — single-pass
sum-of-products, immune to cancellation because the sums are exact
integers, bit-identical under any partitioning.

Scale shape: the in-row pair expansion emits d(d+1)/2 rows per vector
(2,080 at d=64) but the (dim_a, dim_b) hash aggregate combines
map-side — each task ships at most 2,080 partial rows no matter how
many vectors it read. At production dims (1–4k) the expansion factor
grows quadratically; the swap is mapInPandas partial Gram blocks
(one numpy ``X.T @ X`` per Arrow batch, emitting the same per-pair
partial sums), identical shuffle shape, BLAS inner loop.

``abtt_residual_violations`` (companion, empty-set oracle) pins the
All-but-the-Top transform (Mu & Viswanath 2018): subtract the corpus
mean, project out the top principal direction (driver eigh of the
exact covariance — deterministic: the input matrix is bit-identical
ints-derived doubles), renormalize. Two properties hold REGARDLESS of
the spectrum (no convergence assumption, valid even on this
near-isotropic synthetic corpus): (1) the transformed corpus mean
vanishes dimension-wise; (2) the transformed vectors carry zero
projection onto the removed direction. Violations beyond float-fold
tolerance are emitted; the driver hash-checks the empty set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aliyun_emapreduce_datasources_spark.operators.common import t

__all__ = [
    "embedding_covariance",
    "abtt_residual_violations",
    "QUERIES",
    "ORACLES",
]

QSCALE = 1_000_000


def _q_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    qarr = F.transform(
        "embedding",
        lambda e: F.floor(e.cast("double") * F.lit(float(QSCALE))).cast("long"),
    )
    return (
        emb.select(qarr.alias("q"))
        .select(F.posexplode("q").alias("dim_a", "qa"), "q")
        .select("dim_a", "qa", F.posexplode("q").alias("dim_b", "qb"))
        .where(F.col("dim_b") >= F.col("dim_a"))
    )


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _q_pairs(spark, sf_dir)
    agg = pairs.groupBy(
        F.col("dim_a").cast("long").alias("dim_a"),
        F.col("dim_b").cast("long").alias("dim_b"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("qa").cast("long").alias("s_a"),
        F.sum("qb").cast("long").alias("s_b"),
        F.sum(F.col("qa") * F.col("qb")).cast("long").alias("s_ab"),
    )
    nd = F.col("n").cast("double")
    mean_a = (F.col("s_a").cast("double") / nd) / F.lit(1e6)
    mean_b = (F.col("s_b").cast("double") / nd) / F.lit(1e6)
    return (
        agg.withColumn(
            "cov",
            (F.col("s_ab").cast("double") / nd) / F.lit(1e12) - mean_a * mean_b,
        )
        .select("dim_a", "dim_b", "n", "cov")
        .orderBy("dim_a", "dim_b")
    )


ORACLE_COV = f"""
WITH q AS (
  SELECT vec_id,
         CAST(i - 1 AS BIGINT) AS dim,
         CAST(FLOOR(CAST(e AS DOUBLE) * {QSCALE}.0) AS BIGINT) AS qe
  FROM (
    SELECT vec_id, unnest(embedding) AS e, generate_subscripts(embedding, 1) AS i
    FROM embeddings
  )
), pairs AS (
  SELECT a.dim AS dim_a, b.dim AS dim_b, a.qe AS qa, b.qe AS qb
  FROM q a JOIN q b ON a.vec_id = b.vec_id AND b.dim >= a.dim
), agg AS (
  SELECT dim_a, dim_b,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(qa) AS BIGINT) AS s_a,
         CAST(SUM(qb) AS BIGINT) AS s_b,
         CAST(SUM(qa * qb) AS BIGINT) AS s_ab
  FROM pairs GROUP BY dim_a, dim_b
)
SELECT dim_a, dim_b, n,
       (CAST(s_ab AS DOUBLE) / CAST(n AS DOUBLE)) / 1e12
         - ((CAST(s_a AS DOUBLE) / CAST(n AS DOUBLE)) / 1e6)
           * ((CAST(s_b AS DOUBLE) / CAST(n AS DOUBLE)) / 1e6) AS cov
FROM agg
ORDER BY dim_a, dim_b
"""


# Tolerance for the ABTT identity checks. Lower bound it must clear:
# μ comes from FLOOR-quantized micro-int sums while centering subtracts
# it from raw doubles, so each dim's mean residual is structurally up
# to 1/QSCALE = 1e-6 (the quantization bias) even for a perfect
# transform. 1e-5 dominates that bias by 10× while still catching any
# real centering/projection defect (which shows up at the data scale,
# ~1e-1) — the old 1e-6 sat knife-edge ON the bias and only held
# because this corpus' per-dim bias happened to cancel.
ABTT_TOL = 1e-5


def _abtt_mu_u(spark: SparkSession, sf_dir: str):
    """Corpus mean (micro-int exact) + top eigendirection of the exact
    covariance via driver eigh — both deterministic (bit-identical
    aggregate inputs; LAPACK eigh is deterministic per platform).
    Returns (dims, mu_list, u_list) or None on an empty corpus."""
    import numpy as np

    cov_rows = embedding_covariance(spark, sf_dir).collect()
    if not cov_rows:
        return None
    dims = max(int(r["dim_b"]) for r in cov_rows) + 1
    C = np.zeros((dims, dims))
    n = 0
    for r in cov_rows:
        C[r["dim_a"], r["dim_b"]] = C[r["dim_b"], r["dim_a"]] = r["cov"]
        n = r["n"]
    _, V = np.linalg.eigh(C)
    u = V[:, -1]
    if u[int(np.argmax(np.abs(u)))] < 0:
        u = -u  # canonical sign
    emb = t(spark, sf_dir, "embeddings")
    stats = (
        emb.select(F.posexplode("embedding").alias("dim", "e"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("e").cast("double") * F.lit(float(QSCALE))).cast("long"))
            .alias("s1"),
        )
        .collect()
    )
    mu = [0.0] * dims
    for r in stats:
        mu[r["dim"]] = float(r["s1"]) / float(r["n"]) / float(QSCALE)
    return dims, mu, [float(x) for x in u]


def abtt_residual_violations(
    spark: SparkSession, sf_dir: str, _mutate_skip_projection: bool = False
) -> DataFrame:
    """(kind, idx, residual) rows where the ABTT-transformed corpus
    violates its defining identities beyond tolerance — empty set.

    kind='mean': per-dim |Σ_i y_ij| / n beyond ABTT_TOL (centering
    must survive the projection: u(u·Σc_i)=0 term-by-term).
    kind='proj': per-vector |u·y_i| beyond ABTT_TOL (the removed
    direction carries no energy after projection).

    The transform runs in-row against broadcast literal μ and u (no
    shuffle, no UDF); the reductions are plain aggregates.

    ``_mutate_skip_projection`` is the mutation-sensitivity hook
    (tests only): centering WITHOUT the projection step must light up
    the 'proj' violations — proving the check can actually fire.
    """
    packed = _abtt_mu_u(spark, sf_dir)
    if packed is None:
        return spark.createDataFrame([], "kind string, idx long, residual double")
    dims, mu, u = packed
    emb = t(spark, sf_dir, "embeddings")
    mu_arr = F.array(*[F.lit(m) for m in mu])
    u_arr = F.array(*[F.lit(c) for c in u])
    centered = F.zip_with("embedding", mu_arr, lambda e, m: e.cast("double") - m)
    proj = F.aggregate(
        F.zip_with(centered, u_arr, lambda c, b: c * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    if _mutate_skip_projection:
        y = centered
    else:
        y = F.zip_with(centered, u_arr, lambda c, b: c - F.col("_p") * b)
    rows = emb.select("vec_id", proj.alias("_p"), "embedding").select(
        "vec_id", "_p", y.alias("y")
    )
    reproj = F.abs(
        F.aggregate(
            F.zip_with("y", u_arr, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    proj_bad = (
        rows.select("vec_id", reproj.alias("residual"))
        .where(F.col("residual") > F.lit(ABTT_TOL))
        .select(F.lit("proj").alias("kind"), F.col("vec_id").alias("idx"), "residual")
    )
    mean_bad = (
        rows.select(F.posexplode("y").alias("dim", "yj"))
        .groupBy("dim")
        .agg(F.abs(F.sum("yj") / F.count(F.lit(1))).alias("residual"))
        .where(F.col("residual") > F.lit(ABTT_TOL))
        .select(F.lit("mean").alias("kind"), F.col("dim").cast("long").alias("idx"), "residual")
    )
    return proj_bad.unionAll(mean_bad).orderBy("kind", "idx")


QUERIES = {
    "emb_covariance": embedding_covariance,
    "emb_abtt_residual_check": abtt_residual_violations,
}

ORACLES = {
    "emb_covariance": ORACLE_COV,
    "emb_abtt_residual_check": (
        "SELECT CAST(NULL AS VARCHAR) AS kind, CAST(NULL AS BIGINT) AS idx,"
        " CAST(NULL AS DOUBLE) AS residual WHERE FALSE"
    ),
}
