"""Driver-side query-batch guard for the ANN operators.

Every ANN entry point collects the QUERY side to the driver (to
broadcast a probe matrix); that contract is only safe while the query
batch is small relative to the corpus. An unguarded `.collect()` turns
a mis-aimed call (query table = corpus table) into a silent driver
OOM — so the collect is capped: `limit(cap + 1)` bounds what can ever
reach the driver, and crossing the cap raises with the remediation
(chunk the query batch, or flip the call so the big side is the
corpus, which always stays distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["MAX_QUERY_ROWS", "collect_query_batch"]

# 100k queries x 64-dim float64 ~ 51 MB on the driver / per broadcast —
# comfortable; beyond it the broadcast-matrix formulation stops being
# the right plan.
MAX_QUERY_ROWS = 100_000


def collect_query_batch(queries: DataFrame, columns: list[str], cap: int = MAX_QUERY_ROWS):
    """Collect the query side, refusing loudly above ``cap`` rows.

    The limit is applied in-plan (`limit(cap+1)`), so the driver never
    materializes more than cap+1 rows even when the check fails."""
    rows = queries.select(*columns).limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"ANN query batch exceeds the driver-side cap ({cap} rows). "
            "The query side is collected and broadcast by contract; for "
            "larger batches, chunk the queries or swap the sides so the "
            "large table is the (always-distributed) corpus."
        )
    return rows


def empty_topk(spark):
    """Empty (query_id, neighbor_id, rnk) result — the well-defined
    answer every ANN variant returns when the query batch is empty
    (empty corpus, or a filter matched no query rows): no queries, no
    neighbors, instead of an IndexError on a zero-row matrix."""
    return spark.createDataFrame([], "query_id long, neighbor_id long, rnk long")
