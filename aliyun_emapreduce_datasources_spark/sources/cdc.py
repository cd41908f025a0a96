"""CDC record model and merge-apply (change streams → table state).

Reference parity:

- Record-level op types PUT/UPDATE/DELETE in `__ots_record_type__` and
  per-column op types in `__ots_column_type_<c>`
  (TableStoreSource.scala:214-229, TableStoreSourceProvider.scala:159-161).
- ``ots_col_parser``: returns the column value when the column op is
  PUT, NULL when DELETE_ONE_VERSION/DELETE_ALL_VERSION
  (ResolveTableStoreBinlogUDF.scala:29-91) — here a Column expression,
  no UDF needed.
- ``merge``-apply of a change batch onto a snapshot by primary key:
  last change per key wins; DELETE drops the row, PUT/UPDATE upserts
  (KuduUpdatableRelation.scala:39-73 merge(data, opTypeColumn); the
  Delta CDC example materializes the same way —
  examples/.../DeltaTableStoreCDC.scala).

Scale note: apply_cdc is one shuffle on the primary key (window to
pick the last change) plus a key-partitioned full outer join — the
same plan a Delta MERGE produces, with no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["PUT", "UPDATE", "DELETE", "ots_col_parser", "apply_cdc", "scd2_history"]

PUT = "PUT"
UPDATE = "UPDATE"
DELETE = "DELETE"


def ots_col_parser(value_col: str | Column, col_type_col: str | Column) -> Column:
    """value if the per-column op is PUT else NULL
    (ResolveTableStoreBinlogUDF semantics, all five type overloads
    collapse to one generic expression in Spark)."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    ct = F.col(col_type_col) if isinstance(col_type_col, str) else col_type_col
    return F.when(ct == PUT, v).otherwise(F.lit(None))


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "__ots_record_type__",
    seq_col: str = "__ots_record_timestamp__",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Apply a CDC batch to a snapshot; returns the new table state.

    changes carries the snapshot's columns + op_col + seq_col. The
    latest change per key (max seq) wins; equal sequence values (two
    ops in the same timestamp tick) tie-break on ``tiebreak_col`` if
    given, else DELETE-last — without a total order the winner would
    follow shuffle order and a replay could produce a different table
    state. Result:
      key only in snapshot            -> snapshot row
      latest change DELETE            -> row dropped
      latest change PUT/UPDATE        -> change row (upsert)
    """
    data_cols = [c for c in snapshot.columns]
    order = [F.col(seq_col).desc()]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col).desc())
    # deterministic final tiebreaks: at equal seq (and tiebreak), a
    # DELETE is considered the later op — tombstone wins, matching the
    # reference's delete-dominates merge (KuduOperator upsert/delete) —
    # and same-op ties order on a payload hash so the winner is a
    # total function of the data, never of shuffle order
    order.append((F.col(op_col) == F.lit(DELETE)).desc())
    order.append(F.xxhash64(*[F.col(c) for c in data_cols]).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*data_cols, F.col(op_col).alias("_op"))
    )
    s = snapshot.alias("s")
    c = latest.alias("c")
    cond = None
    for k in keys:
        e = F.col(f"s.{k}").eqNullSafe(F.col(f"c.{k}"))
        cond = e if cond is None else cond & e
    joined = s.join(c, cond, "full_outer")
    out_cols = []
    has_change = F.col("c._op").isNotNull()
    for col in data_cols:
        out_cols.append(
            F.when(has_change, F.col(f"c.{col}")).otherwise(F.col(f"s.{col}")).alias(col)
        )
    return joined.where(~has_change | (F.col("c._op") != DELETE)).select(*out_cols)


def scd2_history(
    changes: DataFrame,
    keys: list[str],
    op_col: str,
    seq_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing history from a change log: one row per
    non-DELETE change with ``valid_from`` = its sequence value,
    ``valid_to`` = the next change's (any op, so a DELETE closes the
    interval it tombstones), ``is_current`` when no later change
    exists. The type-2 complement of apply_cdc (which keeps only the
    latest state); this is how a warehouse dimension retains history
    while CDC replays over it.

    Scale: exactly one shuffle — the key-partitioned window that
    computes lead(seq). No join, no state beyond one partition's
    sort; identical cost profile to any windowed dedup at 100 TB.
    """
    order = [F.col(seq_col)]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        changes.withColumn("valid_from", F.col(seq_col))
        .withColumn("valid_to", F.lead(seq_col).over(w))
        .where(F.col(op_col) != DELETE)
        .withColumn("is_current", F.col("valid_to").isNull())
    )
