"""KV / wide-row table semantics: JSON catalog + filter pushdown.

Reference parity (emr-tablestore):

- JSON "catalog" option declaring name/type per column and the primary
  keys, parsed into a Spark schema (TableStoreCatalog.scala:29-49;
  HBase SHC uses the same shape — HBaseSourceProvider.scala:60-65).
- A filter compiler able to push And/Or/Not/EQ(/NE)/GT/GE/LT/LE/In/
  IsNull/StartsWith trees, normalizing Not via De Morgan before
  compilation (TableStoreFilter.scala:33-121; Not handling :46-87).
- Pruned + filtered scans (`buildScan(requiredColumns, filters)` —
  TableStoreRelation.scala:110-144).

On our engine the storage is parquet and Catalyst performs the actual
pushdown — the compiler's job is to turn the connector-level filter
tree (the wire format a KV store understands) into Column predicates
that Catalyst *can* push, which tests assert via the physical plan's
PushedFilters. ``unhandled`` mirrors S3: filters the KV store cannot
evaluate remotely (here: none for supported nodes; unsupported nodes
are returned as residual, like TableStoreRelation.unhandledFilters).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["KVCatalog", "KVTable", "compile_filter", "split_supported"]


# Filter tree node shape: tuples, e.g.
#   ("and", f1, f2) ("or", f1, f2) ("not", f)
#   ("eq", col, v) ("ne", col, v) ("gt", col, v) ("ge", col, v)
#   ("lt", col, v) ("le", col, v) ("in", col, [v...])
#   ("isnull", col) ("isnotnull", col) ("startswith", col, prefix)
FilterNode = tuple


@dataclass
class KVCatalog:
    """User-declared schema for a KV table (JSON catalog option)."""

    table: str
    columns: dict[str, str]  # name -> spark DDL type
    primary_keys: list[str]

    @classmethod
    def from_json(cls, catalog_json: str) -> "KVCatalog":
        c = json.loads(catalog_json)
        return cls(
            table=c.get("table", "kv"),
            columns={k: v["type"] if isinstance(v, dict) else v for k, v in c["columns"].items()},
            primary_keys=c.get("primary_keys", []),
        )

    def schema(self) -> T.StructType:
        ddl = ", ".join(f"{name} {typ}" for name, typ in self.columns.items())
        return T.StructType.fromDDL(ddl)


_LEAF = {
    "eq": lambda c, v: F.col(c) == F.lit(v),
    "ne": lambda c, v: F.col(c) != F.lit(v),
    "gt": lambda c, v: F.col(c) > F.lit(v),
    "ge": lambda c, v: F.col(c) >= F.lit(v),
    "lt": lambda c, v: F.col(c) < F.lit(v),
    "le": lambda c, v: F.col(c) <= F.lit(v),
    "startswith": lambda c, v: F.col(c).startswith(v),
}

# De Morgan dual used when a Not is pushed down onto a composite
# (TableStoreFilter normalizes Not(And)/Not(Or) the same way).
_NEG_LEAF = {
    "eq": "ne",
    "ne": "eq",
    "gt": "le",
    "ge": "lt",
    "lt": "ge",
    "le": "gt",
    "isnull": "isnotnull",
    "isnotnull": "isnull",
}


def compile_filter(node: FilterNode, negate: bool = False) -> Column:
    """Compile a connector filter tree into a Catalyst Column.

    ``negate`` threads Not through the tree (De Morgan), mirroring
    TableStoreFilter.scala:46-87 instead of emitting a NOT wrapper the
    store could not push.
    """
    op = node[0]
    if op == "and":
        sub = [compile_filter(n, negate) for n in node[1:]]
        out = sub[0]
        for s in sub[1:]:
            out = (out | s) if negate else (out & s)
        return out
    if op == "or":
        sub = [compile_filter(n, negate) for n in node[1:]]
        out = sub[0]
        for s in sub[1:]:
            out = (out & s) if negate else (out | s)
        return out
    if op == "not":
        return compile_filter(node[1], not negate)
    if op == "in":
        col, values = node[1], node[2]
        c = F.col(col).isin(*values)
        return ~c if negate else c
    if op == "isnull":
        return F.col(node[1]).isNotNull() if negate else F.col(node[1]).isNull()
    if op == "isnotnull":
        return F.col(node[1]).isNull() if negate else F.col(node[1]).isNotNull()
    if op == "startswith":
        c = _LEAF[op](node[1], node[2])
        return ~c if negate else c
    if op == "contains":
        c = F.col(node[1]).contains(node[2])
        return ~c if negate else c
    if op == "endswith":
        c = F.col(node[1]).endswith(node[2])
        return ~c if negate else c
    if op in _LEAF:
        eff = _NEG_LEAF[op] if negate else op
        return _LEAF[eff](node[1], node[2])
    raise ValueError(f"unsupported filter node {op!r}")


# the store's push capability is a strict SUBSET of what Spark can
# evaluate: contains/endswith compile to Catalyst predicates but the
# KV filter tree cannot push them (the OTS tree has StartsWith only —
# TableStoreFilter.scala:33-121), so they come back as residuals that
# scan() applies post-scan.
_SUPPORTED = {"and", "or", "not", "in", "isnull", "isnotnull", "startswith", *_LEAF}


def split_supported(filters: list[FilterNode]) -> tuple[list[FilterNode], list[FilterNode]]:
    """(pushable, residual) — the S3 unhandledFilters split. A tree is
    pushable only if every node is supported (composite trees with one
    unsupported leaf stay residual, like OTS rejecting the whole
    subtree)."""

    def ok(node: FilterNode) -> bool:
        op = node[0]
        if op not in _SUPPORTED:
            return False
        if op in ("and", "or"):
            return all(ok(n) for n in node[1:])
        if op == "not":
            return ok(node[1])
        return True

    pushable = [f for f in filters if ok(f)]
    residual = [f for f in filters if not ok(f)]
    return pushable, residual


@dataclass
class KVTable:
    """Catalog-declared KV table over a parquet path (the local
    substitute for an OTS/HBase store)."""

    catalog: KVCatalog
    path: str

    def load(self, spark: SparkSession) -> DataFrame:
        df = spark.read.schema(self.catalog.schema()).parquet(self.path)
        return df

    def scan(
        self,
        spark: SparkSession,
        required_columns: list[str] | None = None,
        filters: list[FilterNode] | None = None,
    ) -> DataFrame:
        """buildScan(requiredColumns, filters): pruned, filtered scan.
        Pushable filters compile into the scan predicate (Catalyst
        pushes them to parquet); residuals are applied post-scan —
        same split as TableStoreRelation.scala:110-144 + :364-438."""
        df = self.load(spark)
        pushable, residual = split_supported(filters or [])
        for f in pushable:
            df = df.where(compile_filter(f))
        for f in residual:
            # a residual node is one the KV store can't push but Spark
            # can still evaluate; one compile_filter can't express at
            # all is a caller error — surface it as such instead of
            # the bare ValueError mid-scan
            try:
                df = df.where(compile_filter(f))
            except ValueError as exc:
                raise ValueError(
                    f"filter {f!r} is neither pushable nor evaluable "
                    f"post-scan: {exc}"
                ) from exc
        if required_columns:
            df = df.select(*required_columns)
        return df
