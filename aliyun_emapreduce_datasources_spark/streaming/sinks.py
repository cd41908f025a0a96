"""Sink patterns from the reference, on foreachBatch.

- Idempotent-by-batchId sink (S8: TableStoreSink.addBatch skips
  batchIds already written — TableStoreSink.scala:33-42; Redis re-write
  keyed by batchId — RedisRelation.scala:40-47).
- Exactly-once two-phase sink log (S23: JDBCSinkLog records batchId
  UNCOMMITTED → writes data → marks COMMITTED; on restart an
  UNCOMMITTED batch is deleted and replayed — JDBCSinkLog.scala:25-110).
  The transactional store here is SQLite (stdlib) standing in for the
  JDBC target; the protocol is the point.

Both are `writeStream.foreachBatch(...)` callbacks — the public-Spark
shape of the reference's Sink.addBatch implementations.
"""

from __future__ import annotations

import os
import sqlite3
from collections.abc import Callable

from pyspark.sql import DataFrame

__all__ = ["IdempotentBatchSink", "SQLiteExactlyOnceSink"]


class IdempotentBatchSink:
    """Skip re-delivered batchIds (micro-batch retries after failure).

    write_fn receives the batch DataFrame exactly once per batchId even
    if Structured Streaming re-attempts the batch.
    """

    def __init__(self, write_fn: Callable[[DataFrame, int], None]):
        self.write_fn = write_fn
        self.seen: set[int] = set()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self.seen:
            return
        self.write_fn(batch_df, batch_id)
        self.seen.add(batch_id)


class SQLiteExactlyOnceSink:
    """Two-phase commit-log sink (JDBCSinkLog protocol, S23).

    Log table `<table>$_STREAM_LOG(batch_id, status)`:
      - on addBatch: if batchId COMMITTED → skip (replay);
        if UNCOMMITTED → delete that batch's rows (partial write) and
        re-insert; else log UNCOMMITTED, write rows tagged with the
        batchId, flip to COMMITTED in the same transaction end.
    """

    PENDING = "UNCOMMITTED"
    COMMITTED = "COMMITTED"

    def __init__(self, db_path: str, table: str, columns: list[str]):
        self.db_path = db_path
        self.table = table
        self.columns = columns
        self.log_table = f"{table}__stream_log"
        with self._conn() as con:
            cols = ", ".join(f"{c} TEXT" for c in columns)
            con.execute(f"CREATE TABLE IF NOT EXISTS {table} (_batch_id INTEGER, {cols})")
            con.execute(
                f"CREATE TABLE IF NOT EXISTS {self.log_table} (batch_id INTEGER PRIMARY KEY, status TEXT)"
            )

    def _conn(self) -> sqlite3.Connection:
        os.makedirs(os.path.dirname(self.db_path) or ".", exist_ok=True)
        return sqlite3.connect(self.db_path)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        rows = [tuple(str(v) for v in r) for r in batch_df.select(*self.columns).collect()]
        with self._conn() as con:
            status = con.execute(
                f"SELECT status FROM {self.log_table} WHERE batch_id = ?", (batch_id,)
            ).fetchone()
            if status and status[0] == self.COMMITTED:
                return  # replayed batch, already durable
            if status and status[0] == self.PENDING:
                # crashed mid-write: purge the partial batch, replay
                con.execute(f"DELETE FROM {self.table} WHERE _batch_id = ?", (batch_id,))
                con.execute(f"DELETE FROM {self.log_table} WHERE batch_id = ?", (batch_id,))
            con.execute(f"INSERT INTO {self.log_table} VALUES (?, ?)", (batch_id, self.PENDING))
            placeholders = ", ".join(["?"] * (1 + len(self.columns)))
            con.executemany(
                f"INSERT INTO {self.table} VALUES ({placeholders})",
                [(batch_id, *r) for r in rows],
            )
            con.execute(
                f"UPDATE {self.log_table} SET status = ? WHERE batch_id = ?",
                (self.COMMITTED, batch_id),
            )

    def read_all(self) -> list[tuple]:
        with self._conn() as con:
            return con.execute(
                f"SELECT {', '.join(self.columns)} FROM {self.table} ORDER BY _batch_id"
            ).fetchall()
