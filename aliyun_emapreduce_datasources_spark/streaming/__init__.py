"""Structured-Streaming layer: the reference's streaming-SQL semantics
(SURVEY.md §2.2) and connector source/sink patterns (§2.1) on public
PySpark.

- ``windows``  — TUMBLING/HOPPING window group keys, delay() watermark
                 (emr-baseline-testing README extended-SQL semantics).
- ``sources``  — stream-table abstraction over file/rate sources with
                 Loghub-style system columns (S12) and TableStore-style
                 CDC schema augmentation (S6).
- ``sinks``    — idempotent-by-batchId sinks (S8), exactly-once
                 sink-commit-log (S23 JDBCSinkLog pattern), memory sink
                 test harness.
- ``joins``    — stream-static broadcast joins and the q40 dual-
                 watermark stream-stream interval join.
"""
