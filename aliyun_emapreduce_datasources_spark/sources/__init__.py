"""Connector-semantics emulation (SURVEY.md §2.1) against local
substitutes:

- ``kv``        — KV/wide-row table with JSON catalog schema and a
                  Spark-Filter-tree compiler mirroring TableStore's
                  pushdown semantics (S1-S4).
- ``cdc``       — CDC record model (__ots_record_type__ / per-column
                  op types), ots_col_parser, and merge-apply of
                  PUT/UPDATE/DELETE change streams (S6, S27, U1).
- ``queries``   — oracle-checked catalog entries for the above.

The exactly-once sink patterns (S8/S23/S25) live in streaming/sinks.
"""
