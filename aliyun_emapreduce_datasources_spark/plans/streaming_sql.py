"""Streaming-SQL dialect front-end (SURVEY.md §3.1, §7.5).

The reference corpus is executed as SQL scripts against a closed-source
EMR Spark build with extended ANTLR rules (emr-baseline-testing/
README.md "Extended Streaming SQL"; bin/run-query.sh). Statement shapes
it supports, and what this front-end does with them on public Spark:

  SET k=v                                  -> spark.conf.set(k, v)
  CREATE TABLE n USING <fmt> OPTIONS(...)  -> register a StreamTable /
                                              batch table in the session
                                              catalog (S31)
  CREATE TABLE n AS SELECT ... / INSERT INTO n SELECT ...
                                           -> rewrite the SELECT, run it,
                                              hand it to the sink table
  SELECT ... GROUP BY TUMBLING(c, interval d)
                                           -> window(c, 'd')
  SELECT ... GROUP BY HOPPING(c, interval d, interval s)
                                           -> window(c, 'd', 's')
  SELECT ... GROUP BY SESSION(c, interval g)
                                           -> session_window(c, 'g')
                                              (extension beyond the
                                              corpus dialect)
  WHERE delay(c) < 'd'                     -> withWatermark(c, 'd') on
                                              the source stream, predicate
                                              dropped from the WHERE

The rewrite is string/AST-level (regex over the statement text), NOT a
Catalyst rule — exactly the "thin SQL front-end" called for in
SURVEY.md §3.1. The rewritten text is standard Spark SQL executed with
``spark.sql`` against temp views, so Catalyst still does all planning.
"""

from __future__ import annotations

import os
import re
import tempfile
from dataclasses import dataclass, field

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "rewrite_streaming_sql",
    "split_statements",
    "StreamingSqlSession",
    "MicroBatchRecomputeQuery",
]

_TUMBLING = re.compile(r"TUMBLING\s*\(\s*([A-Za-z_][\w.]*)\s*,\s*interval\s+([^)]+?)\s*\)", re.IGNORECASE)
_HOPPING = re.compile(
    r"HOPPING\s*\(\s*([A-Za-z_][\w.]*)\s*,\s*interval\s+([^,)]+?)\s*,\s*interval\s+([^)]+?)\s*\)",
    re.IGNORECASE,
)
_SESSION = re.compile(
    r"SESSION\s*\(\s*([A-Za-z_][\w.]*)\s*,\s*interval\s+([^)]+?)\s*\)", re.IGNORECASE
)
# delay(col) < 'interval' — a watermark declaration, not a row predicate
_DELAY = re.compile(r"delay\s*\(\s*([A-Za-z_][\w.]*)\s*\)\s*<\s*'([^']+)'", re.IGNORECASE)
_SET = re.compile(r"^\s*SET\s+([\w.]+)\s*=\s*(.+?)\s*$", re.IGNORECASE | re.DOTALL)
_CREATE_USING = re.compile(
    # the column-list group tolerates ONE level of nested parens so
    # parameterized types — decimal(7,2), the corpus money type —
    # don't truncate the match and drop the statement to plain SQL
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s*"
    r"(\((?:[^()]|\([^()]*\))*\))?\s*USING\s+(\w+)\s*(?:OPTIONS\s*\((.*)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_INTO = re.compile(r"^\s*INSERT\s+INTO\s+([\w.]+)\s+(SELECT\b.*)$", re.IGNORECASE | re.DOTALL)
_CTAS = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([\w.]+)\s+(?:USING\s+(\w+)\s+(?:OPTIONS\s*\(([^)]*)\)\s*)?)?AS\s+(SELECT\b.*)$",
    re.IGNORECASE | re.DOTALL,
)


def rewrite_streaming_sql(sql: str) -> tuple[str, list[tuple[str, str]]]:
    """Rewrite TUMBLING/HOPPING/delay into standard Spark SQL.

    Returns (rewritten_sql, watermarks) where watermarks is a list of
    (column, delay_interval) declarations stripped from the text.
    """
    watermarks: list[tuple[str, str]] = []

    def _delay_sub(m: re.Match) -> str:
        watermarks.append((m.group(1), m.group(2)))
        return "TRUE"

    out = _DELAY.sub(_delay_sub, sql)
    out = _HOPPING.sub(lambda m: f"window({m.group(1)}, '{m.group(2).strip()}', '{m.group(3).strip()}')", out)
    out = _TUMBLING.sub(lambda m: f"window({m.group(1)}, '{m.group(2).strip()}')", out)
    out = _SESSION.sub(lambda m: f"session_window({m.group(1)}, '{m.group(2).strip()}')", out)
    return out, watermarks


def broker_configured(options: dict[str, str]) -> bool:
    """True when the DDL carries a REAL broker URL — present and not an
    unexpanded deploy-script placeholder (`${BOOTSTRAP_SERVERS}`), which
    is what the reference scripts contain before envsubst."""
    url = options.get("kafka.bootstrap.servers", "")
    return bool(url) and not url.startswith("${")


def kafka_source_config(options: dict[str, str]) -> dict[str, str]:
    """Corpus `USING kafka` DDL options → genuine
    ``readStream.format("kafka")`` options (reference
    tables/kafka_store_sales.sql; README "DDL" section). Only transport
    keys — the registry keys feed :func:`registry_client_config` and
    the Avro value decode, not the Kafka reader."""
    cfg = {
        "kafka.bootstrap.servers": options["kafka.bootstrap.servers"],
        "subscribe": options["subscribe"],
        "startingOffsets": options.get("startingOffsets", "earliest"),
        "failOnDataLoss": options.get("failOnDataLoss", "false"),
    }
    for passthru in ("maxOffsetsPerTrigger", "kafka.security.protocol", "minPartitions"):
        if passthru in options:
            cfg[passthru] = options[passthru]
    return cfg


def kafka_sink_config(options: dict[str, str], default_topic: str) -> dict[str, str]:
    """Sink-table DDL options → ``writeStream.format("kafka")``
    options. The corpus sink tables name their topic via `subscribe`
    (q3.sql:11-21 kafka_temp_table_qN); a missing topic falls back to
    the sink table name."""
    return {
        "kafka.bootstrap.servers": options["kafka.bootstrap.servers"],
        "topic": options.get("topic", options.get("subscribe", default_topic)),
    }


def registry_client_config(options: dict[str, str]) -> dict[str, object]:
    """Registry keys of a `USING kafka` declaration → the schema
    registry client's config (streaming/schema_registry.py): subject
    URL, Avro record name/namespace, and whether the sink should
    auto-register its result schema on first write."""
    return {
        "url": options.get("kafka.schema.registry.url"),
        "record_name": options.get("kafka.schema.record.name"),
        "record_namespace": options.get(
            "kafka.schema.record.namespace", "engine.streams"
        ),
        "auto_register": options.get(
            "kafka.auto.register.schemas", "false"
        ).lower()
        == "true",
    }


def split_statements(script: str) -> list[str]:
    """Split a corpus-style SQL script on semicolons (the scripts never
    embed semicolons in strings; comments start with --)."""
    lines = [ln for ln in script.splitlines() if not ln.strip().startswith("--")]
    return [s.strip() for s in "\n".join(lines).split(";") if s.strip()]


def _parse_options(opts: str | None) -> dict[str, str]:
    if not opts:
        return {}
    out = {}
    # Spark DDL accepts `key='value'`, `key "value"`, `key 'value'`
    # AND bare unquoted values (`maxFilesPerTrigger=1`) — dropping the
    # unquoted form silently loses rate limits and the like
    for m in re.finditer(
        r"['\"]?([\w.]+)['\"]?\s*(?:=\s*|\s+)(?:'([^']*)'|\"([^\"]*)\"|([^\s,'\"()]+))",
        opts,
    ):
        out[m.group(1)] = next(g for g in m.groups()[1:] if g is not None)
    return out


@dataclass
class StreamingSqlSession:
    """Executes corpus-dialect SQL scripts on public PySpark.

    Registered stream tables (CREATE TABLE ... USING stream/json/file)
    become temp views over readStream file sources with any declared
    watermark applied (the registry-backed equivalent of the Kafka
    stream tables, S31); batch tables (USING parquet) become plain temp
    views. INSERT INTO / CTAS run the rewritten SELECT: streaming plans
    start a writeStream into a memory sink named after the target table
    (the local stand-in for the Kafka result topic + registry schema),
    batch plans materialize a temp view.
    """

    spark: SparkSession
    queries: dict[str, object] = field(default_factory=dict)
    sinks: dict[str, dict[str, str]] = field(default_factory=dict)
    stream_tables: list[str] = field(default_factory=list)
    # per-table emitted Kafka/registry configs (S31): populated for
    # every `USING kafka` declaration whether or not a broker is
    # configured, so a deployment can inspect exactly what the session
    # would hand readStream/writeStream.format("kafka")
    kafka_configs: dict[str, dict[str, object]] = field(default_factory=dict)
    # SET statements naming static (non-modifiable) Spark confs — the
    # deploy script's launch-time settings, recorded for inspection
    static_confs: dict[str, str] = field(default_factory=dict)

    def execute_script(self, script: str) -> list[object]:
        return [self.execute(stmt) for stmt in split_statements(script)]

    def execute(self, stmt: str):
        m = _SET.match(stmt)
        if m:
            try:
                self.spark.conf.set(m.group(1), m.group(2).strip())
            except AnalysisException:
                # static / non-modifiable conf (`SET spark.testing=...`,
                # q100.sql:6) — the reference's runner passes these at
                # session launch (bin/run-query.sh spark-sql --conf);
                # mid-session they are recorded, not applied.
                self.static_confs[m.group(1)] = m.group(2).strip()
            return None
        m = _CREATE_USING.match(stmt)
        if m and not re.search(r"\bAS\s+SELECT\b", stmt, re.IGNORECASE):
            return self._create_table(m.group(1), m.group(2), m.group(3).lower(), _parse_options(m.group(4)))
        m = _CTAS.match(stmt)
        if m:
            return self._run_select(m.group(1), m.group(4), _parse_options(m.group(3)))
        m = _INSERT_INTO.match(stmt)
        if m:
            return self._run_select(m.group(1), m.group(2), {})
        # plain SELECT or any standard statement
        sql, watermarks = rewrite_streaming_sql(stmt)
        return self._apply_and_sql(sql, watermarks)

    # -- statement handlers -------------------------------------------

    def _create_table(self, name: str, ddl_cols: str | None, fmt: str, options: dict[str, str]) -> None:
        from pyspark.sql import types as T

        if fmt == "emrkv":
            from aliyun_emapreduce_datasources_spark.sources.pyds import register_all

            register_all(self.spark)
            if "output.mode" in options:
                # sink table backed by the emrkv connector (the corpus'
                # CREATE TABLE ... USING kafka sink-table declaration,
                # q3.sql:11-21, pointed at our own DataSource instead)
                self.sinks[name] = {**options, "format": "emrkv"}
                return None
            # batch source: pushdown-scanned KV relation (S1-S3); the
            # JSON catalog option declares the subset schema, exactly
            # the TableStore "catalog" option shape
            reader = self.spark.read.format("emrkv").option("path", options["path"])
            if "catalog" in options:
                reader = reader.option("catalog", options["catalog"])
            reader.load().createOrReplaceTempView(name)
            return None
        if fmt == "emrlog":
            from aliyun_emapreduce_datasources_spark.sources.pyds import register_all

            register_all(self.spark)
            reader = self.spark.readStream.format("emrlog").option(
                "path", options["path"]
            )
            if ddl_cols:
                reader = reader.option("schema", ddl_cols.strip("() \n"))
            if "maxOffsetsPerTrigger" in options:
                reader = reader.option(
                    "maxOffsetsPerTrigger", options["maxOffsetsPerTrigger"]
                )
            reader.load().createOrReplaceTempView(name)
            # emrlog views are streaming sources too: the recompute
            # fallback resolves referenced streams through this list,
            # and an unregistered stream table would hand it an empty
            # name set (a dead handle-less query)
            if name not in self.stream_tables:
                self.stream_tables.append(name)
            return None
        if fmt == "jdbc2":
            # exactly-once JDBC streaming sink (S23, JdbcSourceProvider
            # "jdbc2"): `USING jdbc2 OPTIONS (url 'jdbc:sqlite:<path>',
            # dbtable '<t>', output.mode ...)`; the INSERT INTO routes
            # through the two-phase batchId commit log.
            self.sinks[name] = {**options, "format": "jdbc2"}
            return None
        if fmt == "kafka":
            # record the genuine transport + registry configs for this
            # declaration — the real-cluster path is these dicts handed
            # to format("kafka") verbatim; the sandbox (no broker, no
            # kafka connector jar) exercises the file fallback below.
            self.kafka_configs[name] = {
                "source": kafka_source_config(options)
                if "subscribe" in options
                else None,
                "sink": kafka_sink_config(options, name)
                if "kafka.bootstrap.servers" in options
                else None,
                "registry": registry_client_config(options),
            }
            if broker_configured(options) and "path" not in options:
                # Dual-role declaration: the corpus' SOURCE tables
                # (tables/kafka_store_sales.sql) and result SINK tables
                # (q3.sql:11-21 kafka_temp_table_qN) share one DDL shape
                # — broker + subscribe + output.mode, no path — so every
                # real-broker declaration is ALSO recorded as an INSERT
                # target; otherwise an INSERT INTO the result table
                # would silently land in a memory sink instead of the
                # declared Kafka topic.
                self.sinks[name] = options
                if "subscribe" in options:
                    # guard mirrors the kafka_configs population above: a
                    # declaration naming its topic only via `topic` has
                    # no consumer config to read with (sink-only shape)
                    from pyspark.sql import functions as F

                    reader = self.spark.readStream.format("kafka")
                    for k, v in kafka_source_config(options).items():
                        reader = reader.option(k, v)
                    raw = reader.load()
                    # wire value decode: JSON cast against the declared
                    # DDL schema (on a cluster with spark-avro, swap for
                    # from_avro(value, registry.latest(record_name)) —
                    # the registry config is in self.kafka_configs)
                    if ddl_cols:
                        schema = T.StructType.fromDDL(ddl_cols.strip("() \n"))
                        df = raw.select(
                            F.from_json(F.col("value").cast("string"), schema).alias("r")
                        ).select("r.*")
                    else:
                        df = raw
                    df.createOrReplaceTempView(name)
                    if name not in self.stream_tables:
                        self.stream_tables.append(name)
                return None
        if "path" not in options:
            # sink-table declaration (the corpus' kafka_temp_table_qN:
            # no source path, carries output.mode etc. — q3.sql:11-21);
            # remember its options for the INSERT INTO that targets it.
            self.sinks[name] = options
            return None
        if fmt in ("stream", "json", "file", "kafka"):
            schema = T.StructType.fromDDL(ddl_cols.strip("() \n")) if ddl_cols else None
            reader = self.spark.readStream
            if schema is not None:
                reader = reader.schema(schema)
            if "maxFilesPerTrigger" in options:
                reader = reader.option("maxFilesPerTrigger", options["maxFilesPerTrigger"])
            df = reader.json(options["path"])
            df.createOrReplaceTempView(name)
            if name not in self.stream_tables:
                self.stream_tables.append(name)
        elif fmt == "parquet":
            self.spark.read.parquet(options["path"]).createOrReplaceTempView(name)
        else:
            raise ValueError(f"unsupported USING {fmt}")
        return None

    def _apply_and_sql(self, sql: str, watermarks: list[tuple[str, str]]) -> DataFrame:
        # watermark declarations bind to the view that owns the column;
        # re-register the view with withWatermark before planning.
        for col, delay in watermarks:
            view = self._find_view_with_column(sql, col)
            if view is not None:
                bare = col.split(".")[-1]
                wdf = self.spark.table(view).withWatermark(bare, delay)
                wdf.createOrReplaceTempView(view)
        return self.spark.sql(sql)

    def _find_view_with_column(self, sql: str, col: str) -> str | None:
        """Resolve `delay(x)` / `delay(alias.x)` to the temp view that
        owns column x (q40 declares watermarks on both join sides via
        alias-qualified columns — q40.sql:41). Tables named after a
        comma in a FROM list (q102.sql:28 `FROM date_dim,
        kafka_store_sales, item`) count too, not just FROM/JOIN heads."""
        refs = re.findall(
            r"(?:FROM|JOIN|,)\s*([A-Za-z_][\w.]*)"
            # the optional alias must never swallow a keyword: a comma-
            # separated SELECT-list tail like `i_item_id FROM t` would
            # otherwise consume the FROM and hide the first real table
            r"(?:\s+(?:AS\s+)?(?!ON\b|WHERE\b|JOIN\b|GROUP\b|ORDER\b|HAVING\b"
            r"|LIMIT\b|UNION\b|FROM\b|SELECT\b|LEFT\b|RIGHT\b|INNER\b|FULL\b"
            r"|CROSS\b|AND\b|OR\b|NOT\b|WHEN\b|THEN\b|ELSE\b|END\b|AS\b|IN\b"
            r"|BETWEEN\b|LIKE\b|IS\b)(\w+))?",
            sql,
            re.IGNORECASE,
        )
        # a comma also separates SELECT-list items and function args,
        # so a SELECT-list fragment like `a, b c` would capture a
        # spurious c→b pair — and last-write-wins could SHADOW a
        # genuine table alias of the same name. Admit a pair into the
        # alias map only when its target is a registered relation:
        # spurious captures point at column names, which aren't.
        def _is_relation(name: str) -> bool:
            try:
                self.spark.table(name)
                return True
            except Exception:
                return False

        alias_map = {a: v for v, a in refs if a and _is_relation(v)}
        if "." in col:
            alias, bare = col.split(".", 1)
            view = alias_map.get(alias, alias)
            try:
                if bare in self.spark.table(view).columns:
                    return view
            except Exception:
                return None
            return None
        for view, _ in refs:
            try:
                if col in self.spark.table(view).columns:
                    return view
            except Exception:
                continue
        return None

    def _run_select(self, target: str, select_sql: str, options: dict[str, str]):
        sql, watermarks = rewrite_streaming_sql(select_sql)
        try:
            df = self._apply_and_sql(sql, watermarks)
        except AnalysisException:
            # a streaming-invalid plan can already fail analysis (e.g.
            # scalar subqueries against a streaming relation); if the
            # statement touches registered stream tables, hand it to the
            # micro-batch recompute path, which plans it as batch SQL.
            if self._referenced_streams(sql):
                return self._start_recompute(target, sql)
            raise
        if df.isStreaming:
            sink = self.sinks.get(target, {})
            mode = options.get("output.mode") or sink.get("output.mode", "complete")
            if sink.get("format") == "emrkv":
                q = (
                    df.writeStream.format("emrkv")
                    .option("path", sink["path"])
                    .option(
                        "checkpointLocation",
                        sink.get(
                            "checkpointLocation",
                            os.path.join(sink["path"], "_ckpt"),
                        ),
                    )
                    .outputMode(mode)
                    .start()
                )
            elif sink.get("format") == "jdbc2":
                import functools

                from aliyun_emapreduce_datasources_spark.streaming.sinks import (
                    ExecutorExactlyOnceSink,
                    SQLiteExactlyOnceSink,
                    sqlite_connection,
                )

                url = sink.get("url", "")
                db_path = url.split("jdbc:sqlite:", 1)[-1] if url else sink["db"]
                if sink.get("writer") == "driver":
                    # single-connection protocol demo (driver collect
                    # per micro-batch) — opt-in only; never the default
                    writer_sink = SQLiteExactlyOnceSink(
                        db_path, sink.get("dbtable", target), df.columns
                    )
                else:
                    # DEFAULT: executor-side data path (foreachPartition,
                    # no driver collect) — the scale variant of S23
                    writer_sink = ExecutorExactlyOnceSink(
                        functools.partial(sqlite_connection, db_path),
                        sink.get("dbtable", target),
                        df.columns,
                    )
                writer = df.writeStream.foreachBatch(writer_sink).outputMode(mode)
                if "checkpointLocation" in sink:
                    writer = writer.option(
                        "checkpointLocation", sink["checkpointLocation"]
                    )
                q = writer.start()
            elif broker_configured(sink):
                # real Kafka result topic (README "DDL": result rows
                # serialized against the registry result schema). The
                # payload here is JSON; on a cluster with spark-avro,
                # swap to_json for to_avro(..., registry schema) — the
                # registry config is in self.kafka_configs[target].
                from pyspark.sql import functions as F

                cfg = kafka_sink_config(sink, target)
                payload = df.select(
                    F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias(
                        "value"
                    )
                )
                writer = payload.writeStream.format("kafka").outputMode(mode)
                for k, v in cfg.items():
                    writer = writer.option(k, v)
                if "checkpointLocation" in sink:
                    writer = writer.option(
                        "checkpointLocation", sink["checkpointLocation"]
                    )
                q = writer.start()
            else:
                try:
                    q = (
                        df.writeStream.format("memory")
                        .queryName(target)
                        .outputMode(mode)
                        .start()
                    )
                except AnalysisException:
                    # Structured Streaming's UnsupportedOperationChecker
                    # rejects the incremental plan (e.g. a join placed
                    # after a streaming aggregation, the q34/q46/q68/q79
                    # derived-table shape). The reference's closed-source
                    # engine ran these complete-mode; the public-Spark
                    # equivalent is micro-batch recompute.
                    return self._start_recompute(target, sql)
            self.queries[target] = q
            return q
        df.createOrReplaceTempView(target)
        return df

    # -- micro-batch recompute fallback -------------------------------

    def _referenced_streams(self, sql: str) -> list[str]:
        return [n for n in self.stream_tables if re.search(rf"\b{n}\b", sql)]

    def _start_recompute(self, target: str, sql: str) -> "MicroBatchRecomputeQuery":
        """Complete-mode execution of a statement Structured Streaming
        cannot incrementalize (SURVEY §2.2: the corpus' agg-then-join
        derived-table statements, q34/q46/q68/q79, and q6's scalar
        subqueries — the closed-source EMR engine ran these natively).

        Public-Spark design: each referenced stream table gets a raw
        pass-through streaming query that (a) appends the micro-batch to
        an accumulator parquet dir and (b) re-plans the FULL statement
        as batch SQL over the accumulated snapshots, re-registering the
        result under the sink-table name — i.e. per-trigger complete
        recomputation, the textbook fallback when a plan falls outside
        the incrementalization whitelist. Results after every trigger
        equal the batch answer over data-so-far, which is exactly
        complete-mode semantics.

        Scale note: recompute cost is O(data-so-far) per trigger, so
        this path is for the corpus' bounded complete-mode result
        tables, not unbounded facts; the incremental path stays the
        default and is used whenever the checker admits the plan.
        """
        names = self._referenced_streams(sql)
        base = tempfile.mkdtemp(prefix=f"recompute-{target}-")
        snapshot_sql = sql
        for name in names:
            accum = os.path.join(base, name)
            schema = self.spark.table(name).schema
            self.spark.createDataFrame([], schema).write.mode("overwrite").parquet(accum)
            self.spark.read.parquet(accum).createOrReplaceTempView(f"{name}__snapshot")
            snapshot_sql = re.sub(rf"\b{name}\b", f"{name}__snapshot", snapshot_sql)
        # target view exists (empty) before the first trigger commits
        self.spark.sql(snapshot_sql).createOrReplaceTempView(target)

        spark = self.spark
        handles = []
        for name in names:
            accum = os.path.join(base, name)

            def on_batch(batch_df, batch_id, _name=name, _accum=accum):
                # idempotent by batchId (S8 contract): each batch lands
                # in its own overwritten subdir, so an at-least-once
                # foreachBatch replay after a crash rewrites the same
                # subdir instead of appending duplicates forever
                batch_df.write.mode("overwrite").parquet(
                    os.path.join(_accum, f"batch_id={batch_id}")
                )
                spark.read.option("recursiveFileLookup", "true").parquet(
                    _accum
                ).createOrReplaceTempView(f"{_name}__snapshot")
                spark.sql(snapshot_sql).createOrReplaceTempView(target)

            handles.append(
                self.spark.table(name)
                .writeStream.foreachBatch(on_batch)
                .outputMode("append")
                .start()
            )
        wrapper = MicroBatchRecomputeQuery(handles)
        self.queries[target] = wrapper
        return wrapper


class MicroBatchRecomputeQuery:
    """Streaming-query-shaped handle over the recompute fallback's
    per-stream accumulator queries."""

    def __init__(self, handles: list):
        self.handles = handles

    def processAllAvailable(self) -> None:
        for q in self.handles:
            q.processAllAvailable()

    def stop(self) -> None:
        for q in self.handles:
            q.stop()

    def awaitTermination(self, timeout: float | None = None) -> None:
        for q in self.handles:
            q.awaitTermination(timeout)

    @property
    def isActive(self) -> bool:
        return any(q.isActive for q in self.handles)
