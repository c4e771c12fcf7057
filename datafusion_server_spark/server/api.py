"""Query lifecycle (reference §3.1/§3.2): the engine object the REST and
Flight front-ends call into.

``POST /dataframe/query`` path (reference lib/src/response/handler/
dataframe.rs:18-92): parse request -> ephemeral session (keepAlive 60 s)
-> ingest dataSources -> merge processors -> transpile + spark.sql ->
post-processors -> encode -> destroy session.

Session path (handler/session.rs:90-215): same steps against a named,
TTL-kept session.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from datafusion_server_spark.functions.dialect import transpile
from datafusion_server_spark.operators.merge import MergeProcessor, execute_merge
from datafusion_server_spark.operators import postprocess
from datafusion_server_spark.server import encoders
from datafusion_server_spark.session import (
    STATELESS_KEEP_ALIVE_S,
    ServerSession,
    SessionManager,
)
from datafusion_server_spark.sources import registry as source_registry


@dataclass
class Metrics:
    """Minimal name-compatible telemetry (reference metrics.rs:16-160)."""

    http_requests: dict[str, int] = field(default_factory=dict)
    query_seconds: list[float] = field(default_factory=list)
    sessions_created: int = 0
    data_sources_registered: int = 0

    def observe(self, route: str, seconds: float) -> None:
        self.http_requests[route] = self.http_requests.get(route, 0) + 1
        self.query_seconds.append(seconds)

    def prometheus(self) -> str:
        lines = [
            "# TYPE dfss_http_requests_total counter",
        ]
        for route, n in sorted(self.http_requests.items()):
            lines.append(f'dfss_http_requests_total{{route="{route}"}} {n}')
        lines.append("# TYPE dfss_sessions_created_total counter")
        lines.append(f"dfss_sessions_created_total {self.sessions_created}")
        lines.append("# TYPE dfss_data_sources_total counter")
        lines.append(f"dfss_data_sources_total {self.data_sources_registered}")
        if self.query_seconds:
            lines.append("# TYPE dfss_query_seconds summary")
            lines.append(f"dfss_query_seconds_sum {sum(self.query_seconds):.6f}")
            lines.append(f"dfss_query_seconds_count {len(self.query_seconds)}")
        return "\n".join(lines) + "\n"


class Engine:
    def __init__(
        self,
        spark: SparkSession | None = None,
        *,
        start_reaper: bool = True,
        settings=None,
    ):
        from datafusion_server_spark.session import get_spark
        from datafusion_server_spark.settings import Settings

        self.spark = spark or get_spark()
        self.settings: Settings = settings or Settings()
        self.sessions = SessionManager(self.spark, start_reaper=start_reaper)
        self.metrics = Metrics()
        # config sections -> JDBC namespaces, object-store credentials,
        # drop-in plugin manifests (reference init_global_managers,
        # settings.rs:221-247)
        self.settings.apply(self.spark)

    # -- shared steps ------------------------------------------------------

    def _ingest(self, sess: ServerSession, data_sources: list[dict]) -> None:
        for payload in data_sources or []:
            ds = source_registry.DataSource.from_json(payload)
            source_registry.register(sess.spark, ds, session=sess)
            self.metrics.data_sources_registered += 1

    def _merges(self, sess: ServerSession, processor: dict | None) -> None:
        for spec in (processor or {}).get("mergeProcessors", []) or []:
            execute_merge(sess.spark, MergeProcessor.from_json(spec), session=sess)

    _INSERT_RE = re.compile(
        r"\s*INSERT\s+INTO\s+(?P<name>`[^`]+`|\w+)\s+(?P<rest>.+)", re.I | re.S
    )

    def _query(self, sess: ServerSession, sql: str) -> DataFrame:
        from datafusion_server_spark.sources import jdbc

        try:
            jdbc.register_tables_from_sql(sess.spark, sql)
        except ValueError:
            pass  # no namespaces configured; plain query

        m = self._INSERT_RE.fullmatch(sql)
        if m:
            # INSERT INTO a session temp view: Spark refuses DML on views,
            # so re-register the union (SURVEY §2.B DDL/DML shim — the
            # reference supports INSERT into in-memory tables via DataFusion)
            name = m.group("name").strip("`")
            rest = m.group("rest").strip().rstrip(";")
            if rest.upper().startswith("VALUES"):
                rest = f"SELECT * FROM ({rest})"
            incoming = sess.spark.sql(transpile(rest))
            existing = sess.spark.table(name)
            merged = existing.union(incoming.toDF(*existing.columns)).persist()
            merged.createOrReplaceTempView(name)
            # free the PREVIOUS insert's persisted union — without this a
            # long-lived session doing N INSERTs pins N cached plans
            # (merged recomputes through the old plan if ever needed)
            existing.unpersist()
            sess.touch()
            # lazy count: evaluated when the response is encoded — no
            # extra eager job here
            return incoming.selectExpr("CAST(COUNT(*) AS BIGINT) AS inserted_rows")
        return sess.sql(transpile(sql))

    def _respond(
        self, df: DataFrame, response: dict | None, accept: str | None
    ) -> tuple[bytes, str]:
        r = response or {}
        fmt = encoders.negotiate_format(r.get("format"), accept)
        opts = r.get("options") or {}
        return encoders.encode(
            df,
            fmt,
            has_headers=bool(opts.get("hasHeaders", True)),
            delimiter=str(opts.get("delimiter", ",")),
        )

    # -- entry points ------------------------------------------------------

    def dataframe_query(self, payload: dict, accept: str | None = None) -> tuple[bytes, str]:
        """Stateless one-shot (reference dataframe.rs:18-92)."""
        t0 = time.time()
        sess = self.sessions.create(keep_alive_s=STATELESS_KEEP_ALIVE_S)
        self.metrics.sessions_created += 1
        try:
            self._ingest(sess, payload.get("dataSources", []))
            self._merges(sess, payload.get("processor"))
            df = self._query(sess, payload["query"])
            post = payload.get("postProcessors") or []
            if post:
                df = postprocess.apply_local(sess.spark, df, post)
            out = self._respond(df, payload.get("response"), accept)
            return out
        finally:
            try:
                self.sessions.delete(sess.session_id)
            except KeyError:
                pass
            self.metrics.observe("/dataframe/query", time.time() - t0)

    def dataframe_query_stream(self, payload: dict):
        """Incremental variant of the stateless path (reference A21:
        record_batch_stream.rs): yields Arrow IPC frames per batch. The
        session is destroyed after the generator is drained — matching the
        reference's leave-to-reaper semantics for streamed responses."""
        sess = self.sessions.create(keep_alive_s=STATELESS_KEEP_ALIVE_S)
        self.metrics.sessions_created += 1

        def gen():
            try:
                self._ingest(sess, payload.get("dataSources", []))
                self._merges(sess, payload.get("processor"))
                df = self._query(sess, payload["query"])
                yield from encoders.arrow_ipc_chunks(df)
            finally:
                try:
                    self.sessions.delete(sess.session_id)
                except KeyError:
                    pass

        return gen()

    def session_create(self, session_id: str | None, keep_alive_s: int | None) -> dict:
        sess = self.sessions.create(
            session_id, keep_alive_s or self.settings.session.default_keep_alive
        )
        self.metrics.sessions_created += 1
        return {"id": sess.session_id, "keepAlive": sess.keep_alive_s}

    def session_add_datasource(self, session_id: str, payload: Any) -> list[str]:
        sess = self.sessions.get(session_id)
        sources = payload if isinstance(payload, list) else [payload]
        self._ingest(sess, sources)
        return sorted(sess.data_sources)

    def session_merge(self, session_id: str, payload: dict) -> None:
        sess = self.sessions.get(session_id)
        self._merges(sess, payload)

    def session_query(
        self, session_id: str, payload: dict | str, accept: str | None = None
    ) -> tuple[bytes, str]:
        """JSON body {sql, postProcessors?, response?} or raw SQL string
        (reference session.rs:90-215)."""
        t0 = time.time()
        sess = self.sessions.get(session_id)
        try:
            if isinstance(payload, str):
                sql, post, response = payload, [], None
            else:
                sql = payload.get("sql") or payload.get("query")
                post = payload.get("postProcessors") or []
                response = payload.get("response")
            df = self._query(sess, sql)
            if post:
                df = postprocess.apply_local(sess.spark, df, post)
            return self._respond(df, response, accept)
        finally:
            self.metrics.observe("/session/query", time.time() - t0)

    def session_upload(self, session_id: str, name: str, fmt: str, data: bytes) -> None:
        """Multipart upload ingest (reference A23): format sniff by
        extension/content happens in the HTTP layer; here data is staged
        and registered."""
        sess = self.sessions.get(session_id)
        payload = {"format": fmt, "name": name, "location": ""}
        from datafusion_server_spark.sources import readers

        suffix = {"csv": ".csv", "json": ".json", "ndjson": ".ndjson",
                  "parquet": ".parquet", "avro": ".avro"}[fmt]
        path = readers.stage_bytes(data, suffix)
        payload["location"] = f"file://{path}" if not path.startswith("/") else path
        ds = source_registry.DataSource.from_json(payload)
        ds.options.infer_schema_rows = readers.UPLOAD_INFER_ROWS
        source_registry.register(sess.spark, ds, session=sess)

    def session_save(self, session_id: str, payload: dict) -> None:
        """Save table(s) to a sink (reference A18/A19).

        Accepts the reference's request shape — ``{"dataSources": [{format,
        name, location, options}]}`` (handler/data_source.rs:136-150, where
        ``name`` is the registered table and ``location`` the destination) —
        as well as the single-table ``{table, location, format, options}``
        form.
        """
        from datafusion_server_spark.sources import writers

        sess = self.sessions.get(session_id)
        entries = payload.get("dataSources") or [
            {
                "name": payload["table"],
                "location": payload["location"],
                "format": payload.get("format", "parquet"),
                "options": payload.get("options"),
            }
        ]
        for entry in entries:
            table = entry["name"]
            location = entry["location"]
            fmt = str(entry.get("format", "parquet")).lower()
            df = sess.spark.table(table)
            opts = entry.get("options") or {}
            if location.endswith(".json") and fmt == "json":
                writers.save_json_array_file(df, location, overwrite=bool(opts.get("overwrite")))
            else:
                writers.write_object_store(
                    df,
                    location,
                    fmt,
                    has_headers=bool(opts.get("hasHeaders", True)),
                    delimiter=str(opts.get("delimiter", ",")),
                )

    def session_detail(self, session_id: str) -> dict:
        sess = self.sessions.get(session_id)
        from datafusion_server_spark.schema import struct_to_schema_json

        return {
            "id": sess.session_id,
            "created": sess.created_at,
            "dataSources": {
                name: dict(
                    info,
                    schema=struct_to_schema_json(sess.spark.table(name).schema),
                )
                for name, info in sess.data_sources.items()
            },
        }

    def remove_data_source(self, session_id: str, name: str) -> bool:
        return self.sessions.get(session_id).remove(name)

    def refresh_data_source(self, session_id: str, name: str) -> None:
        """Re-read the source (reference session_manager.rs:474-488)."""
        sess = self.sessions.get(session_id)
        info = sess.data_sources.get(name)
        if not info:
            raise KeyError(name)
        payload = {"format": info["format"], "name": name, "location": info["location"]}
        ds = source_registry.DataSource.from_json(payload)
        source_registry.register(sess.spark, ds, session=sess)
