"""Arrow Flight server (reference A22: lib/src/server/flight.rs).

Ticket grammar (flight.rs:340-366): ``{session_id}/{table-name or SQL}``
— a bare identifier means ``SELECT * FROM {table}``; anything else is
executed as SQL in that session.

- get_flight_info / get_schema: plan the query, return schema
  (flight.rs:169-212)
- do_get: execute + stream record batches (flight.rs:216-260)
- do_put: register the uploaded stream as a table in the target session
  (flight.rs:264-310)

handshake/list_flights/do_exchange/actions stay unimplemented, matching
the reference (flight.rs:153-167, 312-337).
"""

from __future__ import annotations

import re
import threading

import pyarrow as pa

try:
    import pyarrow.flight as fl
except ImportError:  # pragma: no cover
    fl = None

from datafusion_server_spark.server.api import Engine

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def parse_ticket(ticket: str) -> tuple[str, str]:
    """-> (session_id, sql). Reference flight.rs:340-366."""
    if "/" not in ticket:
        raise ValueError(f"ticket must be 'session/{{table|SQL}}': {ticket!r}")
    session_id, rest = ticket.split("/", 1)
    rest = rest.strip()
    if _IDENT.fullmatch(rest):
        rest = f"SELECT * FROM {rest}"
    return session_id, rest


if fl is not None:

    class FlightServer(fl.FlightServerBase):
        def __init__(self, engine: Engine, location: str = "grpc://127.0.0.1:50051"):
            super().__init__(location)
            self.engine = engine
            self.location = location

        def _plan(self, ticket: str):
            session_id, sql = parse_ticket(ticket)
            sess = self.engine.sessions.get(session_id)
            from datafusion_server_spark.functions.dialect import transpile

            return sess.sql(transpile(sql))

        def get_flight_info(self, context, descriptor):
            if descriptor.descriptor_type == fl.DescriptorType.PATH:
                ticket = "/".join(p.decode() for p in descriptor.path)
            else:
                ticket = descriptor.command.decode()
            df = self._plan(ticket)
            schema = df.limit(0).toArrow().schema
            endpoint = fl.FlightEndpoint(ticket.encode(), [self.location])
            return fl.FlightInfo(schema, descriptor, [endpoint], -1, -1)

        def get_schema(self, context, descriptor):
            info = self.get_flight_info(context, descriptor)
            return fl.SchemaResult(info.schema)

        def do_get(self, context, ticket):
            # stream batches as partitions land — never the full result on
            # the driver (reference flight.rs:96-144 execute_sql_stream ->
            # mpsc(32) -> gRPC)
            import itertools

            from datafusion_server_spark.server import encoders

            df = self._plan(ticket.ticket.decode())
            batches = encoders.arrow_batches_incremental(df)
            first = next(batches, None)
            if first is None:
                return fl.GeneratorStream(encoders.spark_to_arrow_schema(df), iter(()))
            return fl.GeneratorStream(first.schema, itertools.chain([first], batches))

        def do_put(self, context, descriptor, reader, writer):
            path = "/".join(p.decode() for p in descriptor.path)
            if "/" not in path:
                raise ValueError("do_put descriptor must be session/table")
            session_id, table_name = path.split("/", 1)
            sess = self.engine.sessions.get(session_id)
            table = reader.read_all()
            df = sess.spark.createDataFrame(table)
            sess.register(table_name, df, cache=True, info={"format": "flight"})


    def serve(engine: Engine, location: str = "grpc://127.0.0.1:50051") -> "FlightServer":
        server = FlightServer(engine, location)
        thread = threading.Thread(target=server.serve, name="flight-server", daemon=True)
        thread.start()
        return server
