"""Arrow Flight client source (reference A10): ingest a table or SQL
result from a peer server via ``do_get``.

Reference ticket grammar (lib/src/data_source/flight_stream.rs:17-78 and
server/flight.rs:216-260): ``{session_id}/{table-name or SQL}``.
"""

from __future__ import annotations

from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def do_get(spark: SparkSession, location: str, opts) -> DataFrame:
    """``location``: grpc://host:port/{session}/{table-or-SQL}."""
    import pyarrow.flight as fl

    parsed = urlparse(location)
    endpoint = f"grpc://{parsed.netloc}"
    ticket_str = parsed.path.lstrip("/")
    if not ticket_str:
        raise ValueError(f"flight location needs /session/ticket path: {location!r}")
    client = fl.FlightClient(endpoint)
    reader = client.do_get(fl.Ticket(ticket_str.encode()))
    table = reader.read_all()
    return spark.createDataFrame(table)
