"""Pure-Python PostgreSQL wire-protocol (v3) client — the no-jar
fallback for A11's primary target.

The reference's external-database provider speaks the NATIVE postgres
protocol through the rust postgres crate
(lib/src/data_source/database/table_provider.rs:46-170, dtype mapping
dtype_postgres.rs:9-42) — not JDBC. This module is the same idea on the
Python side: when Spark's JDBC path is unavailable (no driver jar on the
classpath), a configured postgres namespace still executes live queries
over a plain TCP socket, implemented from the public protocol docs
(PostgreSQL docs, "Frontend/Backend Protocol"):

- startup: length-prefixed StartupMessage, protocol 3.0, user/database
  parameters;
- auth: AuthenticationOk / CleartextPassword / MD5Password (salted
  double-md5); SCRAM and the rest fail with a clear message naming the
  fix (install the JDBC jar or enable md5);
- simple query flow: Query -> RowDescription / DataRow* /
  CommandComplete / ReadyForQuery, ErrorResponse surfaced with the
  server's message text;
- text-format result decoding by type OID -> Python values that map
  cleanly onto Spark types (int2/4/8, float4/8, numeric->float, bool,
  date, timestamp[tz], bytea hex, text/varchar fallthrough).

Like the sqlite namespace, rows transfer through the driver (the
standard shape for dimension/lookup tables in an operational DB); big
fact tables belong on the jar-backed distributed JDBC path with
partitioned reads — this fallback trades scale for zero dependencies.
"""

from __future__ import annotations

import datetime
import hashlib
import socket
import struct

PROTOCOL_V3 = 196608  # 3 << 16


class PgWireError(RuntimeError):
    pass


# text-format value decoders by type OID (PostgreSQL catalog pg_type)
def _pg_bool(v: str) -> bool:
    return v == "t"


def _pg_bytea(v: str) -> bytes:
    if v.startswith("\\x"):
        return bytes.fromhex(v[2:])
    raise PgWireError("bytea escape format unsupported; SET bytea_output='hex'")


def _pg_date(v: str) -> datetime.date:
    return datetime.date.fromisoformat(v)


def _pg_timestamp(v: str) -> datetime.datetime:
    # '2024-01-02 03:04:05.678901[+00]' — normalize the space separator
    return datetime.datetime.fromisoformat(v.replace(" ", "T"))


_OID_DECODERS = {
    16: _pg_bool,  # bool
    17: _pg_bytea,  # bytea
    20: int,  # int8
    21: int,  # int2
    23: int,  # int4
    26: int,  # oid
    700: float,  # float4
    701: float,  # float8
    1082: _pg_date,  # date
    1114: _pg_timestamp,  # timestamp
    1184: _pg_timestamp,  # timestamptz
    1700: float,  # numeric -> double (final projections avoid DECIMAL)
}

_OID_SPARK_TYPES = {
    16: "boolean",
    17: "binary",
    20: "bigint",
    21: "smallint",
    23: "int",
    26: "bigint",
    700: "float",
    701: "double",
    1082: "date",
    1114: "timestamp",
    1184: "timestamp",
    1700: "double",
}


def spark_type_for_oid(oid: int) -> str:
    return _OID_SPARK_TYPES.get(oid, "string")


class PgConnection:
    def __init__(self, sock: socket.socket):
        self._sock = sock
        self._buf = b""

    # -- framing ----------------------------------------------------------

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgWireError("server closed connection")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_message(self) -> tuple[bytes, bytes]:
        mtype = self._recv_exact(1)
        (length,) = struct.unpack(">I", self._recv_exact(4))
        return mtype, self._recv_exact(length - 4)

    def _send(self, mtype: bytes, payload: bytes) -> None:
        self._sock.sendall(mtype + struct.pack(">I", len(payload) + 4) + payload)

    # -- session ----------------------------------------------------------

    def _authenticate(self, user: str, password: str | None) -> None:
        while True:
            mtype, body = self._read_message()
            if mtype == b"E":
                raise PgWireError(_error_text(body))
            if mtype != b"R":
                continue  # NoticeResponse etc. before auth settles
            (code,) = struct.unpack_from(">I", body, 0)
            if code == 0:  # AuthenticationOk
                return
            if code == 3:  # CleartextPassword
                if password is None:
                    raise PgWireError("server requires a password")
                self._send(b"p", password.encode() + b"\x00")
            elif code == 5:  # MD5Password
                if password is None:
                    raise PgWireError("server requires a password")
                salt = body[4:8]
                inner = hashlib.md5(password.encode() + user.encode()).hexdigest()
                digest = hashlib.md5(inner.encode() + salt).hexdigest()
                self._send(b"p", b"md5" + digest.encode() + b"\x00")
            else:
                raise PgWireError(
                    f"authentication method {code} (e.g. SCRAM) is not "
                    "implemented in the pure-Python client; install the "
                    "postgres JDBC jar or set password_encryption=md5"
                )

    def _drain_until_ready(self) -> None:
        while True:
            mtype, body = self._read_message()
            if mtype == b"Z":  # ReadyForQuery
                return
            if mtype == b"E":
                err = _error_text(body)
                self._drain_until_ready()
                raise PgWireError(err)

    def simple_query(
        self, sql: str
    ) -> tuple[list[tuple[str, int]], list[tuple]]:
        """Run one SQL statement; returns (columns [(name, type_oid)],
        rows of decoded Python values)."""
        self._send(b"Q", sql.encode() + b"\x00")
        columns: list[tuple[str, int]] = []
        rows: list[tuple] = []
        error: str | None = None
        while True:
            mtype, body = self._read_message()
            if mtype == b"T":  # RowDescription
                (nfields,) = struct.unpack_from(">H", body, 0)
                pos = 2
                columns = []
                for _ in range(nfields):
                    end = body.index(b"\x00", pos)
                    name = body[pos:end].decode()
                    pos = end + 1
                    _, _, type_oid, _, _, _ = struct.unpack_from(">IHIhih", body, pos)
                    pos += 18
                    columns.append((name, type_oid))
            elif mtype == b"D":  # DataRow
                (ncols,) = struct.unpack_from(">H", body, 0)
                pos = 2
                row = []
                for i in range(ncols):
                    (ln,) = struct.unpack_from(">i", body, pos)
                    pos += 4
                    if ln == -1:
                        row.append(None)
                        continue
                    raw = body[pos : pos + ln].decode()
                    pos += ln
                    dec = _OID_DECODERS.get(columns[i][1]) if i < len(columns) else None
                    row.append(dec(raw) if dec else raw)
                rows.append(tuple(row))
            elif mtype == b"E":
                error = _error_text(body)
            elif mtype == b"Z":  # ReadyForQuery — statement done
                if error:
                    raise PgWireError(error)
                return columns, rows
            # CommandComplete / NoticeResponse / EmptyQueryResponse: skip

    def close(self) -> None:
        try:
            self._send(b"X", b"")  # Terminate
        except OSError:
            pass
        self._sock.close()


def _error_text(body: bytes) -> str:
    """ErrorResponse fields: (type byte + cstring)* terminated by \\0;
    surface severity + message."""
    fields = {}
    pos = 0
    while pos < len(body) and body[pos] != 0:
        code = chr(body[pos])
        end = body.index(b"\x00", pos + 1)
        fields[code] = body[pos + 1 : end].decode(errors="replace")
        pos = end + 1
    return f"{fields.get('S', 'ERROR')}: {fields.get('M', 'unknown error')}"


def connect(
    host: str,
    port: int,
    user: str,
    database: str,
    password: str | None = None,
    timeout: float = 10.0,
) -> PgConnection:
    sock = socket.create_connection((host, port), timeout=timeout)
    conn = PgConnection(sock)
    try:
        params = f"user\x00{user}\x00database\x00{database}\x00\x00".encode()
        payload = struct.pack(">II", len(params) + 8, PROTOCOL_V3) + params
        sock.sendall(payload)
        conn._authenticate(user, password)
        conn._drain_until_ready()
    except BaseException:
        sock.close()  # no fd leak on auth/startup failure
        raise
    return conn
