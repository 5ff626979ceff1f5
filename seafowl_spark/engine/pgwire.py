"""PostgreSQL wire-protocol frontend (SURVEY.md §3.3; reference
src/frontend/postgres.rs via the convergence Engine).

Minimal but real protocol v3 implementation on stdlib sockets:

* startup: accepts the StartupMessage, answers AuthenticationOk +
  ParameterStatus + ReadyForQuery (no auth/TLS — same as the reference,
  main.rs:198-200; SSLRequest is answered 'N'),
* simple query protocol ('Q'): executes via SeafowlContext, returns
  RowDescription + DataRows (text format) + CommandComplete + ReadyForQuery;
  errors become ErrorResponse and keep the session alive,
* Terminate ('X') closes cleanly.

Like the reference, results are fully planned before the row description is
sent (two-phase schema-then-rows shape). Extended protocol (parse/bind) is
not implemented — psql's simple queries and most drivers' text mode work.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading

from pyspark.sql import types as T

from . import parser
from .context import SeafowlContext
from .server import AccessPolicy

# PostgreSQL type OIDs for the text-format row description
_OID = {
    "boolean": 16,
    "bigint": 20,
    "smallint": 21,
    "int": 23,
    "integer": 23,
    "double": 701,
    "float": 700,
    "string": 25,
    "date": 1082,
    "timestamp": 1114,
    "binary": 17,
}


def _oid_for(dt: T.DataType) -> int:
    s = dt.simpleString()
    if s.startswith("decimal"):
        return 1700
    return _OID.get(s, 25)  # default: text


def _msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack("!I", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class _Handler(socketserver.BaseRequestHandler):
    ctx: SeafowlContext
    policy: AccessPolicy
    _token: str | None = None

    def handle(self):
        sock: socket.socket = self.request
        if not self._startup(sock):
            return
        self._send_ready(sock)
        buf = b""
        while True:
            data = sock.recv(65536)
            if not data:
                return
            buf += data
            while len(buf) >= 5:
                tag = buf[0:1]
                (length,) = struct.unpack("!I", buf[1:5])
                if len(buf) < 1 + length:
                    break
                payload = buf[5 : 1 + length]
                buf = buf[1 + length :]
                if tag == b"X":
                    return
                if tag == b"Q":
                    self._simple_query(sock, payload.rstrip(b"\x00").decode())
                    self._send_ready(sock)
                # ignore everything else (Sync/Flush/etc.)

    # ------------------------------------------------------------ protocol

    def _startup(self, sock: socket.socket) -> bool:
        raw = self._recv_exact(sock, 4)
        if raw is None:
            return False
        (length,) = struct.unpack("!I", raw)
        body = self._recv_exact(sock, length - 4)
        if body is None:
            return False
        (code,) = struct.unpack("!I", body[:4])
        if code == 80877103:  # SSLRequest -> refuse, expect plain startup
            sock.sendall(b"N")
            return self._startup(sock)
        if code == 80877102:  # CancelRequest: nothing to cancel
            return False
        # StartupMessage; if any policy needs a credential, run cleartext
        # password auth (reference checks AccessPolicy sha256 the same way)
        if self.policy.read != "any" or self.policy.write != "any":
            sock.sendall(_msg(b"R", struct.pack("!I", 3)))  # CleartextPassword
            hdr = self._recv_exact(sock, 5)
            if hdr is None or hdr[0:1] != b"p":
                return False
            (plen,) = struct.unpack("!I", hdr[1:5])
            pw = self._recv_exact(sock, plen - 4)
            if pw is None:
                return False
            self._token = pw.rstrip(b"\x00").decode()
            if not self.policy.can_read(self._token) and not self.policy.can_write(
                self._token
            ):
                self._send_error(sock, "password authentication failed")
                return False
        sock.sendall(_msg(b"R", struct.pack("!I", 0)))  # AuthenticationOk
        for k, v in (
            ("server_version", "15.0 (seafowl_spark)"),
            ("client_encoding", "UTF8"),
            ("DateStyle", "ISO"),
        ):
            sock.sendall(_msg(b"S", _cstr(k) + _cstr(v)))
        return True

    @staticmethod
    def _recv_exact(sock: socket.socket, n: int) -> bytes | None:
        out = b""
        while len(out) < n:
            chunk = sock.recv(n - len(out))
            if not chunk:
                return None
            out += chunk
        return out

    def _send_ready(self, sock: socket.socket):
        sock.sendall(_msg(b"Z", b"I"))

    def _send_error(self, sock: socket.socket, message: str):
        payload = b"SERROR\x00" + b"C42000\x00" + b"M" + _cstr(message[:900]) + b"\x00"
        sock.sendall(_msg(b"E", payload))

    def _simple_query(self, sock: socket.socket, sql: str):
        try:
            if not sql.strip():
                sock.sendall(_msg(b"I", b""))  # EmptyQueryResponse
                return
            writes = any(not parser.is_read_only(s) for s in parser.split_statements(sql))
            if writes and not self.policy.can_write(self._token):
                self._send_error(sock, "write access denied")
                return
            if not writes and not self.policy.can_read(self._token):
                self._send_error(sock, "read access denied")
                return
            df = self.ctx.execute(sql)
            if df is None or not parser.is_read_only(parser.split_statements(sql)[-1]):
                sock.sendall(_msg(b"C", _cstr("OK")))
                return
            fields = df.schema.fields
            desc = struct.pack("!H", len(fields))
            for f in fields:
                desc += (
                    _cstr(f.name)
                    + struct.pack("!IhIhih", 0, 0, _oid_for(f.dataType), -1, -1, 0)
                )
            sock.sendall(_msg(b"T", desc))
            n = 0
            for row in df.toLocalIterator(prefetchPartitions=True):
                n += 1
                body = struct.pack("!H", len(fields))
                for v in row:
                    if v is None:
                        body += struct.pack("!i", -1)
                    else:
                        if isinstance(v, bool):
                            text = "t" if v else "f"
                        else:
                            text = str(v)
                        b = text.encode()
                        body += struct.pack("!i", len(b)) + b
                sock.sendall(_msg(b"D", body))
            sock.sendall(_msg(b"C", _cstr(f"SELECT {n}")))
        except Exception as exc:  # noqa: BLE001
            self._send_error(sock, str(exc))


class PgWireServer:
    """Threaded PG-wire server bound to one SeafowlContext."""

    def __init__(
        self,
        ctx: SeafowlContext,
        host: str = "127.0.0.1",
        port: int = 0,
        policy: AccessPolicy | None = None,
    ):
        handler = type(
            "BoundPgHandler", (_Handler,), {"ctx": ctx, "policy": policy or AccessPolicy()}
        )

        class _Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = _Server((host, port), handler)
        self.port = self.server.server_address[1]
        self._thread: threading.Thread | None = None

    def start(self) -> "PgWireServer":
        self._thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self):
        self.server.shutdown()
        self.server.server_close()
