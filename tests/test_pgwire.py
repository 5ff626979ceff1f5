"""PG-wire frontend tests: a minimal hand-rolled protocol-v3 client doing
startup + simple queries, verifying row description, data rows, errors,
and session survival after an error."""

import socket
import struct

import pytest

from seafowl_spark.engine.pgwire import PgWireServer


class MiniPgClient:
    def __init__(self, port: int):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        body = struct.pack("!I", 196608)  # protocol 3.0
        body += b"user\x00test\x00database\x00default\x00\x00"
        self.sock.sendall(struct.pack("!I", len(body) + 4) + body)
        self._drain_until_ready()

    def _recv_exact(self, n):
        out = b""
        while len(out) < n:
            chunk = self.sock.recv(n - len(out))
            if not chunk:
                raise ConnectionError("closed")
            out += chunk
        return out

    def _read_msg(self):
        tag = self._recv_exact(1)
        (length,) = struct.unpack("!I", self._recv_exact(4))
        return tag, self._recv_exact(length - 4)

    def _drain_until_ready(self):
        msgs = []
        while True:
            tag, payload = self._read_msg()
            msgs.append((tag, payload))
            if tag == b"Z":
                return msgs

    def query(self, sql: str):
        body = sql.encode() + b"\x00"
        self.sock.sendall(b"Q" + struct.pack("!I", len(body) + 4) + body)
        msgs = self._drain_until_ready()
        cols, rows, errors = [], [], []
        for tag, payload in msgs:
            if tag == b"T":
                (n,) = struct.unpack("!H", payload[:2])
                off = 2
                for _ in range(n):
                    end = payload.index(b"\x00", off)
                    cols.append(payload[off:end].decode())
                    off = end + 1 + 18
            elif tag == b"D":
                (n,) = struct.unpack("!H", payload[:2])
                off = 2
                row = []
                for _ in range(n):
                    (ln,) = struct.unpack("!i", payload[off : off + 4])
                    off += 4
                    if ln == -1:
                        row.append(None)
                    else:
                        row.append(payload[off : off + ln].decode())
                        off += ln
                rows.append(tuple(row))
            elif tag == b"E":
                errors.append(payload)
        return cols, rows, errors

    def close(self):
        self.sock.sendall(b"X" + struct.pack("!I", 4))
        self.sock.close()


@pytest.fixture()
def pg(ctx):
    srv = PgWireServer(ctx).start()
    client = MiniPgClient(srv.port)
    yield ctx, client
    client.close()
    srv.stop()


class TestPgWire:
    def test_ddl_then_select(self, pg):
        ctx, client = pg
        _, _, err = client.query("CREATE TABLE pgt (x int, s text)")
        assert not err
        client.query("INSERT INTO pgt VALUES (1, 'a'), (2, NULL)")
        cols, rows, err = client.query("SELECT x, s FROM pgt ORDER BY x")
        assert not err
        assert cols == ["x", "s"]
        assert rows == [("1", "a"), ("2", None)]

    def test_error_keeps_session_alive(self, pg):
        ctx, client = pg
        _, _, err = client.query("SELECT * FROM missing_table")
        assert err
        cols, rows, err2 = client.query("SELECT 1 AS one")
        assert not err2 and rows == [("1",)]

    def test_bool_text_format(self, pg):
        ctx, client = pg
        _, rows, _ = client.query("SELECT true AS t, false AS f")
        assert rows == [("t", "f")]
