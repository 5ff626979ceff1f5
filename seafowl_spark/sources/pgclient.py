"""Minimal pure-Python PostgreSQL wire-protocol client (DB-API subset).

The remote-tables source (sources/remote.py — reference
datafusion_remote_tables/src/provider.rs:121-171, which federates via
connector-x) prefers psycopg2, but this environment ships no PostgreSQL
Python driver. The v3 frontend/backend protocol is small and public
(PostgreSQL docs, "Frontend/Backend Protocol"): startup + simple-query
is all a read-only federation scan needs, so this module implements
exactly that — the same protocol surface our OWN pg wire server
(engine/pgwire.py) speaks from the other side.

Scope (deliberately minimal):
* auth: trust, cleartext password, MD5, and SCRAM-SHA-256 (RFC 5802/
  7677 client-side over PostgreSQL's SASL messages — the DEFAULT
  password_encryption since PostgreSQL 14, so real-world federation
  targets work, not just trust-auth test servers; passwords are
  SASLprep'd with pg_saslprep's fall-back-to-raw-on-prohibited
  behavior so non-ASCII passwords derive the server's verifier);
  channel binding
  (SCRAM-SHA-256-PLUS) is not offered — the gs2 header stays 'n,,'
  even over TLS (binding needs the server cert's signature fed into
  the SCRAM exchange, which plain SCRAM-SHA-256 servers don't expect);
* simple query ('Q') with text-format results; RowDescription typed by
  OID into Python values (int/float/Decimal/bool/str/bytes/date/
  datetime) so remote.py's `_cell` coercions see the same shapes the
  real drivers produce;
* DB-API-ish: connect().cursor().execute(sql); cursor.description,
  fetchone/fetchall/iteration; connection.close().

NOT a general driver: no extended protocol, no COPY, no transactions
beyond what a single autocommit query does. TLS (r13): the SSLRequest
negotiation + an ssl-wrapped socket behind ``sslmode`` with libpq's
five levels — ``disable`` / ``prefer`` (default, falls back to
plaintext when the server declines TLS — and, like libpq, when the
server accepts but the handshake then fails) / ``require`` (TLS, certificate
NOT verified — like libpq it defends against passive snooping, not
active MITM) / ``verify-ca`` (chain verified against ``sslrootcert``)
/ ``verify-full`` (chain + hostname).
"""

from __future__ import annotations

import base64
import datetime as _dt
import hashlib
import hmac
import re as _re
import secrets
import socket
import struct
from decimal import Decimal
from typing import Any


class PgClientError(Exception):
    """Connection/protocol/server error, message carried verbatim."""


def _saslprep(pw: str) -> str:
    """RFC 4013 SASLprep, applied the way PostgreSQL's pg_saslprep
    does: map non-ASCII spaces to space, drop the commonly-mapped-to-
    nothing characters, NFKC-normalize — and on any PROHIBITED output
    (controls, surrogates, bidi violations, unassigned code points)
    fall back to the RAW password, exactly as the server did when it
    stored the verifier, so both sides always derive the same salted
    key. Printable ASCII is a fixed point; ASCII with control chars is
    prohibited, which on both sides means fallback-to-raw."""
    if pw.isascii():
        return pw
    import stringprep
    import unicodedata

    mapped = []
    for ch in pw:
        if stringprep.in_table_c12(ch):
            mapped.append(" ")
        elif not stringprep.in_table_b1(ch):
            mapped.append(ch)
    s = unicodedata.normalize("NFKC", "".join(mapped))
    if not s:
        return pw
    for ch in s:
        if (
            stringprep.in_table_c12(ch)
            or stringprep.in_table_c21_c22(ch)
            or stringprep.in_table_c3(ch)
            or stringprep.in_table_c4(ch)
            or stringprep.in_table_c5(ch)
            or stringprep.in_table_c6(ch)
            or stringprep.in_table_c7(ch)
            or stringprep.in_table_c8(ch)
            or stringprep.in_table_c9(ch)
            or stringprep.in_table_a1(ch)
        ):
            return pw
    # bidi (RFC 3454 §6): RandALCat must not mix with LCat, and a
    # RandALCat string must both start and end with RandALCat
    randal = [stringprep.in_table_d1(ch) for ch in s]
    if any(randal):
        if any(stringprep.in_table_d2(ch) for ch in s) or not (
            randal[0] and randal[-1]
        ):
            return pw
    return s


# text-format decoders by pg_type OID (public catalog numbers)
def _bool(v: str) -> bool:
    return v == "t"


def _bytea(v: str) -> bytes:
    if v.startswith("\\x"):
        return bytes.fromhex(v[2:])
    # legacy escape format (bytea_output = 'escape'): \\ is a literal
    # backslash, \ooo is an octal byte, everything else is itself
    out = bytearray()
    i, n = 0, len(v)
    while i < n:
        ch = v[i]
        if ch != "\\":
            out.append(ord(ch))
            i += 1
        elif v.startswith("\\\\", i):
            out.append(0x5C)
            i += 2
        elif _re.match(r"\\[0-3][0-7][0-7]", v[i:i + 4]):
            out.append(int(v[i + 1:i + 4], 8))
            i += 4
        else:
            raise PgClientError(f"malformed bytea escape at offset {i}")
    return bytes(out)


def _ts(v: str) -> _dt.datetime:
    # '2024-01-02 03:04:05.123456' (+ optional tz offset for timestamptz)
    return _dt.datetime.fromisoformat(v)


_DECODERS = {
    16: _bool,
    20: int, 21: int, 23: int, 26: int,
    700: float, 701: float,
    1700: Decimal,
    17: _bytea,
    1082: _dt.date.fromisoformat,
    1114: _ts, 1184: _ts,
}


class _Cursor:
    def __init__(self, conn: "PgWireConnection"):
        self._conn = conn
        self.description: list[tuple] | None = None
        self._rows: list[tuple] = []
        self._pos = 0
        self.rowcount = -1

    def execute(self, sql: str) -> "_Cursor":
        self.description, self._rows = self._conn._simple_query(sql)
        self._pos = 0
        self.rowcount = len(self._rows)
        return self

    def fetchone(self):
        if self._pos >= len(self._rows):
            return None
        row = self._rows[self._pos]
        self._pos += 1
        return row

    def fetchall(self):
        rows = self._rows[self._pos:]
        self._pos = len(self._rows)
        return rows

    def fetchmany(self, size: int = 1):
        rows = self._rows[self._pos:self._pos + size]
        self._pos += len(rows)
        return rows

    def __iter__(self):
        while True:
            r = self.fetchone()
            if r is None:
                return
            yield r

    def close(self) -> None:
        self._rows = []


class PgWireConnection:
    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 5432,
        user: str = "postgres",
        dbname: str = "postgres",
        password: str | None = None,
        timeout: float = 30.0,
        sslmode: str = "prefer",
        sslrootcert: str | None = None,
    ):
        if sslmode not in (
            "disable", "prefer", "require", "verify-ca", "verify-full"
        ):
            raise PgClientError(
                f"unsupported sslmode {sslmode!r} (this client speaks "
                "disable/prefer/require/verify-ca/verify-full)"
            )
        if sslmode.startswith("verify") and not sslrootcert:
            raise PgClientError(
                f"sslmode={sslmode} needs sslrootcert (the CA bundle "
                "to verify the server certificate against)"
            )
        self._addr, self._timeout = (host, port), timeout
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._buf = b""
        self._user, self._password = user, password
        if sslmode != "disable":
            self._negotiate_tls(
                host,
                required=sslmode != "prefer",
                verify=sslmode.startswith("verify"),
                verify_hostname=sslmode == "verify-full",
                rootcert=sslrootcert,
            )
        params = f"user\0{user}\0database\0{dbname}\0\0".encode()
        payload = struct.pack("!ii", 8 + len(params), 196608) + params
        self._sock.sendall(payload)
        self._auth_loop()

    def _negotiate_tls(
        self,
        host: str,
        required: bool,
        verify: bool = False,
        verify_hostname: bool = False,
        rootcert: str | None = None,
    ) -> None:
        """SSLRequest (the 80877103 magic) then, on 'S', wrap the socket.
        'N' means the server declines TLS: error when TLS is required,
        continue in the clear under prefer (libpq's fallback). The
        verify levels match libpq: verify-ca checks the chain against
        ``rootcert``, verify-full additionally matches the hostname."""
        import ssl

        self._sock.sendall(struct.pack("!ii", 8, 80877103))
        resp = self._sock.recv(1)
        if resp == b"S":
            if verify:
                try:
                    ctx = ssl.create_default_context(cafile=rootcert)
                except (OSError, ssl.SSLError) as exc:
                    raise PgClientError(
                        f"cannot load sslrootcert {rootcert!r}: {exc}"
                    ) from exc
                ctx.check_hostname = verify_hostname
                ctx.verify_mode = ssl.CERT_REQUIRED
            else:
                # libpq sslmode=require semantics: encrypt, don't verify
                ctx = ssl.create_default_context()
                ctx.check_hostname = False
                ctx.verify_mode = ssl.CERT_NONE
            try:
                self._sock = ctx.wrap_socket(
                    self._sock, server_hostname=host
                )
            except ssl.SSLError as exc:
                if not required:
                    # libpq sslmode=prefer: a server that ACCEPTS the
                    # SSLRequest but fails the handshake (protocol
                    # version mismatch, broken cert chain) falls back
                    # to a fresh plaintext connection rather than
                    # failing a DSN that worked before TLS support
                    try:
                        self._sock.close()
                    except OSError:
                        pass
                    self._sock = socket.create_connection(
                        self._addr, timeout=self._timeout
                    )
                    self._buf = b""
                    return
                raise PgClientError(
                    f"TLS handshake failed ({exc.__class__.__name__}): "
                    f"{exc}"
                ) from exc
        elif resp == b"N":
            if required:
                raise PgClientError(
                    "server declined TLS but sslmode requires it"
                )
        else:
            raise PgClientError(
                f"unexpected SSLRequest response {resp!r}"
            )

    # ---------------------------------------------------------- plumbing

    def _recv_msg(self) -> tuple[bytes, bytes]:
        while len(self._buf) < 5:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgClientError("server closed the connection")
            self._buf += chunk
        mtype = self._buf[0:1]
        (mlen,) = struct.unpack("!i", self._buf[1:5])
        need = 1 + mlen
        while len(self._buf) < need:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise PgClientError("server closed mid-message")
            self._buf += chunk
        body = self._buf[5:need]
        self._buf = self._buf[need:]
        return mtype, body

    def _send(self, mtype: bytes, body: bytes) -> None:
        self._sock.sendall(mtype + struct.pack("!i", 4 + len(body)) + body)

    @staticmethod
    def _error_text(body: bytes) -> str:
        parts = {}
        for field in body.split(b"\0"):
            if field:
                parts[chr(field[0])] = field[1:].decode("utf-8", "replace")
        return parts.get("M", "unknown server error")

    def _auth_loop(self) -> None:
        scram: dict[str, Any] = {}
        while True:
            mtype, body = self._recv_msg()
            if mtype == b"R":
                (code,) = struct.unpack("!i", body[:4])
                if code == 0:
                    continue  # AuthenticationOk
                if code == 3:  # cleartext password
                    if self._password is None:
                        raise PgClientError("server wants a password")
                    self._send(b"p", self._password.encode() + b"\0")
                elif code == 5:  # md5(md5(password + user) + salt)
                    if self._password is None:
                        raise PgClientError("server wants a password")
                    salt = body[4:8]
                    inner = hashlib.md5(
                        (self._password + self._user).encode()
                    ).hexdigest()
                    outer = hashlib.md5(
                        inner.encode() + salt
                    ).hexdigest()
                    self._send(b"p", b"md5" + outer.encode() + b"\0")
                elif code == 10:  # AuthenticationSASL: mechanism list
                    if self._password is None:
                        raise PgClientError("server wants a password")
                    mechs = [
                        m.decode()
                        for m in body[4:].split(b"\0")
                        if m
                    ]
                    if "SCRAM-SHA-256" not in mechs:
                        raise PgClientError(
                            "server offers no mutually supported SASL "
                            f"mechanism (offered {mechs}; this client "
                            "speaks SCRAM-SHA-256 — the -PLUS variant "
                            "needs TLS channel binding)"
                        )
                    # RFC 5802: gs2 header 'n,,' = no channel binding;
                    # the username comes from the startup packet so the
                    # n= attribute stays empty (PostgreSQL convention)
                    nonce = base64.b64encode(secrets.token_bytes(18))
                    scram["client_first_bare"] = b"n=,r=" + nonce
                    scram["nonce"] = nonce
                    first = b"n,," + scram["client_first_bare"]
                    self._send(
                        b"p",
                        b"SCRAM-SHA-256\0"
                        + struct.pack("!i", len(first))
                        + first,
                    )
                elif code == 11:  # AuthenticationSASLContinue
                    if "nonce" not in scram:
                        raise PgClientError(
                            "SASLContinue before AuthenticationSASL — "
                            "out-of-order SCRAM exchange; aborting"
                        )
                    self._send(b"p", self._scram_final(scram, body[4:]))
                elif code == 12:  # AuthenticationSASLFinal: verify v=
                    if "server_sig" not in scram:
                        raise PgClientError(
                            "SASLFinal before the client proof was sent "
                            "— out-of-order SCRAM exchange; aborting"
                        )
                    attrs = dict(
                        kv.split(b"=", 1)
                        for kv in body[4:].split(b",")
                        if b"=" in kv
                    )
                    if attrs.get(b"v") != base64.b64encode(
                        scram["server_sig"]
                    ):
                        raise PgClientError(
                            "SCRAM server signature mismatch — the "
                            "server does not know the password it "
                            "verified (possible MITM); aborting"
                        )
                else:
                    raise PgClientError(
                        f"unsupported auth method {code} (this minimal "
                        "client speaks trust/cleartext/md5/"
                        "SCRAM-SHA-256 only)"
                    )
            elif mtype in (b"S", b"K", b"N"):
                continue  # ParameterStatus / BackendKeyData / Notice
            elif mtype == b"Z":
                return  # ReadyForQuery
            elif mtype == b"E":
                raise PgClientError(self._error_text(body))
            else:
                raise PgClientError(
                    f"unexpected message {mtype!r} during startup"
                )

    def _scram_final(self, scram: dict, server_first: bytes) -> bytes:
        """RFC 5802 client-final-message for the SCRAM-SHA-256 exchange
        (RFC 7677 parameters). Pure hashlib/hmac — PBKDF2 for the salted
        password, two HMAC chains for proof and server signature."""
        attrs = dict(
            kv.split(b"=", 1)
            for kv in server_first.split(b",")
            if b"=" in kv
        )
        try:
            srv_nonce = attrs[b"r"]
            salt = base64.b64decode(attrs[b"s"])
            iterations = int(attrs[b"i"])
        except (KeyError, ValueError) as exc:
            raise PgClientError(
                f"malformed SCRAM server-first message: {server_first!r}"
            ) from exc
        if not srv_nonce.startswith(scram["nonce"]):
            raise PgClientError(
                "SCRAM server nonce does not extend the client nonce "
                "(possible replay); aborting"
            )
        salted = hashlib.pbkdf2_hmac(
            "sha256", _saslprep(self._password).encode(), salt, iterations
        )
        client_key = hmac.digest(salted, b"Client Key", "sha256")
        stored_key = hashlib.sha256(client_key).digest()
        # c=biws is base64('n,,') — the gs2 header echoed per the RFC
        final_bare = b"c=biws,r=" + srv_nonce
        auth_message = (
            scram["client_first_bare"] + b"," + server_first + b","
            + final_bare
        )
        client_sig = hmac.digest(stored_key, auth_message, "sha256")
        proof = bytes(a ^ b for a, b in zip(client_key, client_sig))
        server_key = hmac.digest(salted, b"Server Key", "sha256")
        scram["server_sig"] = hmac.digest(
            server_key, auth_message, "sha256"
        )
        return final_bare + b",p=" + base64.b64encode(proof)

    # ------------------------------------------------------------- query

    def _simple_query(self, sql: str) -> tuple[list[tuple] | None, list]:
        self._send(b"Q", sql.encode() + b"\0")
        description: list[tuple] | None = None
        decoders: list = []
        rows: list[tuple] = []
        error: str | None = None
        while True:
            mtype, body = self._recv_msg()
            if mtype == b"T":  # RowDescription
                (nfields,) = struct.unpack("!h", body[:2])
                off = 2
                description, decoders = [], []
                for _ in range(nfields):
                    end = body.index(b"\0", off)
                    name = body[off:end].decode()
                    off = end + 1
                    _tbl, _att, oid, _len, typmod, _fmt = struct.unpack(
                        "!ihihih", body[off:off + 18]
                    )
                    off += 18
                    description.append(
                        (name, oid, None, None, None, typmod, None)
                    )
                    decoders.append(_DECODERS.get(oid, str))
            elif mtype == b"D":  # DataRow
                (ncols,) = struct.unpack("!h", body[:2])
                off = 2
                row = []
                for i in range(ncols):
                    (vlen,) = struct.unpack("!i", body[off:off + 4])
                    off += 4
                    if vlen == -1:
                        row.append(None)
                    else:
                        text = body[off:off + vlen].decode()
                        off += vlen
                        row.append(decoders[i](text))
                rows.append(tuple(row))
            elif mtype in (b"C", b"I", b"N", b"S"):
                continue  # CommandComplete / Empty / Notice / ParamStatus
            elif mtype == b"E":
                error = self._error_text(body)
            elif mtype == b"Z":  # ReadyForQuery: statement finished
                if error is not None:
                    raise PgClientError(error)
                return description, rows
            else:
                raise PgClientError(f"unexpected message {mtype!r}")

    def cursor(self) -> _Cursor:
        return _Cursor(self)

    def commit(self) -> None:
        """DB-API no-op: simple-query statements outside an explicit
        transaction block autocommit server-side."""

    def rollback(self) -> None:
        """DB-API no-op (see commit)."""

    def close(self) -> None:
        try:
            self._send(b"X", b"")  # Terminate
        except OSError:
            pass
        try:
            self._sock.close()
        except OSError:
            pass


def connect(
    host: str = "127.0.0.1",
    port: int = 5432,
    user: str = "postgres",
    dbname: str = "postgres",
    password: str | None = None,
    sslmode: str = "prefer",
    sslrootcert: str | None = None,
) -> PgWireConnection:
    return PgWireConnection(
        host, port, user, dbname, password,
        sslmode=sslmode, sslrootcert=sslrootcert,
    )
