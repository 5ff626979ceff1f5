"""Minimal Apache Avro Object Container File reader/writer.

Iceberg manifest lists and manifests are Avro files; no Avro library is
available in this environment, so this implements the (public, stable)
Avro 1.x binary spec directly — just enough for schema-driven generic
decoding:

* container framing: ``Obj\\x01`` magic, file-metadata map (embedded
  writer schema JSON + codec), 16-byte sync marker, then blocks of
  ``(row_count, byte_size, payload, sync)``;
* binary encoding: zigzag-varint ints/longs, little-endian IEEE floats,
  length-prefixed bytes/strings, field-ordered records, index-prefixed
  unions, block-encoded arrays/maps, enums as index, fixed as raw bytes.

Decoding is **generic against the embedded writer schema**, so both
Iceberg manifest format versions (v1/v2) parse without version-specific
code. Codecs: null and deflate (stdlib zlib); snappy/zstd via pyarrow's
Codec when present.

The writer half exists for tests (building Iceberg fixtures) and uses the
same primitives in reverse, null codec only.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any

_MAGIC = b"Obj\x01"


class AvroError(Exception):
    pass


# ----------------------------------------------------------------- decoding

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError("truncated avro data")
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _decode(r: _Reader, schema: Any, names: dict[str, Any]) -> Any:
    if isinstance(schema, str):
        if schema in names:
            return _decode(r, names[schema], names)
        t = schema
    elif isinstance(schema, list):  # union
        idx = r.long()
        if idx < 0 or idx >= len(schema):
            raise AvroError(f"bad union branch {idx}")
        return _decode(r, schema[idx], names)
    else:
        t = schema["type"]
        if t in ("record", "enum", "fixed") and schema.get("name"):
            names[schema["name"]] = schema
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.long())
    if t == "string":
        return r.read(r.long()).decode()
    if t == "record":
        return {f["name"]: _decode(r, f["type"], names) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.long()  # block byte size (unused)
            for _ in range(n):
                out.append(_decode(r, schema["items"], names))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.long()
            for _ in range(n):
                k = r.read(r.long()).decode()
                out[k] = _decode(r, schema["values"], names)
        return out
    raise AvroError(f"unsupported avro type {t!r}")


def _decompress(payload: bytes, codec: str) -> bytes:
    if codec in ("", "null"):
        return payload
    if codec == "deflate":
        return zlib.decompress(payload, -15)
    if codec in ("snappy", "zstandard", "zstd"):
        try:
            import pyarrow as pa

            name = "snappy" if codec == "snappy" else "zstd"
            data = payload[:-4] if codec == "snappy" else payload  # crc32 suffix
            return pa.Codec(name).decompress(data, decompressed_size=None).to_pybytes()
        except Exception as exc:  # noqa: BLE001
            raise AvroError(f"cannot decompress codec {codec}: {exc}") from exc
    raise AvroError(f"unsupported avro codec {codec!r}")


def read_avro(path: str) -> tuple[dict, list[dict]]:
    """Read a container file -> (file metadata, list of decoded rows)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != _MAGIC:
        raise AvroError(f"{path} is not an avro container file")
    r = _Reader(data)
    r.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = r.long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.long()
        for _ in range(n):
            k = r.read(r.long()).decode()
            meta[k] = r.read(r.long())
    sync = r.read(16)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    rows: list[dict] = []
    while not r.at_end():
        count = r.long()
        size = r.long()
        block = _decompress(r.read(size), codec)
        if r.read(16) != sync:
            raise AvroError("sync marker mismatch")
        br = _Reader(block)
        names: dict[str, Any] = {}
        for _ in range(count):
            rows.append(_decode(br, schema, names))
    return meta, rows


# ----------------------------------------------------------------- encoding

class _Writer:
    def __init__(self):
        self.buf = io.BytesIO()

    def write(self, b: bytes):
        self.buf.write(b)

    def long(self, v: int):
        v = (v << 1) ^ (v >> 63)  # zigzag (python ints: arithmetic shift ok)
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.buf.write(bytes([b | 0x80]))
            else:
                self.buf.write(bytes([b]))
                break


def _encode(w: _Writer, schema: Any, v: Any, names: dict[str, Any]) -> None:
    if isinstance(schema, str):
        if schema in names:
            return _encode(w, names[schema], v, names)
        t = schema
    elif isinstance(schema, list):  # union: pick first matching branch
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if (v is None) == (bt == "null"):
                w.long(i)
                return _encode(w, branch, v, names)
        raise AvroError(f"no union branch for {v!r}")
    else:
        t = schema["type"]
        if t in ("record", "enum", "fixed") and schema.get("name"):
            names[schema["name"]] = schema
    if t == "null":
        return None
    if t == "boolean":
        return w.write(b"\x01" if v else b"\x00")
    if t in ("int", "long"):
        return w.long(int(v))
    if t == "float":
        return w.write(struct.pack("<f", v))
    if t == "double":
        return w.write(struct.pack("<d", v))
    if t == "bytes":
        w.long(len(v))
        return w.write(v)
    if t == "string":
        b = v.encode()
        w.long(len(b))
        return w.write(b)
    if t == "record":
        for f in schema["fields"]:
            _encode(w, f["type"], v.get(f["name"]), names)
        return None
    if t == "array":
        if v:
            w.long(len(v))
            for item in v:
                _encode(w, schema["items"], item, names)
        w.long(0)
        return None
    if t == "map":
        if v:
            w.long(len(v))
            for k, mv in v.items():
                kb = k.encode()
                w.long(len(kb))
                w.write(kb)
                _encode(w, schema["values"], mv, names)
        w.long(0)
        return None
    raise AvroError(f"unsupported avro type for writing: {t!r}")


def write_avro(path: str, schema: dict, rows: list[dict], meta: dict | None = None) -> None:
    """Write a null-codec container file (test fixtures)."""
    sync = b"\x00" * 8 + b"seafowlav"[:8]
    out = io.BytesIO()
    out.write(_MAGIC)
    w = _Writer()
    file_meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    for k, v in (meta or {}).items():
        file_meta[k] = v if isinstance(v, bytes) else str(v).encode()
    w.long(len(file_meta))
    for k, v in file_meta.items():
        kb = k.encode()
        w.long(len(kb))
        w.write(kb)
        w.long(len(v))
        w.write(v)
    w.long(0)
    out.write(w.buf.getvalue())
    out.write(sync)
    body = _Writer()
    names: dict[str, Any] = {}
    for row in rows:
        _encode(body, schema, row, names)
    payload = body.buf.getvalue()
    blk = _Writer()
    blk.long(len(rows))
    blk.long(len(payload))
    out.write(blk.buf.getvalue())
    out.write(payload)
    out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())
