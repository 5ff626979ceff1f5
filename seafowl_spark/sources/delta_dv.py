"""Delta Lake deletion-vector (DV) decoding — pure Python, spec-faithful.

Modern Delta writers (delta-spark >= 2.3, Databricks default) persist
DELETE/UPDATE as merge-on-read deletion vectors instead of rewriting data
files: the add action carries a ``deletionVector`` descriptor naming a
roaring bitmap of dead row indexes. This module decodes them so
``read_delta`` can serve such tables (sources/delta_log.py applies the
bitmaps as anti-joins against ``_metadata.row_index``).

Everything follows the public Delta protocol spec (PROTOCOL.md, "Deletion
Vectors") and the RoaringFormatSpec:

* descriptor ``storageType``: ``u`` (relative file, path = random prefix +
  Z85-encoded UUID), ``i`` (inline, Z85-encoded payload), ``p`` (absolute
  path);
* DV files start with a 1-byte format version (= 1); each stored DV is
  ``[dataSize: int32 BE][data][crc32(data): int32 BE]`` at its descriptor
  offset — inline DVs are the bare ``data`` bytes;
* ``data`` is ``[magic 1681511377: int32 LE][RoaringBitmapArray]`` where the
  array is the 64-bit "portable" format: ``[nBitmaps: int64 LE]`` then per
  bitmap ``[key(high 32 bits): int32 LE][standard 32-bit roaring bitmap]``;
* the 32-bit bitmap uses the standard serialization: cookie 12346 (no run
  containers, offset table always present) or 12347 (run-container bitset,
  cookie's high 16 bits = nContainers-1, offsets present iff n >= 4), then
  per-container ``[key: u16][cardinality-1: u16]`` headers and array
  (sorted u16s) / bitmap (1024 u64 words) / run ((start, len-1) u16 pairs)
  container payloads, all little-endian.

The encoder exists for tests and for DV-producing writes; encode->decode is
additionally pinned by golden byte vectors so the pair can't drift from the
spec together.
"""

from __future__ import annotations

import os
import struct
import uuid as _uuid
import zlib

# ---------------------------------------------------------------- Z85

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    ".-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DEC = {c: i for i, c in enumerate(_Z85_ALPHABET)}


class DvError(Exception):
    pass


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise DvError(f"z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        v = 0
        for c in text[i : i + 5]:
            try:
                v = v * 85 + _Z85_DEC[c]
            except KeyError:
                raise DvError(f"invalid z85 character {c!r}") from None
        out += v.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise DvError(f"z85 payload length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[r])
        out += reversed(chunk)
    return "".join(out)


# ------------------------------------------------- roaring bitmap (32-bit)

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_MAGIC = 1681511377  # RoaringBitmapArray magic (Delta PROTOCOL.md)


def _decode_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Decode one standard 32-bit roaring bitmap at ``pos``; returns
    (sorted values, next position)."""
    (cookie32,) = struct.unpack_from("<i", buf, pos)
    cookie = cookie32 & 0xFFFF
    if cookie == _SERIAL_COOKIE:
        n = (cookie32 >> 16 & 0xFFFF) + 1
        pos += 4
        nbits = (n + 7) // 8
        run_bitset = buf[pos : pos + nbits]
        pos += nbits
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        run_bitset = None
        has_offsets = True
    else:
        raise DvError(f"bad roaring cookie {cookie}")
    keys_cards = []
    for i in range(n):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        keys_cards.append((key, card_m1 + 1))
        pos += 4
    if has_offsets:
        pos += 4 * n  # offset table (we decode sequentially)
    values: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        is_run = run_bitset is not None and (run_bitset[i // 8] >> (i % 8)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, len_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                values.extend(base + v for v in range(start, start + len_m1 + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    values.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
    return values, pos


def _encode_rb32(values: list[int]) -> bytes:
    """Standard no-run-container serialization (cookie 12346)."""
    containers: dict[int, list[int]] = {}
    for v in sorted(values):
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray(struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys)))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset table: absolute byte offsets of each container's payload
    header_end = len(out) + 4 * len(keys)
    payloads = []
    for k in keys:
        vals = containers[k]
        if len(vals) <= 4096:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            payloads.append(struct.pack("<1024Q", *words))
    off = header_end
    for p in payloads:
        out += struct.pack("<i", off)
        off += len(p)
    for p in payloads:
        out += p
    return bytes(out)


def decode_rbm_array(data: bytes) -> list[int]:
    """Z85/file payload -> sorted 64-bit row indexes."""
    if len(data) < 12:
        raise DvError("deletion vector payload too short")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != _MAGIC:
        raise DvError(f"bad deletion-vector magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for _ in range(n_bitmaps):
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, pos = _decode_rb32(data, pos)
        out.extend((key << 32) | v for v in vals)
    return out


def encode_rbm_array(indexes: list[int]) -> bytes:
    by_high: dict[int, list[int]] = {}
    for v in sorted(set(indexes)):
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<iq", _MAGIC, len(by_high)))
    for high in sorted(by_high):
        out += struct.pack("<i", high)
        out += _encode_rb32(by_high[high])
    return bytes(out)


# ------------------------------------------------------------- descriptors

def dv_absolute_path(table_dir: str, descriptor: dict) -> str:
    """Resolve a ``u``/``p`` descriptor to the DV file path."""
    st = descriptor.get("storageType")
    p = descriptor.get("pathOrInlineDv", "")
    if st == "p":
        return p
    if st == "u":
        if len(p) < 20:
            raise DvError(f"storageType=u path too short: {p!r}")
        prefix, enc = p[:-20], p[-20:]
        u = _uuid.UUID(bytes=z85_decode(enc))
        name = f"deletion_vector_{u}.bin"
        return os.path.join(table_dir, prefix, name) if prefix else os.path.join(
            table_dir, name
        )
    raise DvError(f"unsupported deletion vector storageType {st!r}")


def read_dv(table_dir: str, descriptor: dict) -> list[int]:
    """Descriptor -> sorted deleted row indexes for that file."""
    st = descriptor.get("storageType")
    size = int(descriptor.get("sizeInBytes", 0))
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])[:size]
    else:
        path = dv_absolute_path(table_dir, descriptor)
        with open(path, "rb") as f:
            blob = f.read()
        if not blob or blob[0] != 1:
            raise DvError(f"unsupported DV file format version in {path}")
        off = descriptor.get("offset")
        if off is None:
            off = 1  # single-DV file: payload follows the version byte
        (data_size,) = struct.unpack_from(">i", blob, off)
        if data_size != size:
            raise DvError(
                f"DV size mismatch: descriptor {size}, file {data_size}"
            )
        data = blob[off + 4 : off + 4 + data_size]
        (crc,) = struct.unpack_from(">I", blob, off + 4 + data_size)
        if (zlib.crc32(data) & 0xFFFFFFFF) != (crc & 0xFFFFFFFF):
            raise DvError(f"DV checksum mismatch in {path}")
    vals = decode_rbm_array(data)
    card = descriptor.get("cardinality")
    if card is not None and int(card) != len(vals):
        raise DvError(
            f"DV cardinality mismatch: descriptor {card}, decoded {len(vals)}"
        )
    return vals


def encode_framed_dv(indexes: list[int]) -> tuple[bytes, int]:
    """Single-DV ``.bin`` blob (delta framing: version byte, BE size,
    payload, CRC) and its cardinality — byte-level so any object store can
    carry it."""
    data = encode_rbm_array(indexes)
    blob = bytearray(b"\x01")
    blob += struct.pack(">i", len(data))
    blob += data
    blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    return bytes(blob), len(set(indexes))


def decode_framed_blob(blob: bytes, where: str = "<blob>") -> list[int]:
    """Decode a single-DV framed blob produced by ``encode_framed_dv``."""
    if not blob or blob[0] != 1:
        raise DvError(f"unsupported DV file format version in {where}")
    (size,) = struct.unpack_from(">i", blob, 1)
    data = blob[5 : 5 + size]
    (crc,) = struct.unpack_from(">I", blob, 5 + size)
    if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
        raise DvError(f"DV checksum mismatch in {where}")
    return decode_rbm_array(data)


def write_framed_dv(path: str, indexes: list[int]) -> int:
    """Write a single-DV ``.bin`` at an exact local path; returns the
    cardinality. Used by the engine's own merge-on-read DELETE — same
    format as Delta's DV files, atomically placed (temp + rename)."""
    blob, card = encode_framed_dv(indexes)
    tmp = f"{path}.tmp.{_uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return card


def decode_framed_dv(path: str) -> list[int]:
    """Read a single-DV ``.bin`` written by ``write_framed_dv`` (or any
    delta DV file holding one vector after the version byte)."""
    with open(path, "rb") as f:
        blob = f.read()
    return decode_framed_blob(blob, path)


def write_dv_file(table_dir: str, indexes: list[int]) -> dict:
    """Write a single-DV ``.bin`` and return its ``u`` descriptor —
    the writer-side twin used by tests and DV-producing deletes."""
    u = _uuid.uuid4()
    data = encode_rbm_array(indexes)
    blob = bytearray(b"\x01")
    offset = len(blob)
    blob += struct.pack(">i", len(data))
    blob += data
    blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    path = os.path.join(table_dir, f"deletion_vector_{u}.bin")
    with open(path, "wb") as f:
        f.write(bytes(blob))
    return {
        "storageType": "u",
        "pathOrInlineDv": z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": len(data),
        "cardinality": len(set(indexes)),
    }
