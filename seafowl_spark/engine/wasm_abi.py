"""WASM MessagePack UDF ABI — marshalling layer + executor protocol.

Parity target: src/wasm_udf/wasm.rs (reference). The reference's
``language='wasmMessagePack'`` functions speak this ABI per row:

* inputs are encoded as ONE MessagePack array of the row's argument
  values (wasm.rs:557-627 builds ``params`` then ``instance.call``);
* the module exports ``alloc(size)->ptr``, ``dealloc(ptr,size)``, its
  entrypoint ``f(ptr)->out_ptr``, and linear ``memory``; the host writes
  the encoded input at an alloc'd pointer, calls the entrypoint, then
  reads a **4-byte native-endian i32 length prefix** followed by the
  MessagePack-encoded result at the output pointer (wasm.rs:130-175);
* per-type conversions follow wasm_udf/data_types.rs:43-63 +
  wasm.rs:263-520: SMALLINT/INT/BIGINT as msgpack ints (range-checked on
  decode), FLOAT/REAL strictly float32 on the wire, DOUBLE float64,
  CHAR/VARCHAR/TEXT strings, BOOLEAN bools, DATE int32 days,
  TIMESTAMP int64 nanoseconds, DECIMAL(p,s) a 4-element array
  ``[precision, scale, high_i64, low_i64]`` of the scaled i128.

Everything here — the MessagePack codec (no msgpack lib in this
environment; the format is a public spec), the type conversions, and the
alloc/call/read/dealloc buffer protocol — is executable and tested. Only
the actual WASM bytecode interpreter requires the ``wasmtime`` package;
``WasmtimeExecutor`` gates on its import, and ``InProcessExecutor``
implements the identical memory protocol around a host callable so the
whole ABI is exercised without it.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import Any, Callable

SIZE_BYTE_COUNT = 4


class WasmAbiError(Exception):
    pass


# --------------------------------------------------------------------------
# Minimal MessagePack (public spec); float32 is a distinct wire type, which
# the FLOAT/REAL decode path must verify (wasm.rs:498-508 matches Value::F32)
# --------------------------------------------------------------------------

class Float32(float):
    """A float that came off (or goes onto) the wire as msgpack float32."""


def mp_encode(obj: Any) -> bytes:
    out = bytearray()
    _enc(obj, out)
    return bytes(out)


def _enc(o: Any, out: bytearray) -> None:
    if o is None:
        out.append(0xC0)
    elif isinstance(o, bool):
        out.append(0xC3 if o else 0xC2)
    elif isinstance(o, Float32):
        out.append(0xCA)
        out += struct.pack(">f", float(o))
    elif isinstance(o, float):
        out.append(0xCB)
        out += struct.pack(">d", o)
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            out.append(o)
        elif -32 <= o < 0:
            out.append(o & 0xFF)
        elif 0 <= o <= 0xFF:
            out += bytes([0xCC, o])
        elif 0 <= o <= 0xFFFF:
            out.append(0xCD)
            out += struct.pack(">H", o)
        elif 0 <= o <= 0xFFFFFFFF:
            out.append(0xCE)
            out += struct.pack(">I", o)
        elif 0 <= o <= 0xFFFFFFFFFFFFFFFF:
            out.append(0xCF)
            out += struct.pack(">Q", o)
        elif -0x80 <= o < 0:
            out.append(0xD0)
            out += struct.pack(">b", o)
        elif -0x8000 <= o < 0:
            out.append(0xD1)
            out += struct.pack(">h", o)
        elif -0x80000000 <= o < 0:
            out.append(0xD2)
            out += struct.pack(">i", o)
        elif -0x8000000000000000 <= o < 0:
            out.append(0xD3)
            out += struct.pack(">q", o)
        else:
            raise WasmAbiError(f"integer out of msgpack range: {o}")
    elif isinstance(o, str):
        b = o.encode()
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += bytes([0xD9, n])
        elif n <= 0xFFFF:
            out.append(0xDA)
            out += struct.pack(">H", n)
        else:
            out.append(0xDB)
            out += struct.pack(">I", n)
        out += b
    elif isinstance(o, bytes):
        n = len(o)
        if n <= 0xFF:
            out += bytes([0xC4, n])
        elif n <= 0xFFFF:
            out.append(0xC5)
            out += struct.pack(">H", n)
        else:
            out.append(0xC6)
            out += struct.pack(">I", n)
        out += o
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out.append(0xDC)
            out += struct.pack(">H", n)
        else:
            out.append(0xDD)
            out += struct.pack(">I", n)
        for item in o:
            _enc(item, out)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out.append(0xDE)
            out += struct.pack(">H", n)
        else:
            out.append(0xDF)
            out += struct.pack(">I", n)
        for k, v in o.items():
            _enc(k, out)
            _enc(v, out)
    else:
        raise WasmAbiError(f"cannot msgpack-encode {type(o).__name__}")


def mp_decode(data: bytes) -> Any:
    try:
        v, pos = _dec(data, 0)
    except (IndexError, struct.error) as exc:
        # reference surface: wasm.rs maps rmp decode failures to
        # "Error messagepack decoding output buffer" (tested in
        # context/mod.rs write_garbage_output e2e)
        raise WasmAbiError(
            "Error messagepack decoding output buffer: truncated or "
            "malformed value"
        ) from exc
    if pos != len(data):
        raise WasmAbiError(f"trailing bytes after msgpack value ({len(data)-pos})")
    return v


def _dec(b: bytes, p: int) -> tuple[Any, int]:
    t = b[p]
    p += 1
    if t <= 0x7F:
        return t, p
    if t >= 0xE0:
        return t - 0x100, p
    if 0x80 <= t <= 0x8F:
        return _dec_map(b, p, t & 0x0F)
    if 0x90 <= t <= 0x9F:
        return _dec_arr(b, p, t & 0x0F)
    if 0xA0 <= t <= 0xBF:
        n = t & 0x1F
        return b[p : p + n].decode(), p + n
    if t == 0xC0:
        return None, p
    if t == 0xC2:
        return False, p
    if t == 0xC3:
        return True, p
    if t == 0xC4:
        n = b[p]
        return bytes(b[p + 1 : p + 1 + n]), p + 1 + n
    if t == 0xC5:
        (n,) = struct.unpack_from(">H", b, p)
        return bytes(b[p + 2 : p + 2 + n]), p + 2 + n
    if t == 0xC6:
        (n,) = struct.unpack_from(">I", b, p)
        return bytes(b[p + 4 : p + 4 + n]), p + 4 + n
    if t == 0xCA:
        return Float32(struct.unpack_from(">f", b, p)[0]), p + 4
    if t == 0xCB:
        return struct.unpack_from(">d", b, p)[0], p + 8
    if t == 0xCC:
        return b[p], p + 1
    if t == 0xCD:
        return struct.unpack_from(">H", b, p)[0], p + 2
    if t == 0xCE:
        return struct.unpack_from(">I", b, p)[0], p + 4
    if t == 0xCF:
        return struct.unpack_from(">Q", b, p)[0], p + 8
    if t == 0xD0:
        return struct.unpack_from(">b", b, p)[0], p + 1
    if t == 0xD1:
        return struct.unpack_from(">h", b, p)[0], p + 2
    if t == 0xD2:
        return struct.unpack_from(">i", b, p)[0], p + 4
    if t == 0xD3:
        return struct.unpack_from(">q", b, p)[0], p + 8
    if t == 0xD9:
        n = b[p]
        return b[p + 1 : p + 1 + n].decode(), p + 1 + n
    if t == 0xDA:
        (n,) = struct.unpack_from(">H", b, p)
        return b[p + 2 : p + 2 + n].decode(), p + 2 + n
    if t == 0xDB:
        (n,) = struct.unpack_from(">I", b, p)
        return b[p + 4 : p + 4 + n].decode(), p + 4 + n
    if t == 0xDC:
        (n,) = struct.unpack_from(">H", b, p)
        return _dec_arr(b, p + 2, n)
    if t == 0xDD:
        (n,) = struct.unpack_from(">I", b, p)
        return _dec_arr(b, p + 4, n)
    if t == 0xDE:
        (n,) = struct.unpack_from(">H", b, p)
        return _dec_map(b, p + 2, n)
    if t == 0xDF:
        (n,) = struct.unpack_from(">I", b, p)
        return _dec_map(b, p + 4, n)
    raise WasmAbiError(f"unsupported msgpack tag 0x{t:02x}")


def _dec_arr(b: bytes, p: int, n: int) -> tuple[list, int]:
    out = []
    for _ in range(n):
        v, p = _dec(b, p)
        out.append(v)
    return out, p


def _dec_map(b: bytes, p: int, n: int) -> tuple[dict, int]:
    out = {}
    for _ in range(n):
        k, p = _dec(b, p)
        v, p = _dec(b, p)
        out[k] = v
    return out, p


# --------------------------------------------------------------------------
# Type conversions (data_types.rs:43-63; wasm.rs:263-520)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class UdfType:
    """Parsed CREATE FUNCTION type name."""

    name: str  # canonical lowercase
    precision: int = 0
    scale: int = 0


_INT_TYPES = {"smallint": 16, "int": 32, "i32": 32, "bigint": 64, "i64": 64}
_CANON = {
    "smallint", "int", "bigint", "i32", "i64", "char", "varchar", "text",
    "float", "real", "f32", "double", "f64", "boolean", "date", "timestamp",
}


def parse_udf_type(s: str) -> UdfType:
    low = s.strip().lower()
    if low.startswith("decimal"):
        import re

        m = re.fullmatch(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", low)
        if not m:
            raise WasmAbiError(f"bad decimal type {s!r}")
        return UdfType("decimal", int(m.group(1)), int(m.group(2)))
    if low not in _CANON:
        raise WasmAbiError(f"unsupported UDF type {s!r} (data_types.rs:43-63)")
    return UdfType(low)


def encode_input(t: UdfType, v: Any) -> Any:
    """Python value -> the msgpack-level value the reference would send."""
    if v is None:
        raise WasmAbiError("NULL inputs short-circuit before the WASM call")
    if t.name in _INT_TYPES:
        iv = int(v)
        bits = _INT_TYPES[t.name]
        if not -(1 << (bits - 1)) <= iv < (1 << (bits - 1)):
            raise WasmAbiError(f"{iv} out of range for {t.name}")
        return iv
    if t.name in ("float", "real", "f32"):
        return Float32(v)
    if t.name in ("double", "f64"):
        return float(v)
    if t.name in ("char", "varchar", "text"):
        return str(v)
    if t.name == "boolean":
        return bool(v)
    if t.name == "date":  # int32 days since epoch (Date32)
        import datetime as _dt

        if isinstance(v, _dt.date):
            return (v - _dt.date(1970, 1, 1)).days
        return int(v)
    if t.name == "timestamp":  # int64 nanoseconds
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            epoch = _dt.datetime(1970, 1, 1, tzinfo=v.tzinfo)
            delta = v - epoch
            us = (delta.days * 86_400 + delta.seconds) * 10**6 + delta.microseconds
            return us * 1000
        return int(v)
    if t.name == "decimal":
        # scaled i128 split into [precision, scale, high_i64, low_i64]
        from decimal import Decimal

        scaled = int(Decimal(str(v)).scaleb(t.scale).to_integral_value())
        high = scaled >> 64
        low = scaled & 0xFFFFFFFFFFFFFFFF
        if low >= 1 << 63:
            low -= 1 << 64  # reference reads the low word as i64
        return [t.precision, t.scale, high, low]
    raise WasmAbiError(f"unhandled input type {t}")


def decode_result(t: UdfType, v: Any) -> Any:
    """Msgpack-level result value -> Python value, with the reference's
    strictness (FLOAT must be wire-f32; ints are range-checked)."""
    if t.name in _INT_TYPES:
        if isinstance(v, bool) or not isinstance(v, int):
            raise WasmAbiError(f"expected integer result, got {v!r}")
        bits = _INT_TYPES[t.name]
        if not -(1 << (bits - 1)) <= v < (1 << (bits - 1)):
            raise WasmAbiError(f"result {v} out of range for {t.name}")
        return v
    if t.name in ("float", "real", "f32"):
        if not isinstance(v, Float32):
            raise WasmAbiError(f"expected f32 result, got {v!r}")
        return float(v)
    if t.name in ("double", "f64"):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise WasmAbiError(f"expected f64 result, got {v!r}")
        return float(v)
    if t.name in ("char", "varchar", "text"):
        if not isinstance(v, str):
            raise WasmAbiError(f"expected string result, got {v!r}")
        return v
    if t.name == "boolean":
        if not isinstance(v, bool):
            raise WasmAbiError(f"expected boolean result, got {v!r}")
        return v
    if t.name == "date":
        import datetime as _dt

        if isinstance(v, bool) or not isinstance(v, int):
            raise WasmAbiError(f"expected date32 result, got {v!r}")
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=v)
    if t.name == "timestamp":
        import datetime as _dt

        if isinstance(v, bool) or not isinstance(v, int):
            raise WasmAbiError(f"expected timestamp result, got {v!r}")
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=v // 1000)
    if t.name == "decimal":
        from decimal import Decimal

        if not isinstance(v, list) or len(v) != 4:
            raise WasmAbiError(f"DECIMAL result must be a 4-element array, got {v!r}")
        p, s, high, low = v
        if p != t.precision or s != t.scale:
            raise WasmAbiError(
                f"decimal ({p},{s}) does not match declared ({t.precision},{t.scale})"
            )
        scaled = (int(high) << 64) | (int(low) & 0xFFFFFFFFFFFFFFFF)
        return Decimal(scaled).scaleb(-t.scale)
    raise WasmAbiError(f"unhandled result type {t}")


# --------------------------------------------------------------------------
# Executor protocol: alloc -> write -> call -> size-prefixed read -> dealloc
# --------------------------------------------------------------------------

class InProcessExecutor:
    """Drives the EXACT wasm.rs memory protocol against an in-process
    callable standing in for the module's entrypoint: a linear bytearray
    "memory", bump alloc/dealloc, input written at an alloc'd pointer,
    output read back through the 4-byte length prefix. Lets the whole ABI
    round-trip be tested without a WASM interpreter in the environment."""

    def __init__(self, fn: Callable[[bytes], bytes]):
        self.fn = fn
        self.memory = bytearray(64 * 1024)
        self._next = 16
        self.live: dict[int, int] = {}

    def alloc(self, size: int) -> int:
        ptr = self._next
        while ptr + size > len(self.memory):
            self.memory.extend(b"\x00" * len(self.memory))
        self._next = ptr + size
        self.live[ptr] = size
        return ptr

    def dealloc(self, ptr: int, size: int) -> None:
        self.live.pop(ptr, None)

    def _udf(self, in_ptr: int) -> int:
        (size,) = struct.unpack_from("=i", self.memory, in_ptr)
        start = in_ptr + SIZE_BYTE_COUNT
        payload = bytes(self.memory[start : start + size])
        out = self.fn(payload)
        out_ptr = self.alloc(SIZE_BYTE_COUNT + len(out))
        self.memory[out_ptr : out_ptr + SIZE_BYTE_COUNT] = struct.pack("=i", len(out))
        self.memory[
            out_ptr + SIZE_BYTE_COUNT : out_ptr + SIZE_BYTE_COUNT + len(out)
        ] = out
        return out_ptr

    def call(self, params: list[Any]) -> Any:
        """wasm.rs WasmMessagePackUDFInstance::call, line for line: the
        input buffer is size-prefixed exactly like the output
        (wasm.rs:168-207 write_udf_input allocs len+4 and writes the i32
        length first)."""
        encoded = mp_encode(list(params))
        in_size = len(encoded) + SIZE_BYTE_COUNT
        in_ptr = self.alloc(in_size)
        self.memory[in_ptr : in_ptr + SIZE_BYTE_COUNT] = struct.pack(
            "=i", len(encoded)
        )
        self.memory[in_ptr + SIZE_BYTE_COUNT : in_ptr + in_size] = encoded
        out_ptr = self._udf(in_ptr)
        (out_size,) = struct.unpack_from("=i", self.memory, out_ptr)
        start = out_ptr + SIZE_BYTE_COUNT
        result = mp_decode(bytes(self.memory[start : start + out_size]))
        self.dealloc(in_ptr, in_size)
        self.dealloc(out_ptr, SIZE_BYTE_COUNT + out_size)
        return result


class WasmtimeExecutor:
    """The real thing — identical protocol over a wasmtime instance
    (wasm.rs:92-175). Gated on the wasmtime package."""

    def __init__(self, module_bytes: bytes, entrypoint: str):
        try:
            import wasmtime
        except ImportError as exc:
            raise WasmAbiError(
                "executing WASM bytecode requires the wasmtime package, which "
                "is not installed; the MessagePack ABI itself is fully "
                "implemented (see InProcessExecutor)"
            ) from exc
        engine = wasmtime.Engine()
        module = wasmtime.Module(engine, module_bytes)
        linker = wasmtime.Linker(engine)
        linker.define_wasi()
        self.store = wasmtime.Store(engine)
        self.store.set_wasi(wasmtime.WasiConfig())
        instance = linker.instantiate(self.store, module)
        exports = instance.exports(self.store)
        self._alloc = exports["alloc"]
        self._dealloc = exports["dealloc"]
        self._udf = exports[entrypoint]
        self._memory = exports["memory"]

    def call(self, params: list[Any]) -> Any:
        encoded = mp_encode(list(params))
        in_size = len(encoded) + SIZE_BYTE_COUNT
        in_ptr = self._alloc(self.store, in_size)
        self._memory.write(self.store, struct.pack("=i", len(encoded)), in_ptr)
        self._memory.write(self.store, encoded, in_ptr + SIZE_BYTE_COUNT)
        out_ptr = self._udf(self.store, in_ptr)
        size_raw = self._memory.read(self.store, out_ptr, out_ptr + SIZE_BYTE_COUNT)
        (out_size,) = struct.unpack("=i", bytes(size_raw))
        start = out_ptr + SIZE_BYTE_COUNT
        result = mp_decode(bytes(self._memory.read(self.store, start, start + out_size)))
        self._dealloc(self.store, in_ptr, in_size)
        self._dealloc(self.store, out_ptr, SIZE_BYTE_COUNT + out_size)
        return result


class InterpExecutor:
    """Same protocol over the pure-Python interpreter (wasm_interp.py) —
    the no-dependency fallback when wasmtime is absent. Instantiates
    lazily so the callable pickles cheaply to Spark workers (only the
    module bytes travel; each worker decodes once)."""

    def __init__(self, module_bytes: bytes, entrypoint: str):
        from . import wasm_interp  # parse eagerly: surface bad modules now

        self._module_bytes = module_bytes
        self._entrypoint = entrypoint
        try:
            module = wasm_interp.parse_module(module_bytes)
        except (wasm_interp.WasmError, IndexError, struct.error) as exc:
            raise WasmAbiError(f"invalid WASM module: {exc}") from exc
        ent = module.exports.get(entrypoint)
        if ent is None or ent[0] != 0:
            raise WasmAbiError(
                f"entrypoint {entrypoint!r} is not a function export"
            )
        for req in ("alloc", "dealloc", "memory"):
            if req not in module.exports:
                raise WasmAbiError(f"module does not export {req!r}")
        self._inst = None

    def _instance(self):
        if self._inst is None:
            from . import wasm_interp

            self._inst = wasm_interp.Instance(
                wasm_interp.parse_module(self._module_bytes)
            )
        return self._inst

    def call(self, params: list[Any]) -> Any:
        from .wasm_interp import WasmTrap

        inst = self._instance()
        encoded = mp_encode(list(params))
        in_size = len(encoded) + SIZE_BYTE_COUNT
        try:
            # invoke() returns i32 SIGNED (wasmtime-consistent); a pointer
            # in a >2 GiB memory surfaces negative, so mask back to the
            # unsigned address before any slicing
            in_ptr = inst.invoke("alloc", in_size) & 0xFFFFFFFF
            inst.memory[in_ptr : in_ptr + SIZE_BYTE_COUNT] = struct.pack(
                "=i", len(encoded)
            )
            inst.memory[in_ptr + SIZE_BYTE_COUNT : in_ptr + in_size] = encoded
            out_ptr = inst.invoke(self._entrypoint, in_ptr) & 0xFFFFFFFF
            (out_size,) = struct.unpack_from("=i", inst.memory, out_ptr)
            start = out_ptr + SIZE_BYTE_COUNT
            result = mp_decode(bytes(inst.memory[start : start + out_size]))
            inst.invoke("dealloc", in_ptr, in_size)
            inst.invoke("dealloc", out_ptr, SIZE_BYTE_COUNT + out_size)
        except WasmTrap as exc:
            self._inst = None  # trapped instances may hold poisoned state
            raise WasmAbiError(f"Error invoking WASM UDF: {exc}") from exc
        return result

    def __getstate__(self):
        return {
            "_module_bytes": self._module_bytes,
            "_entrypoint": self._entrypoint,
        }

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._inst = None


# --------------------------------------------------------------------------
# Legacy raw ABI (language='wasm'): numeric-only exports called per row with
# plain i32/i64/f32/f64 params — no linear-memory protocol, no serialization
# (reference wasm.rs:628-765; type table data_types.rs:11-29 get_wasm_type)
# --------------------------------------------------------------------------

# CREATE FUNCTION type name -> wasm value type, exactly the reference's
# get_wasm_type match arms (legacy wasm-native names + the DDL names it
# accepts); anything else is rejected with the reference's error shape
RAW_WASM_TYPES = {
    "i32": "i32", "i64": "i64", "f32": "f32", "f64": "f64",
    "int": "i32", "bigint": "i64",
    "float": "f32", "real": "f32", "double": "f64",
}


def parse_raw_type(s: str) -> str:
    low = s.strip().lower()
    wt = RAW_WASM_TYPES.get(low)
    if wt is None:
        raise WasmAbiError(
            f"UDFs with language 'wasm' do not support data type {s}"
        )
    return wt


class RawWasmtimeExecutor:
    """Per-row numeric call through wasmtime — the reference's
    make_scalar_function_from_wasm without the msgpack buffer dance."""

    def __init__(self, module_bytes: bytes, entrypoint: str):
        try:
            import wasmtime
        except ImportError as exc:
            raise WasmAbiError(
                "executing WASM bytecode requires the wasmtime package"
            ) from exc
        engine = wasmtime.Engine()
        module = wasmtime.Module(engine, module_bytes)
        linker = wasmtime.Linker(engine)
        linker.define_wasi()
        self.store = wasmtime.Store(engine)
        self.store.set_wasi(wasmtime.WasiConfig())
        instance = linker.instantiate(self.store, module)
        exports = instance.exports(self.store)
        if entrypoint not in exports:
            raise WasmAbiError(f"Error loading function {entrypoint!r}")
        self._udf = exports[entrypoint]

    def call_raw(self, params: list[Any]) -> Any:
        return self._udf(self.store, *params)


class RawInterpExecutor:
    """Same raw calls over the pure-Python interpreter; lazily instantiated
    so the callable pickles cheaply to Spark workers."""

    def __init__(self, module_bytes: bytes, entrypoint: str):
        from . import wasm_interp

        self._module_bytes = module_bytes
        self._entrypoint = entrypoint
        try:
            module = wasm_interp.parse_module(module_bytes)
        except (wasm_interp.WasmError, IndexError, struct.error) as exc:
            raise WasmAbiError(f"invalid WASM module: {exc}") from exc
        ent = module.exports.get(entrypoint)
        if ent is None or ent[0] != 0:
            raise WasmAbiError(
                f"entrypoint {entrypoint!r} is not a function export"
            )
        self._inst = None

    def _instance(self):
        if self._inst is None:
            from . import wasm_interp

            self._inst = wasm_interp.Instance(
                wasm_interp.parse_module(self._module_bytes)
            )
        return self._inst

    def call_raw(self, params: list[Any]) -> Any:
        from .wasm_interp import WasmTrap

        try:
            return self._instance().invoke(self._entrypoint, *params)
        except WasmTrap as exc:
            self._inst = None  # trapped instances may hold poisoned state
            raise WasmAbiError(f"Error invoking WASM UDF: {exc}") from exc

    def __getstate__(self):
        return {
            "_module_bytes": self._module_bytes,
            "_entrypoint": self._entrypoint,
        }

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._inst = None


def make_raw_row_callable(
    executor, input_types: list[str], return_type: str
) -> Callable[..., Any]:
    """Per-row callable for the legacy raw ABI: marshal Python values to
    plain wasm numerics and back. NULL inputs short-circuit to NULL
    without invoking the module (stricter than the reference, which reads
    whatever the arrow buffer holds under a null slot — returning NULL is
    the only answer that doesn't depend on buffer contents)."""
    ins = [parse_raw_type(t) for t in input_types]
    ret = parse_raw_type(return_type)

    def _to_wasm(wt: str, v: Any) -> Any:
        if wt in ("i32", "i64"):
            iv = int(v)
            bits = 32 if wt == "i32" else 64
            if not -(1 << (bits - 1)) <= iv < (1 << (bits - 1)):
                raise WasmAbiError(f"{iv} out of range for {wt}")
            return iv
        return float(v)

    def call(*args: Any) -> Any:
        if len(args) != len(ins):
            raise WasmAbiError(f"expected {len(ins)} arguments, got {len(args)}")
        if any(a is None for a in args):
            return None
        out = executor.call_raw([_to_wasm(t, a) for t, a in zip(ins, args)])
        return int(out) if ret in ("i32", "i64") else float(out)

    return call


def make_row_callable(
    executor, input_types: list[str], return_type: str
) -> Callable[..., Any]:
    """Per-row callable with the reference's null semantics (any NULL input
    -> NULL output without invoking the module) and type marshalling."""
    ins = [parse_udf_type(t) for t in input_types]
    ret = parse_udf_type(return_type)

    def call(*args: Any) -> Any:
        if len(args) != len(ins):
            raise WasmAbiError(
                f"expected {len(ins)} arguments, got {len(args)}"
            )
        if any(a is None for a in args):
            return None
        params = [encode_input(t, a) for t, a in zip(ins, args)]
        return decode_result(ret, executor.call(params))

    return call
