"""WASM MessagePack UDF ABI — marshalling parity with the reference
(src/wasm_udf/wasm.rs:263-520 conversions, :557-627 row loop, :92-175
memory protocol; type table data_types.rs:43-63). The InProcessExecutor
drives the exact alloc/write/call/size-prefixed-read/dealloc protocol, so
everything short of the bytecode interpreter is executed for real."""

from __future__ import annotations

import datetime as dt
import struct
from decimal import Decimal

import pytest

from seafowl_spark.engine.wasm_abi import (
    Float32,
    InProcessExecutor,
    WasmAbiError,
    decode_result,
    encode_input,
    make_row_callable,
    mp_decode,
    mp_encode,
    parse_udf_type,
)


class TestMessagePack:
    @pytest.mark.parametrize(
        "v",
        [
            None, True, False, 0, 1, 127, 128, 255, 256, 65535, 65536,
            -1, -32, -33, -128, -129, -32768, -32769, (1 << 62), -(1 << 62),
            1.5, -0.25, "", "hello", "é" * 40, b"\x00\xff", [1, "a", None],
            {"k": 1, "j": [True]}, list(range(20)),
        ],
    )
    def test_roundtrip(self, v):
        got = mp_decode(mp_encode(v))
        if isinstance(v, tuple):
            v = list(v)
        assert got == v

    def test_float32_wire_type_distinct(self):
        raw = mp_encode(Float32(1.5))
        assert raw[0] == 0xCA and len(raw) == 5
        back = mp_decode(raw)
        assert isinstance(back, Float32) and back == 1.5
        raw64 = mp_encode(1.5)
        assert raw64[0] == 0xCB
        assert not isinstance(mp_decode(raw64), Float32)

    def test_trailing_bytes_rejected(self):
        with pytest.raises(WasmAbiError, match="trailing"):
            mp_decode(mp_encode(1) + b"\x00")


class TestTypeTable:
    """Every type in data_types.rs:43-63 encodes and decodes."""

    def test_ints_and_ranges(self):
        for name, bits in (("smallint", 16), ("int", 32), ("bigint", 64), ("i32", 32), ("i64", 64)):
            t = parse_udf_type(name)
            hi = (1 << (bits - 1)) - 1
            assert encode_input(t, hi) == hi
            assert decode_result(t, -hi) == -hi
            with pytest.raises(WasmAbiError, match="out of range"):
                encode_input(t, hi + 1)
            with pytest.raises(WasmAbiError, match="out of range"):
                decode_result(t, hi + 1)

    def test_floats_strictness(self):
        f = parse_udf_type("float")
        assert isinstance(encode_input(f, 2.5), Float32)
        assert decode_result(f, Float32(2.5)) == 2.5
        # the reference only accepts Value::F32 for FLOAT results (wasm.rs:498-508)
        with pytest.raises(WasmAbiError, match="f32"):
            decode_result(f, 2.5)
        d = parse_udf_type("double")
        assert decode_result(d, 2.5) == 2.5
        assert decode_result(d, 3) == 3.0

    def test_text_bool(self):
        assert encode_input(parse_udf_type("text"), "x") == "x"
        assert decode_result(parse_udf_type("varchar"), "y") == "y"
        assert decode_result(parse_udf_type("boolean"), True) is True
        with pytest.raises(WasmAbiError):
            decode_result(parse_udf_type("boolean"), 1)
        with pytest.raises(WasmAbiError):
            decode_result(parse_udf_type("char"), 1)

    def test_date_roundtrip(self):
        t = parse_udf_type("date")
        days = encode_input(t, dt.date(2022, 11, 1))
        assert days == 19297
        assert decode_result(t, days) == dt.date(2022, 11, 1)

    def test_timestamp_ns(self):
        t = parse_udf_type("timestamp")
        ns = encode_input(t, dt.datetime(2022, 11, 1, 22, 11, 1))
        assert ns == 1667340661 * 10**9
        assert decode_result(t, ns) == dt.datetime(2022, 11, 1, 22, 11, 1)

    def test_decimal_i128_split(self):
        t = parse_udf_type("decimal(25, 6)")
        enc = encode_input(t, Decimal("1234.567891"))
        assert enc == [25, 6, 0, 1234567891]
        assert decode_result(t, enc) == Decimal("1234.567891")
        # negative scaled value: high word carries the sign
        enc_neg = encode_input(t, Decimal("-1234.567891"))
        assert enc_neg[2] == -1 and enc_neg[3] == -1234567891
        assert decode_result(t, enc_neg) == Decimal("-1234.567891")
        # > 64-bit scaled integer splits across words
        big = Decimal("92233720368547.758080")  # scaled = 2^63 * 10
        enc_big = encode_input(t, big)
        assert (enc_big[2] << 64) | (enc_big[3] & 0xFFFFFFFFFFFFFFFF) == 10 << 63
        assert decode_result(t, enc_big) == big
        with pytest.raises(WasmAbiError, match="does not match declared"):
            decode_result(t, [10, 2, 0, 1])

    def test_unknown_type_rejected(self):
        with pytest.raises(WasmAbiError, match="unsupported"):
            parse_udf_type("interval")


class TestExecutorProtocol:
    def test_roundtrip_through_linear_memory(self):
        """Input lands in 'memory' as one msgpack array; output is read
        through the 4-byte native-endian length prefix."""
        seen = {}

        def entry(payload: bytes) -> bytes:
            seen["params"] = mp_decode(payload)
            return mp_encode(sum(seen["params"]))

        ex = InProcessExecutor(entry)
        assert ex.call([2, 40]) == 42
        assert seen["params"] == [2, 40]
        assert not ex.live  # both buffers dealloc'd

    def test_size_prefix_layout(self):
        def entry(payload: bytes) -> bytes:
            return mp_encode("ok")

        ex = InProcessExecutor(entry)
        out_ptr = ex._udf(ex.alloc(1))
        (size,) = struct.unpack_from("=i", ex.memory, out_ptr)
        assert size == len(mp_encode("ok"))
        assert bytes(ex.memory[out_ptr + 4 : out_ptr + 4 + size]) == mp_encode("ok")

    def test_row_callable_null_shortcircuit(self):
        calls = []

        def entry(payload: bytes) -> bytes:
            calls.append(1)
            a, b = mp_decode(payload)
            return mp_encode(a + b)

        f = make_row_callable(InProcessExecutor(entry), ["bigint", "bigint"], "bigint")
        assert f(1, 2) == 3
        assert f(None, 2) is None  # module never invoked for NULL inputs
        assert len(calls) == 1

    def test_row_callable_sintau_shape(self):
        """The reference's e2e module computes 2^n-style math over floats
        (context/mod.rs:295-468); mirror the shape: f32 in, f32 out."""
        import math

        def entry(payload: bytes) -> bytes:
            (x,) = mp_decode(payload)
            return mp_encode(Float32(math.sin(2 * math.pi * float(x))))

        f = make_row_callable(InProcessExecutor(entry), ["real"], "real")
        assert abs(f(0.25) - 1.0) < 1e-6

    def test_row_callable_mixed_types(self):
        def entry(payload: bytes) -> bytes:
            s, n, flag, day = mp_decode(payload)
            return mp_encode(f"{s}:{n}:{flag}:{day}")

        f = make_row_callable(
            InProcessExecutor(entry),
            ["text", "int", "boolean", "date"],
            "text",
        )
        assert f("a", 7, True, dt.date(1970, 1, 2)) == "a:7:True:1"

    def test_wasmtime_gate_message(self):
        from seafowl_spark.engine.wasm_abi import WasmtimeExecutor

        with pytest.raises(WasmAbiError, match="wasmtime"):
            WasmtimeExecutor(b"\x00asm", "f")


class TestCreateFunctionValidation:
    def test_wasm_spec_type_table(self, ctx):
        import base64
        import json

        spec = {
            "entrypoint": "f",
            "language": "wasmMessagePack",
            "input_types": ["decimal(25, 6)", "timestamp", "real"],
            "return_type": "bigint",
            "data": base64.b64encode(b"\x00asm").decode(),
            "volatility": "immutable",
        }
        ctx.execute(f"CREATE FUNCTION wf AS '{json.dumps(spec)}'")
        # persisted; registration skips it (no wasmtime) but SELECTing the
        # catalog proves the spec validated and stored
        assert "wf" in ctx.catalog.functions(ctx.database)

    def test_wasm_spec_bad_type_rejected(self, ctx):
        import base64
        import json

        from seafowl_spark.engine.udf import UdfError

        spec = {
            "entrypoint": "f",
            "language": "wasmMessagePack",
            "input_types": ["interval"],
            "return_type": "bigint",
            "data": base64.b64encode(b"\x00asm").decode(),
        }
        with pytest.raises(UdfError, match="unsupported UDF type"):
            ctx.execute(f"CREATE FUNCTION wbad AS '{json.dumps(spec)}'")
