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


class TestRawAbi:
    """Legacy language='wasm' raw numeric ABI (reference wasm.rs:628-765,
    type table data_types.rs:11-29): exports called per row with plain
    i32/i64/f32/f64 values, no linear-memory protocol."""

    def _module(self):
        from test_wasm_interp import F32, I64, build, functype

        return build(
            [functype([F32], [F32]), functype([I64, I64], [I64])],
            [
                (0, [], b"\x20\x00\x20\x00\x92"),  # dbl: x + x (f32.add)
                (1, [], b"\x20\x00\x20\x01\x7c"),  # addl: a + b (i64.add)
            ],
            exports=[("dbl", 0, 0), ("addl", 0, 1)],
        )

    def test_type_table_matches_reference(self):
        from seafowl_spark.engine.wasm_abi import parse_raw_type

        assert parse_raw_type("i32") == "i32"
        assert parse_raw_type("INT") == "i32"
        assert parse_raw_type("bigint") == "i64"
        assert parse_raw_type("real") == "f32"
        assert parse_raw_type("FLOAT") == "f32"
        assert parse_raw_type("double") == "f64"
        with pytest.raises(WasmAbiError, match="language 'wasm' do not support"):
            parse_raw_type("text")
        with pytest.raises(WasmAbiError, match="do not support"):
            parse_raw_type("decimal(10,2)")

    def test_raw_interp_executor_calls(self):
        from seafowl_spark.engine.wasm_abi import RawInterpExecutor

        ex = RawInterpExecutor(self._module(), "dbl")
        assert ex.call_raw([1.5]) == 3.0
        ex2 = RawInterpExecutor(self._module(), "addl")
        assert ex2.call_raw([40, 2]) == 42

    def test_missing_entrypoint_rejected(self):
        from seafowl_spark.engine.wasm_abi import RawInterpExecutor

        with pytest.raises(WasmAbiError, match="not a function export"):
            RawInterpExecutor(self._module(), "nope")

    def test_row_callable_marshalling(self):
        from seafowl_spark.engine.wasm_abi import (
            RawInterpExecutor,
            make_raw_row_callable,
        )

        f = make_raw_row_callable(
            RawInterpExecutor(self._module(), "addl"), ["bigint", "i64"], "bigint"
        )
        assert f(40, 2) == 42
        assert f(None, 2) is None  # NULL short-circuits, module not invoked
        with pytest.raises(WasmAbiError, match="out of range"):
            make_raw_row_callable(
                RawInterpExecutor(self._module(), "addl"), ["int", "int"], "int"
            )(1 << 40, 0)

    def test_executor_pickles_for_spark_workers(self):
        import pickle

        from seafowl_spark.engine.wasm_abi import RawInterpExecutor

        ex = RawInterpExecutor(self._module(), "addl")
        assert ex.call_raw([2, 3]) == 5
        ex2 = pickle.loads(pickle.dumps(ex))
        assert ex2.call_raw([20, 22]) == 42

    def test_spec_validation(self):
        import base64

        from seafowl_spark.engine.udf import UdfError, validate_spec

        spec = {
            "entrypoint": "dbl",
            "language": "wasm",
            "input_types": ["text"],
            "return_type": "int",
            "data": base64.b64encode(self._module()).decode(),
        }
        with pytest.raises(UdfError, match="do not support data type"):
            validate_spec(spec)
        spec["input_types"] = ["f32"]
        spec["return_type"] = "f32"
        validate_spec(spec)  # legacy wasm-native names accepted


FIXTURE = "/root/reference/resources/test/messagepack_rust.wasm"
needs_fixture = pytest.mark.skipif(
    not __import__("os").path.exists(FIXTURE),
    reason="reference wasm fixture not present",
)


@needs_fixture
class TestInterpreterFixture:
    """Runs the reference's OWN 230 KB rustc test module through the
    pure-Python interpreter (wasm_interp.py) and asserts the exact values
    the reference's e2e suite asserts (wasm.rs:1184-1500)."""

    @pytest.fixture(scope="class")
    def module_bytes(self):
        with open(FIXTURE, "rb") as f:
            return f.read()

    def _fn(self, module_bytes, entry, ins, ret):
        from seafowl_spark.engine.wasm_abi import InterpExecutor

        return make_row_callable(InterpExecutor(module_bytes, entry), ins, ret)

    def test_add_integers(self, module_bytes):
        # wasm.rs:1184-1246 (add_i64/add_i32/add_i16 over (1,2)..(9,10))
        for entry, t in (("add_i64", "bigint"), ("add_i32", "int"), ("add_i16", "smallint")):
            f = self._fn(module_bytes, entry, [t, t], t)
            assert [f(a, a + 1) for a in (1, 3, 5, 7, 9)] == [3, 7, 11, 15, 19]

    def test_mul_floats(self, module_bytes):
        # wasm.rs:1249-1307: round(mul(v1,v2)) over the fixture pairs
        for entry, t in (("mul_f32", "real"), ("mul_f64", "double")):
            f = self._fn(module_bytes, entry, [t, t], t)
            got = [round(f(a, b)) for a, b in
                   ((0.5, 2.0), (3.5, 4.1), (5.4, 6.2), (7.0, 8.9), (9.1, 10.2))]
            assert got == [1, 14, 33, 62, 93]

    def test_timestamp_add_hours(self, module_bytes):
        # wasm.rs:1309-1355
        f = self._fn(module_bytes, "add_hours", ["timestamp", "int"], "timestamp")
        ts = dt.datetime(2022, 11, 22, 14, 38, 40, 543717)
        assert f(ts, 2) == dt.datetime(2022, 11, 22, 16, 38, 40, 543717)
        assert f(dt.datetime(1970, 1, 1), 6) == dt.datetime(1970, 1, 1, 6)

    def test_date_add_days(self, module_bytes):
        # wasm.rs:1357-1400
        f = self._fn(module_bytes, "add_days", ["date", "int"], "date")
        assert f(dt.date(1970, 1, 1), 2) == dt.date(1970, 1, 3)
        assert f(dt.date(2022, 11, 22), 0) == dt.date(2022, 11, 22)
        assert f(dt.date(2022, 11, 22), 1) == dt.date(2022, 11, 23)

    def test_bool_xor(self, module_bytes):
        # wasm.rs:1402-1450
        f = self._fn(module_bytes, "xor2", ["boolean", "boolean"], "boolean")
        assert [f(a, b) for a, b in ((True, True), (True, False), (False, True), (False, False))] \
            == [False, True, True, False]

    def test_increment_decimal(self, module_bytes):
        # wasm.rs:1452-1500
        f = self._fn(module_bytes, "increment_decimal", ["decimal(20,2)"], "decimal(20,2)")
        assert f(Decimal("0.01")) == Decimal("1.01")
        assert f(Decimal("16691927.02")) == Decimal("16691928.02")

    def test_text_funcs(self, module_bytes):
        assert self._fn(module_bytes, "concat2", ["text", "text"], "text")("ab", "cd") == "abcd"
        assert self._fn(module_bytes, "upper2", ["text"], "text")("hello") == "HELLO"
        assert self._fn(module_bytes, "lower2", ["text"], "text")("HeLLo") == "hello"

    def test_panic_surfaces_rust_message(self, module_bytes):
        # unreachable after the module writes its panic to WASI fd_write
        f = self._fn(module_bytes, "panic_if_negative", ["int"], "int")
        assert f(5) == 5
        with pytest.raises(WasmAbiError, match="disapprove of being negative"):
            f(-1)

    def test_garbage_output_decode_error(self, module_bytes):
        # reference surface: "Error messagepack decoding output buffer"
        # (context/mod.rs write_garbage_output e2e)
        f = self._fn(module_bytes, "write_garbage_output", ["int"], "int")
        with pytest.raises(WasmAbiError, match="decoding output buffer"):
            f(1)

    def test_executor_pickles_for_spark_workers(self, module_bytes):
        import pickle

        from seafowl_spark.engine.wasm_abi import InterpExecutor

        ex = InterpExecutor(module_bytes, "add_i64")
        assert ex.call([2, 3]) == 5
        ex2 = pickle.loads(pickle.dumps(ex))
        assert ex2.call([20, 22]) == 42

    def test_end_to_end_sql_legacy_raw(self, ctx):
        """The reference's raw-wasm e2e shape (wasm.rs:855-897 `sintau`):
        a REAL->REAL numeric export registered via CREATE FUNCTION with
        language='wasm' and called from SQL. The module here is
        hand-assembled (no wasm toolchain in this environment): f32
        doubling instead of sintau, same ABI."""
        import base64
        import json

        from test_wasm_interp import F32, build, functype

        mod = build(
            [functype([F32], [F32])],
            [(0, [], b"\x20\x00\x20\x00\x92")],  # local.get 0 twice; f32.add
            exports=[("dbl", 0, 0)],
        )
        spec = {
            "entrypoint": "dbl",
            "language": "wasm",
            "input_types": ["real"],
            "return_type": "real",
            "data": base64.b64encode(mod).decode(),
            "volatility": "immutable",
        }
        ctx.execute(f"CREATE FUNCTION raw_dbl AS '{json.dumps(spec)}'")
        df = ctx.execute(
            "SELECT ROUND(raw_dbl(CAST(v AS REAL)) * 1000) AS r "
            "FROM (VALUES (0.1), (1.2), (NULL)) AS t(v)"
        )
        got = sorted((r.r for r in df.collect()), key=lambda v: (v is None, v))
        assert got == [200.0, 2400.0, None]

    def test_end_to_end_sql(self, ctx, module_bytes):
        """CREATE FUNCTION with the real module, then call it from SQL —
        the reference's full e2e loop (context/mod.rs:295-468) minus
        wasmtime."""
        import base64
        import json

        spec = {
            "entrypoint": "add_i64",
            "language": "wasmMessagePack",
            "input_types": ["BIGINT", "BIGINT"],
            "return_type": "BIGINT",
            "data": base64.b64encode(module_bytes).decode(),
            "volatility": "immutable",
        }
        ctx.execute(f"CREATE FUNCTION wasm_add AS '{json.dumps(spec)}'")
        df = ctx.execute(
            "SELECT wasm_add(v1, v2) AS s FROM (VALUES (1, 2), (40, 2), (NULL, 9)) AS t(v1, v2)"
        )
        got = sorted((r.s for r in df.collect()), key=lambda v: (v is None, v))
        assert got == [3, 42, None]


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
