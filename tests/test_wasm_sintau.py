"""Raw-wasm ABI against the reference's own e2e fixture shape.

The reference's flagship raw-ABI test (reference src/wasm_udf/wasm.rs:822-929
``test_wasm_math``) registers three f32->f32 exports — ``sintau`` (sin 2πx),
``exp2`` and ``log2`` — from ONE module that range-reduces with
floor/nearest, bit-twiddles the f32 exponent, and evaluates polynomial
coefficients held in a linear-memory data segment via a shared ``evalpoly``
loop, then asserts a fixed ``ROUND(f(v)*1000)`` table over five rows.

This file reproduces that module shape from scratch (assembled byte-by-byte
with tests/test_wasm_interp's spec assembler; our own least-squares
coefficient tables, NOT the reference's binary) and asserts the reference's
exact expected values — including the exponent-wraparound cells where
``exp2(1234.5)`` lands on a tiny NEGATIVE number that rounds to -0.0,
behavior that only falls out if the i32 shift/add wraparound and the f32
reinterpret semantics are right. The structural pieces newly covered vs
TestRawAbi's minimal modules: multiple exports sharing one module, an
internal (non-exported) helper called across functions, f32.load from an
active data segment, and loop/br_if control flow under the raw ABI.
"""

from __future__ import annotations

import base64
import json
import math
import struct

import pytest
from test_wasm_interp import F32, I32, build, functype, sleb

from seafowl_spark.engine.wasm_abi import RawInterpExecutor

# ---------------------------------------------------------------------------
# module assembly
# ---------------------------------------------------------------------------

# our own fits (f32-exact literals; float64 lstsq then cast): highest-degree
# first, the order the Horner loop consumes
SIN = [-12.371288299560547, 41.26920700073242, -76.59477233886719,
       81.59764099121094, -41.34148025512695, 6.283183574676514]
EXP = [0.0018753724871203303, 0.008987298235297203, 0.05583589896559715,
       0.24014653265476227, 0.6931547522544861, 0.9999998211860657]
LOG = [0.01460745744407177, -0.07595199346542358, 0.1886964589357376,
       -0.32151493430137634, 0.47173401713371277, -0.7202051281929016,
       1.442633867263794, 8.05201523235155e-07]

SIN_OFF = 0
EXP_OFF = SIN_OFF + 4 * len(SIN)
LOG_OFF = EXP_OFF + 4 * len(EXP)
LOG_END = LOG_OFF + 4 * len(LOG)

COEF_BLOB = b"".join(
    struct.pack("<f", c) for table in (SIN, EXP, LOG) for c in table
)


def _i32c(v: int) -> bytes:
    return b"\x41" + sleb(v)


def _call_evalpoly(start: int, end: int) -> bytes:
    return _i32c(start) + _i32c(end) + b"\x10\x03"  # call func 3


# sintau(x): t = x - nearest(x); t * P(t*t)
BODY_SINTAU = (
    b"\x20\x00"              # local.get x
    b"\x20\x00\x90"          # f32.nearest(x)
    b"\x93"                  # f32.sub -> t
    b"\x21\x01"              # local.set t
    b"\x20\x01"              # local.get t
    b"\x20\x01\x20\x01\x94"  # t*t
    + _call_evalpoly(SIN_OFF, EXP_OFF)
    + b"\x94"                # t * P(t^2)
)

# exp2(x): f = x - floor(x); reinterpret(P(f)) + (trunc(floor(x)) << 23)
BODY_EXP2 = (
    b"\x20\x00"              # local.get x
    b"\x20\x00\x8e"          # f32.floor(x)
    b"\x22\x01"              # local.tee fl
    b"\x93"                  # f32.sub -> f
    + _call_evalpoly(EXP_OFF, LOG_OFF)
    + b"\xbc"                # i32.reinterpret_f32
    b"\x20\x01\xa8"          # i32.trunc_f32_s(fl)
    + _i32c(23) + b"\x74"    # << 23 (wraps — the -0.0 overflow cells)
    + b"\x6a"                # i32.add
    b"\xbe"                  # f32.reinterpret_i32
)

# log2(x): e = (bits>>23)-127; u = (bits<<9)/2^32; e + R(u)
BODY_LOG2 = (
    b"\x20\x00\xbc"          # i32.reinterpret_f32(x)
    b"\x22\x01"              # local.tee bits
    + _i32c(23) + b"\x76"    # >>u 23
    + _i32c(127) + b"\x6b"   # -127
    + b"\xb2"                # f32.convert_i32_s -> e
    b"\x20\x01"              # local.get bits
    + _i32c(9) + b"\x74"     # << 9
    + b"\xb3"                # f32.convert_i32_u
    + b"\x43\x00\x00\x80\x4f"  # f32.const 4294967296.0
    + b"\x95"                # f32.div -> u
    + _call_evalpoly(LOG_OFF, LOG_END)
    + b"\x92"                # e + R(u)
)

# evalpoly(x, start, end): Horner loop over f32 coefficients in memory
BODY_EVALPOLY = (
    b"\x03\x40"              # loop (void)
    b"\x20\x03"              #   local.get acc
    b"\x20\x00\x94"          #   * x
    b"\x20\x01\x2a\x02\x00"  #   f32.load mem[i]
    b"\x92"                  #   +
    b"\x21\x03"              #   local.set acc
    b"\x20\x01" + _i32c(4) + b"\x6a"  # i = i + 4
    b"\x22\x01"              #   local.tee i
    b"\x20\x02\x47"          #   i32.ne end
    b"\x0d\x00"              #   br_if loop
    b"\x0b"                  # end
    b"\x20\x03"              # local.get acc
)


def sintau_module() -> bytes:
    return build(
        [functype([F32], [F32]), functype([F32, I32, I32], [F32])],
        [
            (0, [F32], BODY_SINTAU),
            (0, [F32], BODY_EXP2),
            (0, [I32], BODY_LOG2),
            (1, [F32], BODY_EVALPOLY),
        ],
        exports=[("sintau", 0, 0), ("exp2", 0, 1), ("log2", 0, 2)],
        memory_pages=1,
        data=[(0, COEF_BLOB)],
    )


# the reference test's inputs and expected ROUND(f(v)*1000) values
VALUES = [(0.1, 0.2), (1.2, 2.3), (3.3, 4.3), (5.4, 2.5), (1234.5, 678.8)]
EXPECTED = [
    # sv1,   sv2,    ev1,     ev2,     lv1,     lv2
    (588.0, 951.0, 1072.0, 1149.0, -3322.0, -2322.0),
    (951.0, 951.0, 2297.0, 4925.0, 263.0, 1202.0),
    (951.0, 951.0, 9849.0, 19698.0, 1722.0, 2104.0),
    (588.0, 0.0, 42224.0, 5657.0, 2433.0, 1322.0),
    (0.0, -951.0, -0.0, -0.0, 10270.0, 9407.0),
]


class TestSintauExecutors:
    @pytest.fixture(scope="class")
    def mod(self):
        return sintau_module()

    def test_per_value_math(self, mod):
        sintau = RawInterpExecutor(mod, "sintau")
        exp2 = RawInterpExecutor(mod, "exp2")
        log2 = RawInterpExecutor(mod, "log2")
        for x in (0.1, 0.2, 1.2, 2.3, 3.3, 4.3, 5.4):
            assert sintau.call_raw([x]) == pytest.approx(
                math.sin(2 * math.pi * x), abs=3e-4
            )
            assert exp2.call_raw([x]) == pytest.approx(2.0 ** x, rel=3e-6)
            assert log2.call_raw([x]) == pytest.approx(
                math.log2(x), abs=3e-5
            )

    def test_exp2_overflow_wraps_to_tiny_negative(self, mod):
        """The reference table's -0.0 cells: 2^1234.5 lands on a tiny
        NEGATIVE float because (1234+127)<<23 wraps into the sign bit."""
        exp2 = RawInterpExecutor(mod, "exp2")
        for x in (1234.5, 678.8):
            v = exp2.call_raw([x])
            assert v < 0 and abs(v) < 1e-10, (x, v)

    def test_shared_evalpoly_not_exported(self, mod):
        from seafowl_spark.engine.wasm_abi import WasmAbiError

        with pytest.raises(WasmAbiError, match="evalpoly"):
            RawInterpExecutor(mod, "evalpoly")


class TestSintauEndToEndSql:
    def test_reference_expected_table(self, ctx):
        """The full wasm.rs:892-929 query, all 30 cells value-compared."""
        mod = sintau_module()
        for name in ("sintau", "exp2", "log2"):
            spec = {
                "entrypoint": name,
                "language": "wasm",
                "input_types": ["real"],
                "return_type": "real",
                "data": base64.b64encode(mod).decode(),
                "volatility": "immutable",
            }
            ctx.execute(f"CREATE FUNCTION {name} AS '{json.dumps(spec)}'")
        values_sql = ", ".join(f"({v1}, {v2})" for v1, v2 in VALUES)
        df = ctx.execute(
            "SELECT ROUND(sintau(v1) * 1000) AS sv1,"
            "       ROUND(sintau(v2) * 1000) AS sv2,"
            "       ROUND(exp2(v1) * 1000) AS ev1,"
            "       ROUND(exp2(v2) * 1000) AS ev2,"
            "       ROUND(log2(v1) * 1000) AS lv1,"
            "       ROUND(log2(v2) * 1000) AS lv2 "
            "FROM (SELECT CAST(v1 AS REAL) AS v1, CAST(v2 AS REAL) AS v2 "
            f"      FROM (VALUES {values_sql}) AS t(v1, v2))"
        )
        got = [
            (r.sv1, r.sv2, r.ev1, r.ev2, r.lv1, r.lv2) for r in df.collect()
        ]
        # VALUES order is preserved through the projection (no shuffle),
        # but sort both sides anyway so the comparison is order-free
        assert sorted(got) == sorted(EXPECTED)
        # the overflow cells are tiny NEGATIVES (the reference table's -0.0;
        # Spark's ROUND normalizes -0.0 to 0.0, so probe the raw UDF value)
        raw = ctx.execute(
            "SELECT exp2(CAST(1234.5 AS REAL)) AS a,"
            "       exp2(CAST(678.8 AS REAL)) AS b"
        ).collect()[0]
        assert raw.a < 0 and abs(raw.a) < 1e-10
        assert raw.b < 0 and abs(raw.b) < 1e-10
