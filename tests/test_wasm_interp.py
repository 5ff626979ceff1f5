"""WASM interpreter unit tests over hand-assembled modules.

test_wasm_abi.py proves the interpreter against the reference's 230 KB
rustc fixture; these synthetic modules pin down individual semantics the
fixture exercises only incidentally (or not at all): branch-target
resolution for loops/br_table/nested ifs, call_indirect dispatch,
memory.grow, trap conditions, and the sign-extension / saturating
truncation extensions. Each module is assembled byte-by-byte per the
WebAssembly binary format spec.
"""

from __future__ import annotations

import struct

import pytest

from seafowl_spark.engine.wasm_interp import (
    Instance,
    WasmTrap,
    parse_module,
)


# ---------------------------------------------------------------------------
# minimal assembler
# ---------------------------------------------------------------------------

I32, I64, F32, F64 = 0x7F, 0x7E, 0x7D, 0x7C


def uleb(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def sleb(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        done = (v == 0 and not b & 0x40) or (v == -1 and b & 0x40)
        out.append(b if done else b | 0x80)
        if done:
            return bytes(out)


def section(sid: int, payload: bytes) -> bytes:
    return bytes([sid]) + uleb(len(payload)) + payload


def vec(items: list[bytes]) -> bytes:
    return uleb(len(items)) + b"".join(items)


def functype(params: list[int], results: list[int]) -> bytes:
    return b"\x60" + vec([bytes([p]) for p in params]) + vec(
        [bytes([r]) for r in results]
    )


def build(
    types: list[bytes],
    funcs: list[tuple[int, list[int], bytes]],  # (type idx, locals, body)
    exports: list[tuple[str, int, int]] | None = None,  # (name, kind, idx)
    memory_pages: int | None = None,
    table_elems: list[int] | None = None,
    globals_: list[tuple[int, int, bytes]] | None = None,  # (vt, mut, init)
    data: list[tuple[int, bytes]] | None = None,
) -> bytes:
    out = bytearray(b"\x00asm\x01\x00\x00\x00")
    out += section(1, vec(types))
    out += section(3, vec([uleb(t) for t, _l, _b in funcs]))
    if table_elems is not None:
        out += section(4, vec([b"\x70\x00" + uleb(len(table_elems))]))
    if memory_pages is not None:
        out += section(5, vec([b"\x00" + uleb(memory_pages)]))
    if globals_:
        out += section(
            6,
            vec([bytes([vt, mut]) + init + b"\x0b" for vt, mut, init in globals_]),
        )
    if exports:
        out += section(
            7,
            vec(
                [
                    uleb(len(n.encode())) + n.encode() + bytes([k]) + uleb(i)
                    for n, k, i in exports
                ]
            ),
        )
    if table_elems is not None:
        seg = b"\x00" + b"\x41\x00\x0b" + vec([uleb(i) for i in table_elems])
        out += section(9, vec([seg]))
    bodies = []
    for _t, locals_, body in funcs:
        loc = vec([uleb(1) + bytes([vt]) for vt in locals_])
        code = loc + body + b"\x0b"
        bodies.append(uleb(len(code)) + code)
    out += section(10, vec(bodies))
    if data:
        out += section(
            11,
            vec([b"\x00\x41" + sleb(off) + b"\x0b" + uleb(len(blob)) + blob
                 for off, blob in data]),
        )
    return bytes(out)


def _s(v: int) -> int:
    """Signed-i32 view — invoke() returns integers SIGNED at the embedder
    boundary (wasmtime-consistent) since r6."""
    v &= 0xFFFFFFFF
    return v - (1 << 32) if v >= 1 << 31 else v


def one_func(params, results, body, locals_=(), **kw):
    mod = build(
        [functype(params, results)],
        [(0, list(locals_), body)],
        exports=[("f", 0, 0)],
        **kw,
    )
    return Instance(parse_module(mod))


LOCAL_GET, LOCAL_SET, LOCAL_TEE = b"\x20", b"\x21", b"\x22"


def i32c(v: int) -> bytes:
    return b"\x41" + sleb(v)


def i64c(v: int) -> bytes:
    return b"\x42" + sleb(v)


class TestControlFlow:
    def test_loop_sum_one_to_n(self):
        # sum = 0; i = 0; loop { i += 1; sum += i; br_if (i < n) }
        body = (
            b"\x02\x40"  # block
            + b"\x03\x40"  # loop
            + LOCAL_GET + b"\x01" + i32c(1) + b"\x6a" + LOCAL_TEE + b"\x01"
            + LOCAL_GET + b"\x02" + b"\x6a" + LOCAL_SET + b"\x02"
            + LOCAL_GET + b"\x01" + LOCAL_GET + b"\x00" + b"\x48"  # i < n (s)
            + b"\x0d\x00"  # br_if 0 -> loop
            + b"\x0b\x0b"  # end loop, end block
            + LOCAL_GET + b"\x02"
        )
        inst = one_func([I32], [I32], body, locals_=[I32, I32])
        assert inst.invoke("f", 10) == 55
        assert inst.invoke("f", 1) == 1
        assert inst.invoke("f", 1000) == 500500

    def test_if_else_result(self):
        # if (x) { 10 } else { 20 } + 1
        body = (
            LOCAL_GET + b"\x00"
            + b"\x04\x7f" + i32c(10) + b"\x05" + i32c(20) + b"\x0b"
            + i32c(1) + b"\x6a"
        )
        inst = one_func([I32], [I32], body)
        assert inst.invoke("f", 1) == 11
        assert inst.invoke("f", 0) == 21

    def test_if_without_else_skipped(self):
        # r = 5; if (x) { r = 7 }; r
        body = (
            i32c(5) + LOCAL_SET + b"\x01"
            + LOCAL_GET + b"\x00"
            + b"\x04\x40" + i32c(7) + LOCAL_SET + b"\x01" + b"\x0b"
            + LOCAL_GET + b"\x01"
        )
        inst = one_func([I32], [I32], body, locals_=[I32])
        assert inst.invoke("f", 1) == 7
        assert inst.invoke("f", 0) == 5

    def test_nested_if_else_in_loop(self):
        # count = 0; for i in 1..=n: if i % 2 { count += i } else { count -= 1 }
        body = (
            b"\x02\x40"
            + b"\x03\x40"
            + LOCAL_GET + b"\x01" + i32c(1) + b"\x6a" + LOCAL_TEE + b"\x01"
            + i32c(2) + b"\x70"  # i rem_u 2
            + b"\x04\x40"
            + LOCAL_GET + b"\x02" + LOCAL_GET + b"\x01" + b"\x6a" + LOCAL_SET + b"\x02"
            + b"\x05"
            + LOCAL_GET + b"\x02" + i32c(1) + b"\x6b" + LOCAL_SET + b"\x02"
            + b"\x0b"
            + LOCAL_GET + b"\x01" + LOCAL_GET + b"\x00" + b"\x48"
            + b"\x0d\x00"
            + b"\x0b\x0b"
            + LOCAL_GET + b"\x02"
        )
        inst = one_func([I32], [I32], body, locals_=[I32, I32])
        # n=6: odds 1+3+5 = 9, three evens -> 9-3 = 6
        assert inst.invoke("f", 6) == 6

    def test_br_table_dispatch(self):
        # block block block (br_table [0 1] 2 on x) end 100 return end 200
        # return end 300
        body = (
            b"\x02\x40" * 3
            + LOCAL_GET + b"\x00"
            + b"\x0e\x02\x00\x01\x02"  # br_table [0,1] default 2
            + b"\x0b" + i32c(100) + b"\x0f"
            + b"\x0b" + i32c(200) + b"\x0f"
            + b"\x0b" + i32c(300)
        )
        inst = one_func([I32], [I32], body)
        assert inst.invoke("f", 0) == 100
        assert inst.invoke("f", 1) == 200
        assert inst.invoke("f", 2) == 300
        assert inst.invoke("f", 99) == 300

    def test_br_out_of_nested_blocks_unwinds_stack(self):
        # block(i32): push garbage then branch with a result value past it
        body = (
            b"\x02\x7f"  # block -> i32
            + i32c(111)  # value left for the branch
            + LOCAL_GET + b"\x00"
            + b"\x04\x40" + i32c(42) + b"\x0c\x01" + b"\x0b"  # br 1 with 42? no:
            # br 1 targets the block; branch value = top of stack = 42
            + b"\x1a"  # drop the 111 on the fallthrough path
            + i32c(7)
            + b"\x0b"
        )
        # x!=0: stack [111, 42] -> br block keeps 42, drops 111.
        # x==0: drop 111, push 7.
        inst = one_func([I32], [I32], body)
        assert inst.invoke("f", 1) == 42
        assert inst.invoke("f", 0) == 7

    def test_recursion_factorial(self):
        # f(n) = n <= 1 ? 1 : n * f(n-1)
        body = (
            LOCAL_GET + b"\x00" + i64c(1) + b"\x57"  # n <= 1 (s)
            + b"\x04\x7e"
            + i64c(1)
            + b"\x05"
            + LOCAL_GET + b"\x00"
            + LOCAL_GET + b"\x00" + i64c(1) + b"\x7d"
            + b"\x10\x00"  # call f
            + b"\x7e"
            + b"\x0b"
        )
        inst = one_func([I64], [I64], body)
        assert inst.invoke("f", 20) == 2432902008176640000

    def test_call_indirect(self):
        # table [f1=add, f2=mul]; dispatch by index
        t = functype([I32, I32], [I32])
        add = LOCAL_GET + b"\x00" + LOCAL_GET + b"\x01" + b"\x6a"
        mul = LOCAL_GET + b"\x00" + LOCAL_GET + b"\x01" + b"\x6c"
        disp = (
            LOCAL_GET + b"\x00" + LOCAL_GET + b"\x01" + LOCAL_GET + b"\x02"
            + b"\x11\x00\x00"  # call_indirect type 0, table 0
        )
        mod = build(
            [t, functype([I32, I32, I32], [I32])],
            [(0, [], add), (0, [], mul), (1, [], disp)],
            exports=[("dispatch", 0, 2)],
            table_elems=[0, 1],
        )
        inst = Instance(parse_module(mod))
        assert inst.invoke("dispatch", 6, 7, 0) == 13
        assert inst.invoke("dispatch", 6, 7, 1) == 42
        with pytest.raises(WasmTrap, match="table"):
            inst.invoke("dispatch", 6, 7, 9)


class TestMemoryAndGlobals:
    def test_load_store_roundtrip(self):
        # store x at 16, reload with offset addressing
        body = (
            i32c(16) + LOCAL_GET + b"\x00" + b"\x36\x02\x00"  # i32.store align=4
            + i32c(0) + b"\x28\x02\x10"  # i32.load offset=16
        )
        inst = one_func([I32], [I32], body, memory_pages=1)
        assert inst.invoke("f", 0xDEAD) == 0xDEAD

    def test_signed_narrow_loads(self):
        # store8 0xFF at 0; load8_s -> -1 (as u32: 0xFFFFFFFF), load8_u -> 255
        body = (
            i32c(0) + i32c(0xFF) + b"\x3a\x00\x00"  # i32.store8
            + i32c(0) + b"\x2c\x00\x00"  # i32.load8_s
            + i32c(0) + b"\x2d\x00\x00"  # i32.load8_u
            + b"\x6a"  # add: -1 + 255 = 254 (mod 2^32)
        )
        inst = one_func([], [I32], body, memory_pages=1)
        assert inst.invoke("f") == _s(0xFFFFFFFF + 255)

    def test_memory_grow_and_size(self):
        body = (
            b"\x3f\x00"  # memory.size -> 1
            + i32c(2) + b"\x40\x00"  # memory.grow 2 -> old size 1
            + b"\x6a"  # 1 + 1
            + b"\x3f\x00" + b"\x6a"  # + new size 3
        )
        inst = one_func([], [I32], body, memory_pages=1)
        assert inst.invoke("f") == 1 + 1 + 3

    def test_oob_load_traps(self):
        body = LOCAL_GET + b"\x00" + b"\x28\x02\x00"
        inst = one_func([I32], [I32], body, memory_pages=1)
        assert inst.invoke("f", 0) == 0
        with pytest.raises(WasmTrap, match="out-of-bounds"):
            inst.invoke("f", 65536)

    def test_data_segment_and_bulk_ops(self):
        # data "abcd" at 8; memory.copy to 100; memory.fill 200..204 with 'x'
        body = (
            i32c(100) + i32c(8) + i32c(4) + b"\xfc\x0a\x00\x00"  # memory.copy
            + i32c(200) + i32c(ord("x")) + i32c(4) + b"\xfc\x0b\x00"  # fill
            + i32c(100) + b"\x28\x02\x00"  # load copied word
        )
        inst = one_func(
            [], [I32], body, memory_pages=1, data=[(8, b"abcd")]
        )
        got = inst.invoke("f")
        assert got == struct.unpack("<I", b"abcd")[0]
        assert bytes(inst.memory[200:204]) == b"xxxx"

    def test_mutable_global_accumulates(self):
        # global g += x; return g — across invocations state persists
        body = (
            b"\x23\x00" + LOCAL_GET + b"\x00" + b"\x6a"
            + b"\x24\x00" + b"\x23\x00"
        )
        inst = one_func(
            [I32], [I32], body, globals_=[(I32, 1, i32c(5))]
        )
        assert inst.invoke("f", 1) == 6
        assert inst.invoke("f", 10) == 16


class TestNumericEdges:
    def test_i32_div_rem_signs_and_traps(self):
        # (a div_s b, via export): -7 / 2 = -3 (trunc), not -4 (floor)
        body = LOCAL_GET + b"\x00" + LOCAL_GET + b"\x01" + b"\x6d"
        inst = one_func([I32, I32], [I32], body)
        assert inst.invoke("f", (-7) & 0xFFFFFFFF, 2) == -3
        with pytest.raises(WasmTrap, match="divide by zero"):
            inst.invoke("f", 1, 0)
        with pytest.raises(WasmTrap, match="overflow"):
            inst.invoke("f", 0x80000000, 0xFFFFFFFF)  # INT_MIN / -1

    def test_i32_rem_sign_follows_dividend(self):
        body = LOCAL_GET + b"\x00" + LOCAL_GET + b"\x01" + b"\x6f"
        inst = one_func([I32, I32], [I32], body)
        assert inst.invoke("f", (-7) & 0xFFFFFFFF, 2) == -1

    def test_shift_counts_mask(self):
        # 1 << 33 on i32 == 1 << 1
        body = i32c(1) + LOCAL_GET + b"\x00" + b"\x74"
        inst = one_func([I32], [I32], body)
        assert inst.invoke("f", 33) == 2

    def test_clz_ctz_popcnt(self):
        body = (
            LOCAL_GET + b"\x00" + b"\x67"  # clz
            + LOCAL_GET + b"\x00" + b"\x68" + b"\x6a"  # + ctz
            + LOCAL_GET + b"\x00" + b"\x69" + b"\x6a"  # + popcnt
        )
        inst = one_func([I32], [I32], body)
        # 0x00F0: clz=24, ctz=4, popcnt=4
        assert inst.invoke("f", 0xF0) == 32
        # zero: clz=32, ctz=32, popcnt=0
        assert inst.invoke("f", 0) == 64

    def test_sign_extension_ops(self):
        # i32.extend8_s(0x80) = -128
        body = LOCAL_GET + b"\x00" + b"\xc0"
        inst = one_func([I32], [I32], body)
        assert inst.invoke("f", 0x80) == -128
        assert inst.invoke("f", 0x7F) == 0x7F

    def test_trunc_traps_vs_saturates(self):
        body_trap = LOCAL_GET + b"\x00" + b"\xa8"  # i32.trunc_f64_s
        inst = one_func([F64], [I32], body_trap)
        assert inst.invoke("f", 3.9) == 3
        assert inst.invoke("f", -3.9) == -3
        with pytest.raises(WasmTrap):
            inst.invoke("f", 1e30)
        body_sat = LOCAL_GET + b"\x00" + b"\xfc\x00"  # i32.trunc_sat_f64_s
        inst = one_func([F64], [I32], body_sat)
        assert inst.invoke("f", 1e30) == 0x7FFFFFFF
        assert inst.invoke("f", float("nan")) == 0

    def test_f64_bit_ops_and_nearest(self):
        # nearest: round-half-even
        body = LOCAL_GET + b"\x00" + b"\x9e"
        inst = one_func([F64], [F64], body)
        assert inst.invoke("f", 2.5) == 2.0
        assert inst.invoke("f", 3.5) == 4.0
        assert inst.invoke("f", -2.5) == -2.0

    def test_i64_mul_wraps(self):
        body = LOCAL_GET + b"\x00" + LOCAL_GET + b"\x00" + b"\x7e"
        inst = one_func([I64], [I64], body)
        v = (1 << 40) + 12345
        assert inst.invoke("f", v) == (v * v) & 0xFFFFFFFFFFFFFFFF

    def test_f32_arithmetic_rounds_through_binary32(self):
        # f32.add must round to binary32: 1e8 + 1 == 1e8 in f32
        body = LOCAL_GET + b"\x00" + LOCAL_GET + b"\x01" + b"\x92"
        inst = one_func([F32, F32], [F32], body)
        assert inst.invoke("f", 1e8, 1.0) == 1e8

    def test_select(self):
        body = (
            LOCAL_GET + b"\x00" + LOCAL_GET + b"\x01" + LOCAL_GET + b"\x02"
            + b"\x1b"
        )
        inst = one_func([I32, I32, I32], [I32], body)
        assert inst.invoke("f", 10, 20, 1) == 10
        assert inst.invoke("f", 10, 20, 0) == 20

    def test_unreachable_traps(self):
        inst = one_func([], [], b"\x00")
        with pytest.raises(WasmTrap, match="unreachable"):
            inst.invoke("f")
