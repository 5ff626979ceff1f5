"""Pure-Python WebAssembly interpreter for WASM UDF execution.

The reference executes `wasmMessagePack` UDF modules through wasmtime
(src/wasm_udf/wasm.rs:92-175). wasmtime is not installable in this
environment, so this module interprets the bytecode directly: a
WebAssembly MVP core interpreter plus the extensions rustc emits for
`wasm32-wasi` output (sign-extension ops, saturating truncations,
bulk-memory `memory.copy`/`memory.fill`), and stubs for the
`wasi_snapshot_preview1` imports such modules declare (`fd_write`,
`environ_*`, `proc_exit`).

Scope: enough of the spec to run real UDF modules (verified against the
reference's own test fixture, resources/test/messagepack_rust.wasm —
230 KB of rustc output). Not implemented: SIMD, threads, reference
types, exceptions; hitting one raises a clear error rather than
miscomputing. Performance is test-grade (per-row interpretation in
Python); production deployments install wasmtime, which the UDF layer
prefers automatically (wasm_abi.WasmtimeExecutor).
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field


class WasmError(Exception):
    """Malformed or unsupported module."""


class WasmTrap(Exception):
    """Runtime trap (unreachable, div-by-zero, OOB access, proc_exit)."""


# ---------------------------------------------------------------------------
# binary reader
# ---------------------------------------------------------------------------

PAGE = 65536
MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF


class _Reader:
    __slots__ = ("data", "p")

    def __init__(self, data: bytes, p: int = 0):
        self.data = data
        self.p = p

    def u8(self) -> int:
        b = self.data[self.p]
        self.p += 1
        return b

    def uleb(self) -> int:
        r = s = 0
        while True:
            b = self.data[self.p]
            self.p += 1
            r |= (b & 0x7F) << s
            s += 7
            if not b & 0x80:
                return r

    def sleb(self) -> int:
        r = s = 0
        while True:
            b = self.data[self.p]
            self.p += 1
            r |= (b & 0x7F) << s
            s += 7
            if not b & 0x80:
                if b & 0x40:
                    r -= 1 << s
                return r

    def f32(self) -> float:
        (v,) = struct.unpack_from("<f", self.data, self.p)
        self.p += 4
        return v

    def f64(self) -> float:
        (v,) = struct.unpack_from("<d", self.data, self.p)
        self.p += 8
        return v

    def bytes_(self, n: int) -> bytes:
        v = self.data[self.p : self.p + n]
        self.p += n
        return v

    def name(self) -> str:
        return self.bytes_(self.uleb()).decode("utf-8")


# ---------------------------------------------------------------------------
# module structures
# ---------------------------------------------------------------------------


@dataclass
class FuncType:
    params: tuple
    results: tuple


@dataclass
class Function:
    type_idx: int
    locals: list  # list of valtype bytes, one per local (params excluded)
    code: list  # predecoded [(op, a, b), ...]


@dataclass
class Module:
    types: list[FuncType] = field(default_factory=list)
    imports: list = field(default_factory=list)  # (mod, name, kind, desc)
    funcs: list[Function] = field(default_factory=list)  # defined functions
    n_imported_funcs: int = 0
    tables: list = field(default_factory=list)
    mem_limits: tuple = (1, None)
    globals_init: list = field(default_factory=list)  # (valtype, mut, expr)
    exports: dict = field(default_factory=dict)  # name -> (kind, idx)
    elems: list = field(default_factory=list)  # (offset_expr, [func idx])
    datas: list = field(default_factory=list)  # (offset_expr|None, bytes)
    start: int | None = None


# control opcodes get their branch targets resolved at decode time:
#   block  -> (OP_BLOCK, (param_arity, result_arity), end_pc)
#   loop   -> (OP_LOOP, param_arity, start_pc)
#   if     -> (OP_IF, (param_arity, result_arity), (else_pc_or_end, end_pc))
#   else   -> (OP_ELSE, end_pc, None)  # jump-to-end for the true arm
#   br/br_if -> (op, depth, None); br_table -> (op, [depths], default)
OP_BLOCK, OP_LOOP, OP_IF, OP_ELSE, OP_END = 0x02, 0x03, 0x04, 0x05, 0x0B


def _decode_body(r: _Reader, module: Module, end_at: int) -> list:
    """Flatten one function body into [(op, a, b)] with branch targets
    resolved to instruction indices."""
    code: list = []
    # stack of (kind, code_idx, [patch sites])
    ctrl: list = []

    def block_arity(bt: int) -> tuple[int, int]:
        """(param_arity, result_arity) of a blocktype."""
        if bt == -0x40 or bt == 0x40:  # empty
            return 0, 0
        if bt < 0:  # single valtype encoded as negative sleb
            return 0, 1
        ft = module.types[bt]
        return len(ft.params), len(ft.results)

    while r.p < end_at:
        op = r.u8()
        if op in (0x02, 0x03, 0x04):  # block/loop/if
            # blocktype: sleb33 (negative = valtype/empty, >=0 = type idx)
            bt = r.sleb()
            pa, ra = block_arity(bt)
            idx = len(code)
            if op == 0x03:
                code.append((OP_LOOP, pa, idx))  # br target = self
            elif op == 0x02:
                code.append([OP_BLOCK, (pa, ra), None])  # end patched later
            else:
                cond_site = [OP_IF, (pa, ra), None]  # targets patched at end
                code.append(cond_site)
            ctrl.append((op, idx))
        elif op == 0x05:  # else
            kind, idx = ctrl[-1]
            if kind != 0x04:
                raise WasmError("else outside if")
            else_marker = len(code)
            code.append([OP_ELSE, None, None])
            # record the else marker's index for the if's fixup
            code[idx].append(else_marker)
            ctrl[-1] = (0x45AA, idx)  # mark as if-with-else
        elif op == 0x0B:  # end
            if not ctrl:  # function end
                code.append((OP_END, None, None))
                break
            kind, idx = ctrl.pop()
            end_pc = len(code)
            code.append((OP_END, None, None))
            entry = code[idx]
            if kind == 0x02:  # block: patch end
                entry[2] = end_pc
                code[idx] = tuple(entry)
            elif kind == 0x04:  # if without else: false -> past end
                entry[2] = (end_pc + 1, end_pc)
                code[idx] = tuple(entry)
            elif kind == 0x45AA:  # if with else
                else_start = entry.pop()  # stashed
                entry[2] = (else_start + 1, end_pc)
                code[idx] = tuple(entry)
                # the else marker jumps the true arm to the end instr
                code[else_start] = (OP_ELSE, end_pc, None)
            # loop entries need no patching
        elif op in (0x0C, 0x0D):  # br / br_if
            code.append((op, r.uleb(), None))
        elif op == 0x0E:  # br_table
            n = r.uleb()
            labels = [r.uleb() for _ in range(n)]
            code.append((op, labels, r.uleb()))
        elif op == 0x0F:  # return
            code.append((op, None, None))
        elif op == 0x10:  # call
            code.append((op, r.uleb(), None))
        elif op == 0x11:  # call_indirect
            code.append((op, r.uleb(), r.uleb()))  # type idx, table idx
        elif op in (0x00, 0x01, 0x1A, 0x1B):  # unreachable/nop/drop/select
            code.append((op, None, None))
        elif op == 0x1C:  # select with valtype annotation
            n = r.uleb()
            r.bytes_(n)
            code.append((0x1B, None, None))
        elif op in (0x20, 0x21, 0x22, 0x23, 0x24, 0x25, 0x26):
            code.append((op, r.uleb(), None))
        elif 0x28 <= op <= 0x3E:  # loads/stores: align + offset
            r.uleb()
            code.append((op, r.uleb(), None))
        elif op in (0x3F, 0x40):  # memory.size/grow
            r.u8()  # reserved memidx
            code.append((op, None, None))
        elif op == 0x41:
            code.append((op, r.sleb() & MASK32, None))
        elif op == 0x42:
            code.append((op, r.sleb() & MASK64, None))
        elif op == 0x43:
            code.append((op, r.f32(), None))
        elif op == 0x44:
            code.append((op, r.f64(), None))
        elif 0x45 <= op <= 0xC4:  # plain numeric ops, no immediates
            code.append((op, None, None))
        elif op == 0xD0:  # ref.null
            r.u8()
            code.append((op, None, None))
        elif op == 0xD2:  # ref.func
            code.append((op, r.uleb(), None))
        elif op == 0xFC:
            sub = r.uleb()
            if sub <= 7:  # trunc_sat family
                code.append((0xFC00 + sub, None, None))
            elif sub == 8:  # memory.init
                a = r.uleb()
                r.u8()
                code.append((0xFC08, a, None))
            elif sub == 9:  # data.drop
                code.append((0xFC09, r.uleb(), None))
            elif sub == 10:  # memory.copy
                r.u8()
                r.u8()
                code.append((0xFC0A, None, None))
            elif sub == 11:  # memory.fill
                r.u8()
                code.append((0xFC0B, None, None))
            else:
                raise WasmError(f"unsupported 0xFC sub-opcode {sub}")
        else:
            raise WasmError(f"unsupported opcode 0x{op:02X}")
    return code


def _const_expr(r: _Reader) -> tuple:
    """Parse an init expression; returns ('const', v) or ('global', idx)."""
    op = r.u8()
    if op == 0x41:
        v: object = r.sleb() & MASK32
    elif op == 0x42:
        v = r.sleb() & MASK64
    elif op == 0x43:
        v = r.f32()
    elif op == 0x44:
        v = r.f64()
    elif op == 0x23:
        idx = r.uleb()
        if r.u8() != 0x0B:
            raise WasmError("bad init expr")
        return ("global", idx)
    elif op == 0xD0:  # ref.null
        r.u8()
        v = None
    elif op == 0xD2:  # ref.func
        v = r.uleb()
    else:
        raise WasmError(f"unsupported init expr opcode 0x{op:02X}")
    if r.u8() != 0x0B:
        raise WasmError("bad init expr")
    return ("const", v)


def parse_module(data: bytes) -> Module:
    if data[:4] != b"\x00asm" or data[4:8] != b"\x01\x00\x00\x00":
        raise WasmError("not a wasm v1 module")
    m = Module()
    r = _Reader(data, 8)
    func_type_idxs: list[int] = []
    while r.p < len(data):
        sid = r.u8()
        size = r.uleb()
        end = r.p + size
        if sid == 1:  # types
            for _ in range(r.uleb()):
                if r.u8() != 0x60:
                    raise WasmError("non-func type")
                params = tuple(r.u8() for _ in range(r.uleb()))
                results = tuple(r.u8() for _ in range(r.uleb()))
                m.types.append(FuncType(params, results))
        elif sid == 2:  # imports
            for _ in range(r.uleb()):
                mod, name = r.name(), r.name()
                kind = r.u8()
                if kind == 0:
                    desc: object = r.uleb()
                    m.n_imported_funcs += 1
                elif kind == 1:
                    r.u8()
                    desc = _limits(r)
                elif kind == 2:
                    desc = _limits(r)
                elif kind == 3:
                    desc = (r.u8(), r.u8())
                else:
                    raise WasmError(f"bad import kind {kind}")
                m.imports.append((mod, name, kind, desc))
        elif sid == 3:  # function decls
            func_type_idxs = [r.uleb() for _ in range(r.uleb())]
        elif sid == 4:  # tables
            for _ in range(r.uleb()):
                r.u8()  # reftype
                m.tables.append(_limits(r))
        elif sid == 5:  # memories
            n = r.uleb()
            if n:
                m.mem_limits = _limits(r)
                for _ in range(n - 1):
                    _limits(r)
        elif sid == 6:  # globals
            for _ in range(r.uleb()):
                vt = r.u8()
                mut = r.u8()
                m.globals_init.append((vt, mut, _const_expr(r)))
        elif sid == 7:  # exports
            for _ in range(r.uleb()):
                name = r.name()
                kind = r.u8()
                m.exports[name] = (kind, r.uleb())
        elif sid == 8:
            m.start = r.uleb()
        elif sid == 9:  # element segments
            for _ in range(r.uleb()):
                flags = r.uleb()
                if flags == 0:
                    off = _const_expr(r)
                    idxs = [r.uleb() for _ in range(r.uleb())]
                    m.elems.append((off, idxs))
                elif flags == 2:
                    r.uleb()  # table idx
                    off = _const_expr(r)
                    if r.u8() != 0:
                        raise WasmError("bad elemkind")
                    idxs = [r.uleb() for _ in range(r.uleb())]
                    m.elems.append((off, idxs))
                else:
                    raise WasmError(f"unsupported elem flags {flags}")
        elif sid == 10:  # code
            n = r.uleb()
            for i in range(n):
                body_size = r.uleb()
                body_end = r.p + body_size
                locals_: list = []
                for _ in range(r.uleb()):
                    cnt = r.uleb()
                    vt = r.u8()
                    locals_.extend([vt] * cnt)
                code = _decode_body(r, m, body_end)
                r.p = body_end
                m.funcs.append(Function(func_type_idxs[i], locals_, code))
        elif sid == 11:  # data segments
            for _ in range(r.uleb()):
                flags = r.uleb()
                if flags == 0:
                    off = _const_expr(r)
                    m.datas.append((off, r.bytes_(r.uleb())))
                elif flags == 1:  # passive
                    m.datas.append((None, r.bytes_(r.uleb())))
                elif flags == 2:
                    r.uleb()
                    off = _const_expr(r)
                    m.datas.append((off, r.bytes_(r.uleb())))
                else:
                    raise WasmError(f"bad data flags {flags}")
        # sid 0 (custom) and 12 (datacount): skip
        r.p = end
    return m


def _limits(r: _Reader) -> tuple:
    flags = r.u8()
    lo = r.uleb()
    hi = r.uleb() if flags & 1 else None
    return (lo, hi)


# ---------------------------------------------------------------------------
# numeric helpers
# ---------------------------------------------------------------------------


def _s32(v: int) -> int:
    return v - (1 << 32) if v & 0x80000000 else v


def _s64(v: int) -> int:
    return v - (1 << 64) if v & 0x8000000000000000 else v


def _f32(v: float) -> float:
    """Round a Python float through binary32."""
    return struct.unpack("<f", struct.pack("<f", v))[0]


def _idiv(a: int, b: int) -> int:
    """Truncating signed division (Python // floors)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _irem(a: int, b: int) -> int:
    return a - _idiv(a, b) * b


def _trunc(
    v: float, lo: int, hi: int, mask: int, sat: bool
) -> int:
    if math.isnan(v):
        if sat:
            return 0
        raise WasmTrap("invalid conversion to integer: NaN")
    t = math.trunc(v)
    if t < lo or t > hi:
        if sat:
            t = lo if t < lo else hi
        else:
            raise WasmTrap(f"integer overflow in trunc: {v}")
    return t & mask


def _nearest(v: float) -> float:
    if math.isnan(v) or math.isinf(v):
        return v
    r = round(v)  # Python: round-half-even, same as wasm
    if r == 0 and math.copysign(1.0, v) < 0:
        return -0.0
    return float(r)


def _fmin(a: float, b: float) -> float:
    if math.isnan(a) or math.isnan(b):
        return math.nan
    if a == 0.0 and b == 0.0:
        # min(-0, +0) = -0
        return a if math.copysign(1.0, a) < 0 else b
    return min(a, b)


def _fmax(a: float, b: float) -> float:
    if math.isnan(a) or math.isnan(b):
        return math.nan
    if a == 0.0 and b == 0.0:
        return a if math.copysign(1.0, a) > 0 else b
    return max(a, b)


def _rotl32(v: int, n: int) -> int:
    n &= 31
    return ((v << n) | (v >> (32 - n))) & MASK32 if n else v


def _rotr32(v: int, n: int) -> int:
    n &= 31
    return ((v >> n) | (v << (32 - n))) & MASK32 if n else v


def _rotl64(v: int, n: int) -> int:
    n &= 63
    return ((v << n) | (v >> (64 - n))) & MASK64 if n else v


def _rotr64(v: int, n: int) -> int:
    n &= 63
    return ((v >> n) | (v << (64 - n))) & MASK64 if n else v


# ---------------------------------------------------------------------------
# instance
# ---------------------------------------------------------------------------


class Instance:
    """An instantiated module: memory, globals, tables, callable exports.

    ``imports`` maps "module.name" to Python callables taking/returning
    masked ints. WASI preview1 stubs install automatically for the
    imports rustc's wasm32-wasi output declares.
    """

    def __init__(self, module: Module, imports: dict | None = None):
        self.m = module
        lo, _hi = module.mem_limits
        self.memory = bytearray(lo * PAGE)
        self.mem_pages = lo
        self.globals: list = []
        for vt, _mut, init in module.globals_init:
            kind, v = init
            self.globals.append(self.globals[v] if kind == "global" else v)
        # tables (funcref)
        self.tables = [[None] * lo for (lo, _h) in module.tables] or [[None]]
        for off_expr, idxs in module.elems:
            base = self._eval_init(off_expr)
            table = self.tables[0]
            need = base + len(idxs)
            if need > len(table):
                table.extend([None] * (need - len(table)))
            for i, fi in enumerate(idxs):
                table[base + i] = fi
        # data segments
        self.passive_data: dict[int, bytes] = {}
        for i, (off_expr, blob) in enumerate(module.datas):
            if off_expr is None:
                self.passive_data[i] = blob
                continue
            base = self._eval_init(off_expr)
            if base + len(blob) > len(self.memory):
                raise WasmTrap("data segment out of bounds")
            self.memory[base : base + len(blob)] = blob
        # imported functions, in import order
        self.import_funcs: list = []
        imports = dict(imports or {})
        self.wasi_stderr = bytearray()  # captured fd_write payloads
        for mod, name, kind, _desc in module.imports:
            if kind != 0:
                continue
            key = f"{mod}.{name}"
            fn = imports.get(key)
            if fn is None and mod == "wasi_snapshot_preview1":
                fn = self._wasi_stub(name)
            if fn is None:
                raise WasmError(f"unresolved import {key}")
            self.import_funcs.append(fn)
        if module.start is not None:
            self._call_function(module.start, [])

    # ------------------------------------------------------------- helpers

    def _eval_init(self, expr: tuple) -> int:
        kind, v = expr
        return self.globals[v] if kind == "global" else v

    def _wasi_stub(self, name: str):
        if name == "fd_write":

            def fd_write(fd, iovs, iovs_len, nwritten_ptr):
                total = 0
                for i in range(iovs_len):
                    (ptr,) = struct.unpack_from(
                        "<I", self.memory, iovs + 8 * i
                    )
                    (ln,) = struct.unpack_from(
                        "<I", self.memory, iovs + 8 * i + 4
                    )
                    self.wasi_stderr += self.memory[ptr : ptr + ln]
                    total += ln
                struct.pack_into("<I", self.memory, nwritten_ptr, total)
                return 0

            return fd_write
        if name == "environ_sizes_get":

            def environ_sizes_get(count_ptr, size_ptr):
                struct.pack_into("<I", self.memory, count_ptr, 0)
                struct.pack_into("<I", self.memory, size_ptr, 0)
                return 0

            return environ_sizes_get
        if name == "environ_get":
            return lambda environ, buf: 0
        if name == "proc_exit":

            def proc_exit(code):
                msg = self.wasi_stderr.decode("utf-8", "replace").strip()
                raise WasmTrap(
                    f"proc_exit({code})" + (f": {msg}" if msg else "")
                )

            return proc_exit
        if name == "random_get":

            def random_get(ptr, ln):
                self.memory[ptr : ptr + ln] = b"\x04" * ln  # deterministic
                return 0

            return random_get
        if name in ("clock_time_get",):

            def clock_time_get(clock_id, precision, out_ptr):
                struct.pack_into("<Q", self.memory, out_ptr, 0)
                return 0

            return clock_time_get
        if name == "sched_yield":
            return lambda: 0
        return None

    # ------------------------------------------------------------- calling

    def invoke(self, export: str, *args):
        ent = self.m.exports.get(export)
        if ent is None or ent[0] != 0:
            raise WasmError(
                f"function export {export!r} not found in WASM module"
            )
        fidx = ent[1]
        out = self._call_function(fidx, list(args))
        if fidx < self.m.n_imported_funcs:
            # re-exported host import: the host callable already returns
            # Python values in its own convention
            return out
        # Embedder boundary: integer results surface SIGNED, matching
        # wasmtime (internally values stay mod-2^n; only the public
        # return is normalized — a cipher block with the top bit set must
        # come back as the negative i64 the raw ABI's BIGINT expects).
        f = self.m.funcs[fidx - self.m.n_imported_funcs]
        results = self.m.types[f.type_idx].results
        if not results:
            return out
        vals = list(out) if isinstance(out, tuple) else [out]
        for i, vt in enumerate(results):
            if vt == 0x7F:
                vals[i] = _s32(int(vals[i]))
            elif vt == 0x7E:
                vals[i] = _s64(int(vals[i]))
        return tuple(vals) if isinstance(out, tuple) else vals[0]

    def _call_function(self, fidx: int, args: list):
        n_imp = self.m.n_imported_funcs
        if fidx < n_imp:
            return self.import_funcs[fidx](*args)
        f = self.m.funcs[fidx - n_imp]
        ft = self.m.types[f.type_idx]
        locals_ = list(args)
        for vt in f.locals:
            locals_.append(0 if vt in (0x7F, 0x7E) else 0.0)
        results = self._exec(f.code, locals_, len(ft.results))
        if not ft.results:
            return None
        return results[0] if len(ft.results) == 1 else tuple(results)

    # ---------------------------------------------------------- interpreter

    def _mem_check(self, addr: int, n: int) -> None:
        if addr < 0 or addr + n > len(self.memory):
            raise WasmTrap(f"out-of-bounds memory access at {addr}")

    def _exec(self, code: list, loc: list, ret_arity: int) -> list:  # noqa: C901
        st: list = []  # value stack
        # control frames: (is_loop, arity, stack_height, cont_pc)
        frames: list = []
        mem = self.memory
        pc = 0
        n_code = len(code)
        while pc < n_code:
            op, a, b = code[pc]
            pc += 1
            if op == 0x20:  # local.get
                st.append(loc[a])
            elif op == 0x21:  # local.set
                loc[a] = st.pop()
            elif op == 0x22:  # local.tee
                loc[a] = st[-1]
            elif op == 0x41 or op == 0x42 or op == 0x43 or op == 0x44:
                st.append(a)
            elif op == OP_BLOCK:
                pa, ra = a
                frames.append((False, ra, len(st) - pa, b))
            elif op == OP_LOOP:
                # loop branch arity = param arity; height excludes params so
                # a br re-enters with exactly the loop's entry stack shape
                frames.append((True, a, len(st) - a, b))
            elif op == OP_IF:
                c = st.pop()
                pa, ra = a
                else_pc, end_pc = b
                frames.append((False, ra, len(st) - pa, end_pc))
                if not c:
                    pc = else_pc
                    if else_pc == end_pc + 1:  # no else arm: frame unwinds
                        frames.pop()
            elif op == OP_ELSE:
                pc = a  # true arm finished: jump to the end instruction
            elif op == OP_END:
                if frames:
                    frames.pop()
            elif op == 0x0C or op == 0x0D or op == 0x0E:  # br / br_if / table
                if op == 0x0D:
                    if not st.pop():
                        continue
                    depth = a
                elif op == 0x0E:
                    i = st.pop()
                    depth = a[i] if i < len(a) else b
                else:
                    depth = a
                if depth >= len(frames):  # branch out of the function body
                    return st[len(st) - ret_arity :] if ret_arity else []
                is_loop, arity, height, cont = frames[-1 - depth]
                vals = st[len(st) - arity :] if arity else []
                del st[height:]
                st.extend(vals)
                # pop through the target frame; a loop target re-pushes its
                # frame when the header instruction at cont re-executes
                del frames[len(frames) - depth - 1 :]
                if is_loop:
                    pc = cont  # re-enters the loop header instruction
                else:
                    pc = cont + 1  # past the block's end
            elif op == 0x0F:  # return
                return st[len(st) - ret_arity :] if ret_arity else []
            elif op == 0x10:  # call
                self._do_call(a, st)
            elif op == 0x11:  # call_indirect
                i = st.pop()
                table = self.tables[b]
                if i >= len(table) or table[i] is None:
                    raise WasmTrap("undefined table element")
                self._do_call(table[i], st)
            elif op == 0x00:
                msg = self.wasi_stderr.decode("utf-8", "replace").strip()
                raise WasmTrap("unreachable" + (f": {msg}" if msg else ""))
            elif op == 0x01:
                pass
            elif op == 0x1A:
                st.pop()
            elif op == 0x1B:  # select
                c = st.pop()
                v2 = st.pop()
                v1 = st.pop()
                st.append(v1 if c else v2)
            elif op == 0x23:
                st.append(self.globals[a])
            elif op == 0x24:
                self.globals[a] = st.pop()
            # ---- loads
            elif 0x28 <= op <= 0x35:
                addr = st.pop() + a
                self._mem_check(addr, _LOAD_SIZE[op])
                st.append(_LOAD[op](mem, addr))
            # ---- stores
            elif 0x36 <= op <= 0x3E:
                v = st.pop()
                addr = st.pop() + a
                self._mem_check(addr, _STORE_SIZE[op])
                _STORE[op](mem, addr, v)
            elif op == 0x3F:  # memory.size
                st.append(self.mem_pages)
            elif op == 0x40:  # memory.grow
                delta = st.pop()
                old = self.mem_pages
                self.mem_pages += delta
                self.memory.extend(b"\x00" * (delta * PAGE))
                mem = self.memory
                st.append(old)
            # ---- i32 compare / arith
            elif op == 0x45:
                st.append(1 if st.pop() == 0 else 0)
            elif 0x46 <= op <= 0x4F:
                v2 = st.pop()
                v1 = st.pop()
                st.append(_CMP32[op](v1, v2))
            elif op == 0x50:
                st.append(1 if st.pop() == 0 else 0)
            elif 0x51 <= op <= 0x5A:
                v2 = st.pop()
                v1 = st.pop()
                st.append(_CMP64[op](v1, v2))
            elif 0x5B <= op <= 0x66:
                v2 = st.pop()
                v1 = st.pop()
                st.append(_FCMP[op](v1, v2))
            elif op in (0x67, 0x68, 0x69):
                st.append(_IUN32[op](st.pop()))
            elif 0x6A <= op <= 0x78:
                v2 = st.pop()
                v1 = st.pop()
                st.append(_BIN32[op](v1, v2))
            elif op in (0x79, 0x7A, 0x7B):
                st.append(_IUN64[op](st.pop()))
            elif 0x7C <= op <= 0x8A:
                v2 = st.pop()
                v1 = st.pop()
                st.append(_BIN64[op](v1, v2))
            elif 0x8B <= op <= 0x91 or 0x99 <= op <= 0x9F:
                st.append(_FUN[op](st.pop()))
            elif 0x92 <= op <= 0x98 or 0xA0 <= op <= 0xA6:
                v2 = st.pop()
                v1 = st.pop()
                st.append(_FBIN[op](v1, v2))
            elif 0xA7 <= op <= 0xC4:
                st.append(_CONV[op](st.pop()))
            elif op >= 0xFC00:
                if op <= 0xFC07:
                    st.append(_CONV[op](st.pop()))
                elif op == 0xFC0A:  # memory.copy
                    n = st.pop()
                    src = st.pop()
                    dst = st.pop()
                    self._mem_check(src, n)
                    self._mem_check(dst, n)
                    mem[dst : dst + n] = mem[src : src + n]
                elif op == 0xFC0B:  # memory.fill
                    n = st.pop()
                    v = st.pop() & 0xFF
                    dst = st.pop()
                    self._mem_check(dst, n)
                    mem[dst : dst + n] = bytes([v]) * n
                elif op == 0xFC08:  # memory.init
                    n = st.pop()
                    src = st.pop()
                    dst = st.pop()
                    blob = self.passive_data.get(a, b"")
                    self._mem_check(dst, n)
                    mem[dst : dst + n] = blob[src : src + n]
                elif op == 0xFC09:  # data.drop
                    self.passive_data.pop(a, None)
            elif op == 0xD0:  # ref.null
                st.append(None)
            elif op == 0xD2:  # ref.func
                st.append(a)
            else:
                raise WasmError(f"unhandled opcode 0x{op:02X} at pc {pc - 1}")
        return st[len(st) - ret_arity :] if ret_arity else []

    def _do_call(self, fidx: int, st: list) -> None:
        n_imp = self.m.n_imported_funcs
        if fidx < n_imp:
            ft_args = _import_arity(self.m, fidx)
            args = st[len(st) - ft_args :] if ft_args else []
            del st[len(st) - ft_args :]
            res = self.import_funcs[fidx](*args)
            if res is not None:
                st.append(res)
            return
        f = self.m.funcs[fidx - n_imp]
        ft = self.m.types[f.type_idx]
        na = len(ft.params)
        args = st[len(st) - na :] if na else []
        del st[len(st) - na :]
        for vt in f.locals:
            args.append(0 if vt in (0x7F, 0x7E) else 0.0)
        st.extend(self._exec(f.code, args, len(ft.results)))


def _import_arity(m: Module, fidx: int) -> int:
    i = -1
    for mod, name, kind, desc in m.imports:
        if kind == 0:
            i += 1
            if i == fidx:
                return len(m.types[desc].params)
    raise WasmError(f"bad import function index {fidx}")


# ---------------------------------------------------------------------------
# opcode tables
# ---------------------------------------------------------------------------

_LOAD_SIZE = {
    0x28: 4, 0x29: 8, 0x2A: 4, 0x2B: 8, 0x2C: 1, 0x2D: 1, 0x2E: 2,
    0x2F: 2, 0x30: 1, 0x31: 1, 0x32: 2, 0x33: 2, 0x34: 4, 0x35: 4,
}
_STORE_SIZE = {
    0x36: 4, 0x37: 8, 0x38: 4, 0x39: 8, 0x3A: 1, 0x3B: 2, 0x3C: 1,
    0x3D: 2, 0x3E: 4,
}

_LOAD = {
    0x28: lambda m, p: struct.unpack_from("<I", m, p)[0],
    0x29: lambda m, p: struct.unpack_from("<Q", m, p)[0],
    0x2A: lambda m, p: struct.unpack_from("<f", m, p)[0],
    0x2B: lambda m, p: struct.unpack_from("<d", m, p)[0],
    0x2C: lambda m, p: struct.unpack_from("<b", m, p)[0] & MASK32,
    0x2D: lambda m, p: m[p],
    0x2E: lambda m, p: struct.unpack_from("<h", m, p)[0] & MASK32,
    0x2F: lambda m, p: struct.unpack_from("<H", m, p)[0],
    0x30: lambda m, p: struct.unpack_from("<b", m, p)[0] & MASK64,
    0x31: lambda m, p: m[p],
    0x32: lambda m, p: struct.unpack_from("<h", m, p)[0] & MASK64,
    0x33: lambda m, p: struct.unpack_from("<H", m, p)[0],
    0x34: lambda m, p: struct.unpack_from("<i", m, p)[0] & MASK64,
    0x35: lambda m, p: struct.unpack_from("<I", m, p)[0],
}


def _st32(m, p, v):
    struct.pack_into("<I", m, p, v & MASK32)


def _st64(m, p, v):
    struct.pack_into("<Q", m, p, v & MASK64)


_STORE = {
    0x36: _st32,
    0x37: _st64,
    0x38: lambda m, p, v: struct.pack_into("<f", m, p, v),
    0x39: lambda m, p, v: struct.pack_into("<d", m, p, v),
    0x3A: lambda m, p, v: m.__setitem__(p, v & 0xFF),
    0x3B: lambda m, p, v: struct.pack_into("<H", m, p, v & 0xFFFF),
    0x3C: lambda m, p, v: m.__setitem__(p, v & 0xFF),
    0x3D: lambda m, p, v: struct.pack_into("<H", m, p, v & 0xFFFF),
    0x3E: lambda m, p, v: struct.pack_into("<I", m, p, v & MASK32),
}

_CMP32 = {
    0x46: lambda a, b: 1 if a == b else 0,
    0x47: lambda a, b: 1 if a != b else 0,
    0x48: lambda a, b: 1 if _s32(a) < _s32(b) else 0,
    0x49: lambda a, b: 1 if a < b else 0,
    0x4A: lambda a, b: 1 if _s32(a) > _s32(b) else 0,
    0x4B: lambda a, b: 1 if a > b else 0,
    0x4C: lambda a, b: 1 if _s32(a) <= _s32(b) else 0,
    0x4D: lambda a, b: 1 if a <= b else 0,
    0x4E: lambda a, b: 1 if _s32(a) >= _s32(b) else 0,
    0x4F: lambda a, b: 1 if a >= b else 0,
}
_CMP64 = {
    0x51: lambda a, b: 1 if a == b else 0,
    0x52: lambda a, b: 1 if a != b else 0,
    0x53: lambda a, b: 1 if _s64(a) < _s64(b) else 0,
    0x54: lambda a, b: 1 if a < b else 0,
    0x55: lambda a, b: 1 if _s64(a) > _s64(b) else 0,
    0x56: lambda a, b: 1 if a > b else 0,
    0x57: lambda a, b: 1 if _s64(a) <= _s64(b) else 0,
    0x58: lambda a, b: 1 if a <= b else 0,
    0x59: lambda a, b: 1 if _s64(a) >= _s64(b) else 0,
    0x5A: lambda a, b: 1 if a >= b else 0,
}
_FCMP = {
    0x5B: lambda a, b: 1 if a == b else 0,
    0x5C: lambda a, b: 1 if a != b else 0,
    0x5D: lambda a, b: 1 if a < b else 0,
    0x5E: lambda a, b: 1 if a > b else 0,
    0x5F: lambda a, b: 1 if a <= b else 0,
    0x60: lambda a, b: 1 if a >= b else 0,
    0x61: lambda a, b: 1 if a == b else 0,
    0x62: lambda a, b: 1 if a != b else 0,
    0x63: lambda a, b: 1 if a < b else 0,
    0x64: lambda a, b: 1 if a > b else 0,
    0x65: lambda a, b: 1 if a <= b else 0,
    0x66: lambda a, b: 1 if a >= b else 0,
}


def _clz(v: int, bits: int) -> int:
    return bits - v.bit_length() if v else bits


def _ctz(v: int, bits: int) -> int:
    return (v & -v).bit_length() - 1 if v else bits


_IUN32 = {
    0x67: lambda v: _clz(v, 32),
    0x68: lambda v: _ctz(v, 32),
    0x69: lambda v: v.bit_count(),
}
_IUN64 = {
    0x79: lambda v: _clz(v, 64),
    0x7A: lambda v: _ctz(v, 64),
    0x7B: lambda v: v.bit_count(),
}


def _div_s32(a, b):
    sa, sb = _s32(a), _s32(b)
    if sb == 0:
        raise WasmTrap("integer divide by zero")
    if sa == -(1 << 31) and sb == -1:
        raise WasmTrap("integer overflow")
    return _idiv(sa, sb) & MASK32


def _div_u32(a, b):
    if b == 0:
        raise WasmTrap("integer divide by zero")
    return a // b


def _rem_s32(a, b):
    sb = _s32(b)
    if sb == 0:
        raise WasmTrap("integer divide by zero")
    return _irem(_s32(a), sb) & MASK32


def _rem_u32(a, b):
    if b == 0:
        raise WasmTrap("integer divide by zero")
    return a % b


def _div_s64(a, b):
    sa, sb = _s64(a), _s64(b)
    if sb == 0:
        raise WasmTrap("integer divide by zero")
    if sa == -(1 << 63) and sb == -1:
        raise WasmTrap("integer overflow")
    return _idiv(sa, sb) & MASK64


def _div_u64(a, b):
    if b == 0:
        raise WasmTrap("integer divide by zero")
    return a // b


def _rem_s64(a, b):
    sb = _s64(b)
    if sb == 0:
        raise WasmTrap("integer divide by zero")
    return _irem(_s64(a), sb) & MASK64


def _rem_u64(a, b):
    if b == 0:
        raise WasmTrap("integer divide by zero")
    return a % b


_BIN32 = {
    0x6A: lambda a, b: (a + b) & MASK32,
    0x6B: lambda a, b: (a - b) & MASK32,
    0x6C: lambda a, b: (a * b) & MASK32,
    0x6D: _div_s32,
    0x6E: _div_u32,
    0x6F: _rem_s32,
    0x70: _rem_u32,
    0x71: lambda a, b: a & b,
    0x72: lambda a, b: a | b,
    0x73: lambda a, b: a ^ b,
    0x74: lambda a, b: (a << (b & 31)) & MASK32,
    0x75: lambda a, b: (_s32(a) >> (b & 31)) & MASK32,
    0x76: lambda a, b: a >> (b & 31),
    0x77: _rotl32,
    0x78: _rotr32,
}
_BIN64 = {
    0x7C: lambda a, b: (a + b) & MASK64,
    0x7D: lambda a, b: (a - b) & MASK64,
    0x7E: lambda a, b: (a * b) & MASK64,
    0x7F: _div_s64,
    0x80: _div_u64,
    0x81: _rem_s64,
    0x82: _rem_u64,
    0x83: lambda a, b: a & b,
    0x84: lambda a, b: a | b,
    0x85: lambda a, b: a ^ b,
    0x86: lambda a, b: (a << (b & 63)) & MASK64,
    0x87: lambda a, b: (_s64(a) >> (b & 63)) & MASK64,
    0x88: lambda a, b: a >> (b & 63),
    0x89: _rotl64,
    0x8A: _rotr64,
}

_FUN = {
    # f32 unary (round results through binary32)
    0x8B: lambda v: _f32(abs(v)),
    0x8C: lambda v: _f32(-v),
    0x8D: lambda v: _f32(math.ceil(v)) if math.isfinite(v) else v,
    0x8E: lambda v: _f32(math.floor(v)) if math.isfinite(v) else v,
    0x8F: lambda v: _f32(math.trunc(v)) if math.isfinite(v) else v,
    0x90: lambda v: _f32(_nearest(v)),
    0x91: lambda v: _f32(math.sqrt(v)) if v >= 0 else math.nan,
    # f64 unary
    0x99: abs,
    0x9A: lambda v: -v,
    0x9B: lambda v: float(math.ceil(v)) if math.isfinite(v) else v,
    0x9C: lambda v: float(math.floor(v)) if math.isfinite(v) else v,
    0x9D: lambda v: float(math.trunc(v)) if math.isfinite(v) else v,
    0x9E: _nearest,
    0x9F: lambda v: math.sqrt(v) if v >= 0 else math.nan,
}
_FBIN = {
    0x92: lambda a, b: _f32(a + b),
    0x93: lambda a, b: _f32(a - b),
    0x94: lambda a, b: _f32(a * b),
    0x95: lambda a, b: _f32(a / b) if b != 0 else _fdiv0(a, b),
    0x96: lambda a, b: _f32(_fmin(a, b)),
    0x97: lambda a, b: _f32(_fmax(a, b)),
    0x98: lambda a, b: _f32(math.copysign(a, b)),
    0xA0: lambda a, b: a + b,
    0xA1: lambda a, b: a - b,
    0xA2: lambda a, b: a * b,
    0xA3: lambda a, b: a / b if b != 0 else _fdiv0(a, b),
    0xA4: _fmin,
    0xA5: _fmax,
    0xA6: lambda a, b: math.copysign(a, b),
}


def _fdiv0(a: float, b: float) -> float:
    if math.isnan(a) or math.isnan(b) or a == 0:
        return math.nan
    return math.copysign(math.inf, a * math.copysign(1.0, b))


_CONV = {
    0xA7: lambda v: v & MASK32,  # i32.wrap_i64
    0xA8: lambda v: _trunc(v, -(1 << 31), (1 << 31) - 1, MASK32, False),
    0xA9: lambda v: _trunc(v, 0, (1 << 32) - 1, MASK32, False),
    0xAA: lambda v: _trunc(v, -(1 << 31), (1 << 31) - 1, MASK32, False),
    0xAB: lambda v: _trunc(v, 0, (1 << 32) - 1, MASK32, False),
    0xAC: lambda v: _s32(v) & MASK64,  # i64.extend_i32_s
    0xAD: lambda v: v,  # i64.extend_i32_u
    0xAE: lambda v: _trunc(v, -(1 << 63), (1 << 63) - 1, MASK64, False),
    0xAF: lambda v: _trunc(v, 0, (1 << 64) - 1, MASK64, False),
    0xB0: lambda v: _trunc(v, -(1 << 63), (1 << 63) - 1, MASK64, False),
    0xB1: lambda v: _trunc(v, 0, (1 << 64) - 1, MASK64, False),
    0xB2: lambda v: _f32(float(_s32(v))),
    0xB3: lambda v: _f32(float(v)),
    0xB4: lambda v: _f32(float(_s64(v))),
    0xB5: lambda v: _f32(float(v)),
    0xB6: _f32,  # f32.demote_f64
    0xB7: lambda v: float(_s32(v)),
    0xB8: float,
    0xB9: lambda v: float(_s64(v)),
    0xBA: float,
    0xBB: lambda v: v,  # f64.promote_f32
    0xBC: lambda v: struct.unpack("<I", struct.pack("<f", v))[0],
    0xBD: lambda v: struct.unpack("<Q", struct.pack("<d", v))[0],
    0xBE: lambda v: struct.unpack("<f", struct.pack("<I", v))[0],
    0xBF: lambda v: struct.unpack("<d", struct.pack("<Q", v))[0],
    0xC0: lambda v: struct.unpack("<b", struct.pack("<B", v & 0xFF))[0] & MASK32,
    0xC1: lambda v: struct.unpack("<h", struct.pack("<H", v & 0xFFFF))[0] & MASK32,
    0xC2: lambda v: struct.unpack("<b", struct.pack("<B", v & 0xFF))[0] & MASK64,
    0xC3: lambda v: struct.unpack("<h", struct.pack("<H", v & 0xFFFF))[0] & MASK64,
    0xC4: lambda v: struct.unpack("<i", struct.pack("<I", v & MASK32))[0] & MASK64,
    # saturating truncations
    0xFC00: lambda v: _trunc(v, -(1 << 31), (1 << 31) - 1, MASK32, True),
    0xFC01: lambda v: _trunc(v, 0, (1 << 32) - 1, MASK32, True),
    0xFC02: lambda v: _trunc(v, -(1 << 31), (1 << 31) - 1, MASK32, True),
    0xFC03: lambda v: _trunc(v, 0, (1 << 32) - 1, MASK32, True),
    0xFC04: lambda v: _trunc(v, -(1 << 63), (1 << 63) - 1, MASK64, True),
    0xFC05: lambda v: _trunc(v, 0, (1 << 64) - 1, MASK64, True),
    0xFC06: lambda v: _trunc(v, -(1 << 63), (1 << 63) - 1, MASK64, True),
    0xFC07: lambda v: _trunc(v, 0, (1 << 64) - 1, MASK64, True),
}
