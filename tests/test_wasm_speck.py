"""Raw-wasm ABI against the reference's second e2e fixture shape: the
Speck64/128 block cipher (reference src/wasm_udf/wasm.rs:930-1042
``test_wasm_encryption`` — exports from github.com/madmo/speck adapted to
WASM). The module here is assembled from scratch against the published
cipher (Beaulieu et al. 2013): 27 rounds, alpha=8/beta=3 rotations, key
schedule over four 32-bit words — NOT copied bytes. The reference's
expected 64-bit ciphertexts are reproduced exactly, which pins the raw
ABI pieces its first fixture (sintau) does not touch: multi-argument i64
calls, i64<->i32 wrap/extend/shift/or assembly of the block halves,
i32.rotl/rotr, and a helper writing a 27-entry round-key table into
linear memory that two exports then read.

Key-word convention (recovered by matching the reference's expected
values): block x=hi32(v), y=lo32(v); round-key seed k0=lo32(key_msb),
l0=hi32(key_msb), l1=lo32(key_lsb), l2=hi32(key_lsb).
"""

from __future__ import annotations

import base64
import json

import pytest
from test_wasm_interp import I64, build, functype

from seafowl_spark.engine.wasm_abi import RawInterpExecutor

# ---------------------------------------------------------------------------
# module assembly: funcs enc=0, dec=1, keysched=2; 1 memory page
# ---------------------------------------------------------------------------

# keysched(msb, lsb): writes round keys k_0..k_26 at mem[4*i]
BODY_KEYSCHED = bytes.fromhex(
    "2000a72102"          # k  = wrap(msb)
    "20004220 88 a72103"  # l0 = wrap(msb >> 32)
    .replace(" ", "")
    + "2001a72104"        # l1 = wrap(lsb)
    + "200142208" + "8a72105"  # l2 = wrap(lsb >> 32)
    + "410020023602 00".replace(" ", "")  # mem[0] = k
    + "41002106"          # i = 0
    + "0340"              # loop
    + "2002200341087" + "86a20067321 07".replace(" ", "")
    #   newl = (k + rotr(l0,8)) ^ i
    + "2002410377200773 2102".replace(" ", "")  # k = rotl(k,3) ^ newl
    + "20042103"          # l0 = l1
    + "20052104"          # l1 = l2
    + "20072105"          # l2 = newl
    + "2006410 16a2106".replace(" ", "")        # i += 1
    + "2006410274200236 0200".replace(" ", "")  # mem[4*i] = k
    + "2006411a470d00"    # br_if i != 26
    + "0b"
)

# shared epilogue: (extend_u(x) << 32) | extend_u(y)
_EPILOGUE = "2003ad42208620 04ad84".replace(" ", "")

# enc(v, msb, lsb): forward rounds with k_0..k_26
BODY_ENC = bytes.fromhex(
    "200120021002"        # call keysched(msb, lsb)
    + "2000422088a72103"  # x = wrap(v >> 32)
    + "2000a72104"        # y = wrap(v)
    + "41002105"          # i = 0
    + "0340"
    + "200541027428 02002106".replace(" ", "")  # k = mem[4*i]
    + "2003410878 20046a20067321 03".replace(" ", "")
    #   x = (rotr(x,8) + y) ^ k
    + "200441037720037321 04".replace(" ", "")  # y = rotl(y,3) ^ x
    + "20054101 6a2205".replace(" ", "")        # i += 1 (tee)
    + "411b470d00"        # br_if i != 27
    + "0b"
    + _EPILOGUE
)

# dec(v, msb, lsb): inverse rounds with k_26..k_0
BODY_DEC = bytes.fromhex(
    "200120021002"
    + "2000422088a72103"
    + "2000a72104"
    + "411b2105"          # i = 27
    + "0340"
    + "2005410 16b2205".replace(" ", "")        # i -= 1 (tee leaves i)
    + "41027428020 02106".replace(" ", "")      # k = mem[4*i]
    + "2004200373 410378 2104".replace(" ", "") # y = rotr(y ^ x, 3)
    + "2003200673 20046b 41087721 03".replace(" ", "")
    #   x = rotl((x ^ k) - y, 8)
    + "20050d00"          # br_if i != 0
    + "0b"
    + _EPILOGUE
)


def speck_module() -> bytes:
    t_export = functype([I64, I64, I64], [I64])
    t_helper = functype([I64, I64], [])
    I32 = 0x7F
    return build(
        [t_export, t_helper],
        [
            (0, [I32, I32, I32, I32], BODY_ENC),     # x y i k
            (0, [I32, I32, I32, I32], BODY_DEC),
            (1, [I32, I32, I32, I32, I32, I32], BODY_KEYSCHED),  # k l0 l1 l2 i newl
        ],
        exports=[("speck_encrypt_block", 0, 0), ("speck_decrypt_block", 0, 1)],
        memory_pages=1,
    )


KEY_MSB = 4522913144885835612
KEY_LSB = -7379163842329862484
# the reference test's exact expected table (wasm.rs:1029-1040)
CASES = [
    (123456, 5661533298546550503),
    (7891011, 7528692995910408077),
    (12131415, 4835612303979161413),
    (16171819, 8992269262659013344),
    (-20212223, 5068206001593455086),
]


class TestSpeckExecutors:
    @pytest.fixture(scope="class")
    def mod(self):
        return speck_module()

    def test_reference_ciphertexts(self, mod):
        enc = RawInterpExecutor(mod, "speck_encrypt_block")
        for v, ct in CASES:
            assert enc.call_raw([v, KEY_MSB, KEY_LSB]) == ct, v

    def test_decrypt_roundtrip(self, mod):
        enc = RawInterpExecutor(mod, "speck_encrypt_block")
        dec = RawInterpExecutor(mod, "speck_decrypt_block")
        for v, ct in CASES:
            assert dec.call_raw([ct, KEY_MSB, KEY_LSB]) == v, v
        # beyond the fixed table: a few extra 64-bit patterns
        for v in (0, 1, -1, 2**62, -(2**62), 0x0123456789ABCDEF):
            sv = v if v < 2**63 else v - 2**64
            assert dec.call_raw(
                [enc.call_raw([sv, KEY_MSB, KEY_LSB]), KEY_MSB, KEY_LSB]
            ) == sv, v


class TestSpeckEndToEndSql:
    def test_reference_query_shape(self, ctx):
        """The full wasm.rs test_wasm_encryption query: CREATE FUNCTION
        both exports, encrypt-then-decrypt in one CTE, compare the exact
        expected table."""
        mod = speck_module()
        for name in ("speck_encrypt_block", "speck_decrypt_block"):
            spec = {
                "entrypoint": name,
                "language": "wasm",
                "input_types": ["bigint", "bigint", "bigint"],
                "return_type": "bigint",
                "data": base64.b64encode(mod).decode(),
                "volatility": "immutable",
            }
            ctx.execute(f"CREATE FUNCTION {name} AS '{json.dumps(spec)}'")
        values = ", ".join(f"({v})" for v, _ in CASES)
        df = ctx.execute(
            "WITH encrypted AS ("
            "  SELECT v, speck_encrypt_block(CAST(v AS BIGINT), "
            f"    {KEY_MSB}, {KEY_LSB}) AS encrypted"
            f"  FROM (VALUES {values}) AS t(v))"
            " SELECT v, encrypted, speck_decrypt_block(encrypted, "
            f"   {KEY_MSB}, {KEY_LSB}) AS decrypted"
            " FROM encrypted"
        )
        got = sorted((r.v, r.encrypted, r.decrypted) for r in df.collect())
        assert got == sorted((v, ct, v) for v, ct in CASES)
