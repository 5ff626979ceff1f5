"""Delta deletion-vector codec (sources/delta_dv.py): Z85 golden vectors,
roaring-bitmap golden bytes, property round-trips across container types,
and descriptor resolution."""

import os
import struct
import uuid

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from seafowl_spark.sources.delta_dv import (
    DvError,
    decode_rbm_array,
    dv_absolute_path,
    encode_rbm_array,
    read_dv,
    write_dv_file,
    z85_decode,
    z85_encode,
)


class TestZ85:
    def test_zeromq_reference_vector(self):
        # the Z85 spec's own test case (ZeroMQ RFC 32)
        raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
        assert z85_encode(raw) == "HelloWorld"
        assert z85_decode("HelloWorld") == raw

    def test_round_trip_uuid(self):
        u = uuid.uuid4()
        assert z85_decode(z85_encode(u.bytes)) == u.bytes

    def test_bad_length_rejected(self):
        with pytest.raises(DvError):
            z85_decode("abc")
        with pytest.raises(DvError):
            z85_encode(b"abc")


class TestRoaringGolden:
    def test_small_array_container_bytes(self):
        # spelled out from the spec: magic+count, high key 0, cookie 12346,
        # one container (key 0, card 3), offset table, sorted u16 payload
        expected = (
            struct.pack("<iq", 1681511377, 1)
            + struct.pack("<i", 0)
            + struct.pack("<ii", 12346, 1)
            + struct.pack("<HH", 0, 2)
            + struct.pack("<i", 16)
            + struct.pack("<3H", 1, 3, 5)
        )
        assert encode_rbm_array([1, 3, 5]) == expected
        assert decode_rbm_array(expected) == [1, 3, 5]

    def test_bad_magic_rejected(self):
        with pytest.raises(DvError, match="magic"):
            decode_rbm_array(struct.pack("<iq", 999, 0) + b"\x00" * 4)

    def test_run_container_decoded(self):
        # hand-built cookie-12347 bitmap: container 0 is a run [10..14]
        rb = (
            struct.pack("<i", (0 << 16) | 12347)  # 1 container -> high=0
            + b"\x01"  # run bitset: container 0 is a run
            + struct.pack("<HH", 0, 4)  # key 0, card-1 = 4
            # n < 4 -> no offset table
            + struct.pack("<H", 1)  # one run
            + struct.pack("<HH", 10, 4)  # start 10, len-1 = 4
        )
        data = struct.pack("<iq", 1681511377, 1) + struct.pack("<i", 0) + rb
        assert decode_rbm_array(data) == [10, 11, 12, 13, 14]


class TestRoaringRoundTrip:
    @settings(max_examples=25, deadline=None)
    @given(
        st.sets(
            st.integers(min_value=0, max_value=2**40),
            max_size=200,
        )
    )
    def test_property_round_trip(self, xs):
        assert decode_rbm_array(encode_rbm_array(list(xs))) == sorted(xs)

    def test_bitmap_container_round_trip(self):
        # >4096 values in one 2^16 chunk forces a bitmap container
        xs = list(range(0, 10000, 2))
        assert decode_rbm_array(encode_rbm_array(xs)) == xs

    def test_multiple_high_keys(self):
        xs = [5, 2**32 + 7, 3 * 2**32 + 1]
        assert decode_rbm_array(encode_rbm_array(xs)) == xs


class TestDescriptors:
    def test_uuid_path_resolution(self, tmp_path):
        d = str(tmp_path)
        desc = write_dv_file(d, [1, 2, 3])
        assert desc["storageType"] == "u"
        p = dv_absolute_path(d, desc)
        assert os.path.exists(p)
        assert os.path.basename(p).startswith("deletion_vector_")
        assert read_dv(d, desc) == [1, 2, 3]

    def test_checksum_validated(self, tmp_path):
        d = str(tmp_path)
        desc = write_dv_file(d, [9])
        p = dv_absolute_path(d, desc)
        blob = bytearray(open(p, "rb").read())
        blob[6] ^= 0xFF  # corrupt payload
        open(p, "wb").write(bytes(blob))
        with pytest.raises(DvError, match="checksum|magic|cookie"):
            read_dv(d, desc)

    def test_cardinality_validated(self, tmp_path):
        d = str(tmp_path)
        desc = write_dv_file(d, [1, 2])
        desc["cardinality"] = 5
        with pytest.raises(DvError, match="cardinality"):
            read_dv(d, desc)

    def test_prefixed_relative_path(self, tmp_path):
        d = str(tmp_path)
        os.makedirs(os.path.join(d, "ab"))
        inner = write_dv_file(os.path.join(d, "ab"), [4])
        desc = dict(inner, pathOrInlineDv="ab/" + inner["pathOrInlineDv"])
        assert read_dv(d, desc) == [4]
