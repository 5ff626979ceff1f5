"""Multimodal column ops: real magic-byte sniffing over binary payloads,
decode stub behavior, frame-sampling batch shapes."""

import hashlib

import pytest

from seafowl_spark.sources.multimodal import (
    decode_image,
    extract_metadata,
    sample_frames,
    sniff_media_type,
)

PNG = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64
JPEG = b"\xff\xd8\xff\xe0" + b"\x00" * 64
GIF = b"GIF89a" + b"\x00" * 32
WAV = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"\x00" * 64
MP4 = b"\x00\x00\x00\x20" + b"ftyp" + b"isom" + b"\x00" * 64
RAW = b"hello world, not a media file"


class TestSniff:
    @pytest.mark.parametrize(
        "payload,expected",
        [
            (PNG, "image/png"),
            (JPEG, "image/jpeg"),
            (GIF, "image/gif"),
            (WAV, "audio/wav"),
            (MP4, "video/mp4"),
            (RAW, "application/octet-stream"),
        ],
    )
    def test_magic_bytes(self, payload, expected):
        assert sniff_media_type(payload) == expected

    def test_riff_without_wave_is_not_wav(self):
        assert sniff_media_type(b"RIFF" + b"\x00" * 4 + b"AVI ") != "audio/wav"


class TestDistributedOps:
    def _df(self, spark):
        rows = [(1, PNG), (2, JPEG), (3, WAV), (4, MP4), (5, RAW)]
        return spark.createDataFrame(rows, "item_id int, payload binary")

    def test_extract_metadata_binary_payloads(self, spark):
        out = extract_metadata(self._df(spark)).orderBy("item_id").collect()
        assert [r.media_type for r in out] == [
            "image/png",
            "image/jpeg",
            "audio/wav",
            "video/mp4",
            "application/octet-stream",
        ]
        assert out[0].n_bytes == len(PNG)
        assert out[0].payload_md5 == hashlib.md5(PNG).hexdigest()

    def test_decode_without_fake_gates_or_decodes(self, spark):
        """Three-way codec gate (r7): with PIL importable the real decode
        path runs and reports the true PNG dimensions; without it, the
        honest NotImplementedError — never a silent fake."""
        from seafowl_spark.sources.multimodal import codec_available

        if not codec_available():
            df = decode_image(self._df(spark))
            with pytest.raises(Exception, match="NotImplementedError|image codec"):
                df.collect()
        else:
            # a genuinely valid 1x1 grayscale PNG (zlib-deflated raw scanline)
            import struct
            import zlib

            def chunk(tag, body):
                return (
                    struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
                )

            real_png = (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(b"\x00\x7f"))
                + chunk(b"IEND", b"")
            )
            df = spark.createDataFrame(
                [(0, bytearray(real_png))], "item_id long, payload binary"
            )
            got = {r.item_id: (r.width, r.height, r.channels)
                   for r in decode_image(df).collect()}
            assert got[0] == (1, 1, 1)

    def test_decode_fake_is_deterministic(self, spark):
        out1 = decode_image(self._df(spark), fake=True).orderBy("item_id").collect()
        out2 = decode_image(self._df(spark), fake=True).orderBy("item_id").collect()
        assert [tuple(r) for r in out1] == [tuple(r) for r in out2]
        for r in out1:
            assert 64 <= r.width <= 1920 and 64 <= r.height <= 1080 and r.channels == 3

    def test_frame_sampling_shapes(self, spark):
        big = b"V" * 10000
        df = spark.createDataFrame([(1, big), (2, b"tiny")], "item_id int, payload binary")
        out = sample_frames(df, every_n_bytes=4096, max_frames=8).collect()
        by_item = {}
        for r in out:
            by_item.setdefault(r.item_id, []).append(r)
        assert len(by_item[1]) == 2  # 10000 // 4096
        assert len(by_item[2]) == 1  # minimum one frame
        f0 = sorted(by_item[1], key=lambda r: r.frame_idx)[0]
        assert f0.frame_offset == 0 and bytes(f0.frame_bytes) == big[:64]
