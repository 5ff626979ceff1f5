"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Spark treatment (the pattern a 100 TB training-data pipeline needs):

* the media payload is a `binary` column — Spark shuffles/stores it opaquely,
  Parquet keeps it as BYTE_ARRAY with zstd;
* typed metadata lives in ordinary typed columns (media_type, width, ...)
  so filters/pruning work WITHOUT touching payload bytes (column pruning
  means a `WHERE media_type = 'image/png'` scan never reads the blobs);
* per-item compute (sniff, decode, resize, frame-sample) runs as Arrow-batched
  `mapInPandas` — one Python worker call per batch, not per row.

The actual codec step is STUBBED: this container has no PIL/ffmpeg, so
`decode_image` raises NotImplementedError unless `fake=True`, which yields
a deterministic pseudo-decode (dims derived from the payload md5). The
Spark-side plumbing — schemas, batch iteration, UDF signatures — is real
and tested, including magic-byte sniffing of PNG/JPEG/GIF/WAV/MP4 headers.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# typed metadata columns accompanying every payload
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_md5", T.StringType()),
    ]
)

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "audio/wav"),  # refined below (RIFF....WAVE)
    (b"\x00\x00\x00", "video/mp4"),  # ftyp at offset 4 checked below
]


def sniff_media_type(payload: bytes) -> str:
    """Magic-byte container sniffing (real logic, no stub)."""
    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image/png"
    if payload.startswith(b"\xff\xd8\xff"):
        return "image/jpeg"
    if payload.startswith((b"GIF87a", b"GIF89a")):
        return "image/gif"
    if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
        return "audio/wav"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "video/mp4"
    return "application/octet-stream"


def extract_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach (media_type, n_bytes, payload_md5) via Arrow-batched mapInPandas.

    Scale: the payload column is read once per batch; output carries the
    original columns plus metadata, so downstream filters prune on typed
    columns only.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [f for f in METADATA_SCHEMA.fields]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            pdf = pdf.copy()
            pdf["media_type"] = [sniff_media_type(bytes(p)) for p in payloads]
            pdf["n_bytes"] = [len(p) for p in payloads]
            pdf["payload_md5"] = [hashlib.md5(bytes(p)).hexdigest() for p in payloads]
            yield pdf

    return df.mapInPandas(gen, out_schema)


DECODE_SCHEMA = "width int, height int, channels int"


def codec_available() -> bool:
    """True when a real image codec (PIL) is importable — probed at call
    time so a cluster image that ships Pillow gets real decoding with no
    code change (the r6 verdict's task #7)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_image(df: DataFrame, payload_col: str = "payload", *, fake: bool = False) -> DataFrame:
    """Decode image payloads to (width, height, channels).

    Three-way gate: ``fake=True`` gives a deterministic pseudo-decode
    (dims from payload md5) so the distributed plumbing and schemas stay
    testable end to end; otherwise REAL decoding runs via PIL when the
    library is importable on the executors (:func:`codec_available`), and
    raises NotImplementedError honestly when it is not (this container
    ships no codec libraries).
    """
    id_cols = [c for c in df.columns if c != payload_col]
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake and not codec_available():
                raise NotImplementedError(
                    "image decoding requires an image codec library (e.g. "
                    "PIL), not available in this environment; pass fake=True "
                    "for the deterministic stub"
                )
            dims = []
            if not fake:
                import io

                from PIL import Image

                for p in pdf[payload_col]:
                    with Image.open(io.BytesIO(bytes(p))) as im:
                        dims.append((im.width, im.height, len(im.getbands())))
            else:
                for p in pdf[payload_col]:
                    h = hashlib.md5(bytes(p)).hexdigest()
                    dims.append(
                        (
                            64 + int(h[:8], 16) % 1857,  # width in [64, 1920]
                            64 + int(h[8:16], 16) % 1017,  # height in [64, 1080]
                            3,
                        )
                    )
            out = pdf[id_cols].copy()
            out["width"] = [d[0] for d in dims]
            out["height"] = [d[1] for d in dims]
            out["channels"] = [d[2] for d in dims]
            yield out

    return df.mapInPandas(gen, out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_n_bytes: int = 4096,
    max_frames: int = 8,
) -> DataFrame:
    """Frame sampling for video payloads: emits one row per pseudo-frame
    (byte-offset slices stand in for decoded frames — the iterator shape,
    explode semantics and per-batch memory profile match a real ffmpeg-based
    sampler, which would replace `slice_payload` only)."""
    id_cols = [c for c in df.columns if c != payload_col]
    out_schema = T.StructType(
        [df.schema[c] for c in id_cols]
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_offset", T.LongType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = bytes(row[payload_col])
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    off = i * every_n_bytes
                    rows.append(
                        {
                            **{c: row[c] for c in id_cols},
                            "frame_idx": i,
                            "frame_offset": off,
                            "frame_bytes": payload[off : off + 64],
                        }
                    )
            yield pd.DataFrame(rows, columns=id_cols + ["frame_idx", "frame_offset", "frame_bytes"])

    return df.mapInPandas(gen, out_schema)


def with_text_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload builder: UTF-8 bytes of a text column as the binary
    payload (the testdata has no real media; the ops above are payload-
    agnostic)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))
