"""Multimodal operator queries over the documents table (payload = UTF-8
bytes of `text`; ops are payload-agnostic, see sources/multimodal.py).

Oracle parity: md5 of the UTF-8 payload equals DuckDB's md5 of the text
string; byte length equals strlen for this ASCII corpus (asserted via
octet_length(encode(...))); fake-decode dims are md5-derived integers, so
identical in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import table, widen
from ..sources.multimodal import (
    decode_image,
    extract_metadata,
    sample_frames,
    with_text_payload,
)
from . import register


def m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling shape: explode each payload into byte-offset
    pseudo-frames (one row per frame) via mapInPandas — the frame fan-out
    arithmetic is oracle-checked through m_payload_pipeline's 'frames'
    branch (this row's slot was donated to q_quality_classifier in r8);
    frame bytes themselves are binary and covered in tests."""
    # r13: widening this scan was measured and REJECTED (0.97 s -> 3.58 s
    # min-of-4): the mapInPandas CPU here is well under a second, so a
    # 32-way spread pays more in per-task Python overhead than it saves —
    # the widen() rule of thumb is heavy per-row work only (guide §4.1).
    d = with_text_payload(table(spark, sf_dir, "documents").select("doc_id", "text")).select(
        "doc_id", "payload"
    )
    out = sample_frames(d, every_n_bytes=256, max_frames=8)
    from pyspark.sql import functions as F

    return out.select(
        "doc_id", "frame_idx", F.col("frame_offset").alias("frame_offset")
    )


@register(
    "m_payload_pipeline",
    oracle="""
    SELECT 'decode' AS branch,
           doc_id,
           'application/octet-stream' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           64 + CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) % 1857 AS width,
           64 + CAST(('0x' || substr(md5(text), 9, 8)) AS BIGINT) % 1017 AS height,
           3 AS channels,
           CAST(NULL AS INT) AS frame_idx,
           CAST(NULL AS BIGINT) AS frame_offset
    FROM documents
    UNION ALL
    SELECT 'frames' AS branch, doc_id,
           CAST(NULL AS VARCHAR) AS media_type,
           CAST(NULL AS BIGINT) AS n_bytes,
           CAST(NULL AS VARCHAR) AS payload_md5,
           CAST(NULL AS BIGINT) AS width,
           CAST(NULL AS BIGINT) AS height,
           CAST(NULL AS INT) AS channels,
           CAST(frame_idx AS INT) AS frame_idx,
           frame_idx * 256 AS frame_offset
    FROM (
      WITH base AS (
        SELECT doc_id, octet_length(encode(text)) AS nb FROM documents),
      frames AS (
        SELECT doc_id,
               unnest(range(0, CAST(least(8, greatest(1, nb // 256)) AS BIGINT))) AS frame_idx,
               nb
        FROM base)
      SELECT doc_id, frame_idx FROM frames
    )
    """,
)
def m_payload_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload pipeline: metadata extraction (magic-byte sniff +
    size + content hash) chained into the image decode step (codec stubbed
    deterministically — dims from payload md5), both as Arrow-batched
    mapInPandas stages over the same payload column; 'frames' branch
    (absorbed from m_frame_sample in r8 — its slot donated to
    q_quality_classifier) explodes each payload into byte-offset
    pseudo-frames via the same mapInPandas shape, frame fan-out
    arithmetic oracle-checked. Text payloads sniff as octet-stream; real
    container formats and raw frame bytes are covered in tests."""
    # r13: widening this scan was measured and REJECTED (0.97 s -> 3.58 s
    # min-of-4): the mapInPandas CPU here is well under a second, so a
    # 32-way spread pays more in per-task Python overhead than it saves —
    # the widen() rule of thumb is heavy per-row work only (guide §4.1).
    d = with_text_payload(table(spark, sf_dir, "documents").select("doc_id", "text")).select(
        "doc_id", "payload"
    )
    out = decode_image(extract_metadata(d), fake=True)
    from pyspark.sql import functions as F

    decode = out.select(
        F.lit("decode").alias("branch"),
        "doc_id",
        "media_type",
        "n_bytes",
        "payload_md5",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.lit(3).cast("int").alias("channels"),
        F.lit(None).cast("int").alias("frame_idx"),
        F.lit(None).cast("long").alias("frame_offset"),
    )
    frames = m_frame_sample(spark, sf_dir).select(
        F.lit("frames").alias("branch"),
        "doc_id",
        F.lit(None).cast("string").alias("media_type"),
        F.lit(None).cast("long").alias("n_bytes"),
        F.lit(None).cast("string").alias("payload_md5"),
        F.lit(None).cast("long").alias("width"),
        F.lit(None).cast("long").alias("height"),
        F.lit(None).cast("int").alias("channels"),
        "frame_idx",
        "frame_offset",
    )
    return decode.unionAll(frames)
