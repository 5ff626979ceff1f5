"""Streaming deduplication — the online twin of the batch dedup family.

Two flavors, both pure Structured Streaming primitives:

* ``dedup_stream``: exact key dedup with a watermark —
  ``withWatermark + dropDuplicates`` keeps per-key state only inside the
  lateness horizon, so state is bounded by (keys arriving per window), not
  by stream history. This is the ingestion-time guard that stops duplicate
  documents from ever landing in the corpus.
* ``dedup_stream_within_watermark``: Spark 3.5+'s
  ``dropDuplicatesWithinWatermark`` — deduplicates even when the event-time
  column itself differs between duplicates (retries carrying fresh
  timestamps), which is the realistic at-least-once-delivery shape.

Scale: state lives in the state store (RocksDB-ready), keyed by the dedup
columns; each micro-batch shuffles only its own rows to their key
partition. The watermark is what makes 100 TB/day streams feasible —
without it per-key state grows forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """First occurrence per key wins; duplicates arriving within the
    watermark horizon are dropped, later-than-watermark rows are expired
    input anyway. ``keys`` should include the event-time column when exact
    event identity matters (Spark requires it for state cleanup)."""
    cols = list(keys)
    if event_time_col not in cols:
        cols.append(event_time_col)
    return stream.withWatermark(event_time_col, delay).dropDuplicates(cols)


def dedup_stream_within_watermark(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicates whose KEYS match within the watermark window even if
    their event times differ (at-least-once redelivery with re-stamped
    timestamps)."""
    return stream.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        list(keys)
    )
