"""Count-Min sketch — approximate per-item frequencies in fixed space
(Cormode & Muthukrishnan 2005).

The complement to Misra-Gries (operators/heavy_hitters.py): MG answers
"what are the top items" with a survival guarantee; Count-Min answers
"how often does THIS item occur" for any later query, from a summary of
``depth x width`` counters regardless of corpus size or item cardinality.

Spark-first factoring — the sketch build is one aggregation whose KEY
SPACE is the sketch itself:

* every (item, weight) row maps row-locally to ``depth`` cells
  ``(d, md5(d || item) % width)`` — a JVM transform, no Python;
* one groupBy (d, col) sum produces the sketch. Because there are at
  most ``depth x width`` distinct keys, map-side partial aggregation
  bounds the shuffle at ``depth x width x partitions`` rows — the same
  bounded-shuffle contract as MG, independent of item cardinality;
* estimates: broadcast-join the (tiny) sketch back to a query frame and
  take the MIN over the item's depth cells — the classic CM estimate,
  always an OVERestimate (every true count <= estimate), within
  ``e/width x total_weight`` of truth with probability
  ``1 - (1/e)^depth``.

Guarantees asserted in tests/test_countmin.py: estimate >= exact for
every item (hard), and the epsilon bound over the real token stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import md5_int


def _cell(item_col, d: int, width: int):
    return F.pmod(
        md5_int(F.concat(F.lit(f"{d}|"), item_col.cast("string")), 15),
        F.lit(width),
    )


def count_min_cells(
    df: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """The stateless cell mapping: (d, col, __w) rows, ``depth`` per
    input item. Shared by the batch build and streaming — it contains no
    aggregation, so it composes with a streaming groupBy unchanged."""
    if width <= 0 or depth <= 0:
        raise ValueError("width and depth must be positive")
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    src = df.where(F.col(item_col).isNotNull()).where(w > 0).select(
        F.col(item_col).alias("__item"), w.alias("__w")
    )
    return src.select(
        "__w",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell(F.col("__item"), d, width).alias("col"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select(F.col("c.d").alias("d"), F.col("c.col").alias("col"), "__w")


def count_min_build(
    df: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (d, col, cnt) rows, at most depth x width of
    them. NULL items are skipped; non-positive weights are skipped (the
    MG summary's rules, so the two sketches agree on what "counts").

    Streaming: because the cell mapping is stateless and the key space is
    the sketch itself, this same expression over a ``readStream`` source
    is a FIXED-STATE streaming aggregation — at most depth x width state
    rows no matter how many distinct items the stream carries, the
    property that makes CM the right frequency summary for unbounded
    token/URL/user streams (tested in test_streaming.py)."""
    return (
        count_min_cells(df, item_col, width, depth, weight_col)
        .groupBy("d", "col")
        .agg(F.sum("__w").alias("cnt"))
    )


def count_min_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Add ``est_count`` to ``queries``: min over the item's depth cells.
    ``width``/``depth`` must match the build. Items hashing to cells the
    sketch never touched estimate 0 (exact for unseen items)."""
    q = queries.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _cell(F.col(item_col), d, width).alias("col"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__c"),
    ).select("*", F.col("__c.d").alias("__d"), F.col("__c.col").alias("__col"))
    joined = q.join(
        F.broadcast(
            sketch.select(
                F.col("d").alias("__d"),
                F.col("col").alias("__col"),
                F.col("cnt").alias("__cnt"),
            )
        ),
        ["__d", "__col"],
        "left",
    )
    keys = [c for c in queries.columns]
    return (
        joined.groupBy(*[F.col(c) for c in keys])
        .agg(
            F.min(F.coalesce(F.col("__cnt"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )
