"""Approximate heavy hitters (Misra-Gries), bounded-shuffle top-k.

The exact "top tokens over the corpus" query shuffles one partial count
per DISTINCT term per partition — at web scale that is billions of rows
of long-tail noise moving for a 100-row answer. The Misra-Gries summary
caps what each partition emits at ``capacity`` counters while keeping
the classic frequency guarantee:

* per partition, an Arrow-batched ``mapInPandas`` maintains at most
  ``capacity`` (item, weight) counters — when full, every counter decays
  by the incoming item's weight instead of inserting (the MG step);
* the per-partition summaries (<= capacity x partitions rows total — the
  ENTIRE shuffle) merge with one ordinary hash aggregate;
* guarantee: any item whose true frequency exceeds ``total/ (capacity+1)``
  survives to the output, and each reported weight underestimates the
  true count by at most ``total_partition_weight / (capacity+1)`` summed
  over partitions. The output also carries the exact count of the
  surviving candidates (one cheap semi-joined recount) so callers get
  true frequencies for everything that matters and a proof the tail was
  never shuffled.

This is the scale path for "what are the dominant boilerplate lines /
tokens / domains" questions that drive C4-style cleaning thresholds —
the exact variant (build_vocab with top_k) stays the right tool when the
distinct-item universe is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_partition(capacity: int, item_col: str, weight_col: str | None):
    import pandas as pd

    def summarize(batches):
        counters: dict = {}
        for pdf in batches:
            items = pdf[item_col]
            weights = (
                pdf[weight_col] if weight_col else [1] * len(pdf)
            )
            for item, w in zip(items, weights):
                if item is None:
                    continue
                w = int(w)
                if w <= 0:
                    continue
                if item in counters:
                    counters[item] += w
                elif len(counters) < capacity:
                    counters[item] = w
                else:
                    # Weighted MG decay: admit the incoming item FIRST,
                    # then repeatedly decay every counter by the current
                    # minimum until we are back at capacity. Equivalent
                    # to decaying by min(w, min(counters)) and keeping
                    # the remainder of w, so a heavy incoming weight can
                    # never erase itself (the naive "subtract w from
                    # everyone and drop the arrival" variant loses the
                    # total/(capacity+1) guarantee for weighted input).
                    counters[item] = w
                    while len(counters) > capacity:
                        m = min(counters.values())
                        dead = []
                        for k in counters:
                            counters[k] -= m
                            if counters[k] <= 0:
                                dead.append(k)
                        for k in dead:
                            del counters[k]
        yield pd.DataFrame(
            {
                "item": list(counters.keys()),
                "lower_weight": list(counters.values()),
            }
        )

    return summarize


def approx_top_k(
    df: DataFrame,
    item_col: str,
    k: int = 20,
    capacity: int = 256,
    weight_col: str | None = None,
    materialize: bool = True,
) -> DataFrame:
    """(item, approx_weight, exact_weight) for the top-``k`` items by
    exact weight among the Misra-Gries survivors. ``capacity`` bounds
    BOTH executor memory and the shuffle (<= capacity rows per
    partition); any item with frequency above ``total/(capacity+1)`` is
    guaranteed to survive. ``weight_col`` weights occurrences (e.g.
    token counts); default weight 1 per row."""
    if capacity <= 0 or k <= 0:
        raise ValueError("k and capacity must be positive")
    src = df.select(
        F.col(item_col).alias(item_col),
        *([F.col(weight_col).alias(weight_col)] if weight_col else []),
    )
    schema = T.StructType(
        [
            T.StructField("item", src.schema[item_col].dataType),
            T.StructField("lower_weight", T.LongType()),
        ]
    )
    summaries = src.mapInPandas(
        _mg_partition(capacity, item_col, weight_col), schema
    )
    # materialize the merged summary (<= capacity x partitions rows): it
    # feeds BOTH the recount's broadcast prune and the final join, and an
    # unmaterialized subtree referenced twice re-executes the corpus-sized
    # MG pass per reference (the repo's double-subtree trap)
    merged = summaries.groupBy("item").agg(
        F.sum("lower_weight").alias("approx_weight")
    )
    if materialize:
        merged = merged.localCheckpoint()
    # exact recount of the surviving candidates only: the corpus-side
    # filter is a broadcast semi-join against <= capacity x partitions
    # items — the long tail still never shuffles
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    recount_src = src.where(w > 0) if weight_col else src  # summary skip rules
    exact = (
        recount_src.join(
            F.broadcast(merged.select(F.col("item").alias(item_col))),
            item_col,
        )
        .groupBy(F.col(item_col).alias("item"))
        .agg(F.sum(w).alias("exact_weight"))
    )
    return (
        merged.join(exact, "item")
        .orderBy(F.desc("exact_weight"), "item")
        .limit(k)
    )
