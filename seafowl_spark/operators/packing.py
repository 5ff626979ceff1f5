"""Sequence packing for LLM training batches: concat-and-chunk.

Documents are laid out in a deterministic order, conceptually concatenated
into one token stream, and split every ``budget`` tokens; each document is
labeled with the pack (training sequence) its first token lands in, its
offset inside that pack, and whether it straddles a pack boundary. This is
the standard "concatenate then chunk" packing most pretraining pipelines
use (greedy bin-packing variants trade determinism and parallelism for a
little less fragmentation; chunking is exact, order-stable, and runs as a
single window cumsum).

Scale: one total-order window (a range shuffle) when unpartitioned; with
``shard_cols`` the cumsum runs per shard — at 100 TB you pack within e.g.
(source, date) shards so no global sort exists and each shard's stream is
independently reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    token_col: str,
    order_cols: list[str],
    budget: int,
    shard_cols: list[str] | None = None,
) -> DataFrame:
    """Label each row with (pack_id, offset_in_pack, spans_boundary).

    ``order_cols`` must be a total order (include a unique key) — packing
    is only reproducible if the stream order is. ``budget`` is the pack
    size in tokens. Rows longer than ``budget`` span multiple packs and
    are flagged; callers split or drop them upstream.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    w = Window.orderBy(*order_cols)
    if shard_cols:
        w = Window.partitionBy(*shard_cols).orderBy(*order_cols)
    cum_before: Column = (
        F.sum(F.col(token_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        )
    )
    cum_before = F.coalesce(cum_before, F.lit(0)).cast("long")
    pack_id = F.floor(cum_before / budget).cast("long")
    offset = (cum_before % budget).cast("long")
    return df.select(
        "*",
        pack_id.alias("pack_id"),
        offset.alias("offset_in_pack"),
        ((offset + F.col(token_col)) > budget).alias("spans_boundary"),
    )
