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


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Split each document into overlapping token windows — the standard
    RAG / long-document splitter (stride = chunk_tokens - overlap; the
    final partial window is kept so no suffix is lost).

    Row-local and JVM-only: the chunk starts come from ``sequence`` over
    the token count and each chunk re-joins a ``slice`` of the token
    array, so a 100 TB corpus chunks in one scan with no shuffle. Output
    is one row per chunk: ``(id, chunk_id, n_chunk_tokens, chunk_text)``.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    # chunk start offsets: 0, stride, 2*stride, ... while start < n
    # (empty docs produce no chunks)
    n_chunks = F.when(n > 0, F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"))
    n_chunks = F.greatest(F.coalesce(n_chunks, F.lit(0)), F.when(n > 0, F.lit(1)).otherwise(F.lit(0)))
    starts = F.when(
        n > 0, F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    chunked = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    piece = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return chunked.select(
        id_col,
        "chunk_id",
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pack_bins_ffd(
    df: DataFrame,
    token_col: str,
    id_col: str,
    budget: int,
    shard_cols: list[str] | None = None,
) -> DataFrame:
    """Whole-document bin packing (first-fit-decreasing) — the NO-SPLIT
    variant SFT/instruction-tuning pipelines use, where a training
    example must never straddle sequences. Adds (bin_id, bin_fill,
    oversize): every document lands wholly in one bin; documents longer
    than ``budget`` get a dedicated bin and an ``oversize`` flag
    (callers truncate or drop upstream).

    Runs per shard via ``applyInPandas``: FFD is inherently sequential
    within its stream, so the distributed shape is many independent
    shard-local packings (the same (source, date)-shard discipline
    pack_sequences documents) — at 100 TB each shard's group fits one
    task and shards pack in parallel. Deterministic: items sort by
    (-tokens, id), bins probe in creation order, so re-running
    reproduces the exact assignment. Unsharded input packs as ONE group
    (fine at test scale; shard in production).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard_cols = shard_cols or []
    import pandas as pd  # noqa: F401 — applyInPandas contract

    out_fields = (
        ", ".join(
            f"{c} {df.schema[c].dataType.simpleString()}"
            for c in ([*shard_cols, id_col, token_col])
        )
        + ", bin_id bigint, bin_fill bigint, oversize boolean"
    )

    def pack(pdf):
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        bin_ids, oversize = [], []
        for tok in pdf[token_col]:
            tok = int(tok)
            if tok > budget:
                fills.append(tok)
                bin_ids.append(len(fills) - 1)
                oversize.append(True)
                continue
            for b, f in enumerate(fills):
                if f + tok <= budget:
                    fills[b] = f + tok
                    bin_ids.append(b)
                    oversize.append(False)
                    break
            else:
                fills.append(tok)
                bin_ids.append(len(fills) - 1)
                oversize.append(False)
        res = pdf[[*shard_cols, id_col, token_col]].copy()
        res["bin_id"] = bin_ids
        # bin_fill reports the FINAL fill of each bin, not the running one
        res["bin_fill"] = [fills[b] for b in bin_ids]
        res["oversize"] = oversize
        return res

    grouped = df.groupBy(*shard_cols) if shard_cols else df.groupBy()
    return grouped.applyInPandas(pack, out_fields)
