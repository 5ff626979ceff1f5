"""Distributed BPE (byte-pair-encoding) tokenizer training + encoding.

The subword vocabulary step of every LLM data pipeline, built the way the
original algorithm (Sennrich et al. 2016) actually factors at scale:

* The corpus is touched ONCE — a (word, count) aggregate whose shuffle
  carries map-side partial counts, bounded by distinct words per
  partition. Everything after runs on that word-frequency table, which is
  vocabulary-sized, not corpus-sized (this is why fastBPE/HF tokenizers
  train from word counts too).
* Each merge round is two small Spark jobs over the word table: count
  adjacent symbol pairs weighted by word frequency (explode + one hash
  aggregate), pick the winner (deterministic: max count, then
  lexicographically smallest pair), and apply the merge as a row-local
  JVM fold over each word's symbol array — greedy left-to-right,
  non-overlapping, exactly the reference algorithm's semantics.
* The word table is ``localCheckpoint``-ed each round: the frame is tiny
  and re-materializing it truncates the lineage, so the plan does not
  grow by one fold per merge round (the iterative-algorithm idiom
  d_dedup_components also uses).
* Encoding (:func:`bpe_encode`) applies the learned merge list with an
  Arrow-batched pandas UDF whose closure carries the merge ranks — the
  same closure-data design as the IVF/PQ codebooks: the plan is O(1) in
  the number of merges, and applying 10k merges per row is a dict lookup
  loop in numpy/python batch space, not 10k plan operators.

End-of-word marker: the trailing symbol of each word is tagged with
``</w>`` (suffix form, e.g. ``e</w>``), so learned units distinguish
word-final from word-internal occurrences — the standard formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _word_counts(df: DataFrame, text_col: str, lowercase: bool) -> DataFrame:
    base = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    tok = F.explode(F.filter(F.split(base, r"\s+"), lambda t: t != ""))
    return df.select(tok.alias("word")).groupBy("word").agg(
        F.count(F.lit(1)).alias("weight")
    )


def _initial_symbols() -> F.Column:
    """word -> array of single characters, last one tagged with </w>."""
    chars = F.split(F.col("word"), "")
    n = F.size(chars)
    return F.concat(
        F.slice(chars, 1, n - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit("</w>"))),
    )


def _apply_merge(sym_col, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a+b — one JVM
    fold, non-overlapping (a merged token never re-pairs this round)."""
    merged = a + b
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a)
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe(
    df: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges from a corpus; returns the
    ordered merge list (earlier = higher priority). Stops early when no
    adjacent pair remains. Deterministic: ties on pair count break on the
    lexicographically smallest (a, b)."""
    words = (
        _word_counts(df, text_col, lowercase)
        .select("weight", _initial_symbols().alias("syms"))
        .localCheckpoint()
    )

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        n = F.size(F.col("syms"))
        pairs = words.where(n >= 2).select(
            "weight",
            F.explode(
                F.zip_with(
                    F.slice(F.col("syms"), 1, n - 1),
                    F.slice(F.col("syms"), 2, n - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("weight").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.select(
            "weight", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Add ``out_col``: array<string> of subword tokens for ``text_col``,
    applying the merge list by rank (lowest rank first — identical to the
    training order, so encode(train_corpus) reproduces the training
    segmentation). Merge ranks ride in the UDF closure; plan O(1) in the
    vocabulary size."""
    from ..functions.bpe import bpe_encode_udf

    enc = bpe_encode_udf(merges, lowercase=lowercase)
    return df.withColumn(out_col, enc(F.col(text_col)))
