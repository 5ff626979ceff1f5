"""Exact substring deduplication (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better").

Documents often share long verbatim spans (licenses, boilerplate, quoted
articles) that whole-document and near-dup passes both miss. The
single-node reference implementation builds a suffix array; the
Spark-native factoring is span hashing:

* every ``span_tokens``-token window of every document hashes to one
  md5-derived value — emitted row-local (sequence + transform, no
  explode of the text itself beyond the span rows);
* one hash-keyed aggregate finds spans occurring >= ``min_dups`` times
  corpus-wide (THE corpus-sized shuffle; its payload is (hash, doc, pos)
  triples, independent of span length — this is the operator's scale
  cost and it is linear);
* a keep-first policy ranks occurrences (ROW_NUMBER over (doc_id, pos))
  so exactly one copy of every duplicated span survives;
* per-document removal merges the doomed spans' overlapping intervals
  with a sorted fold and drops the covered tokens, rebuilding the text.

Cost note (fixed in r7 — formerly an O(tokens x covered_tokens)
array_contains mask): the merged intervals are sorted and disjoint, so
the surviving text is exactly the GAP slices between them — rebuilt with
one zip_with + slice pass, O(tokens + intervals) per document. Even a
wall-to-wall-duplicate document costs linear time now.

Stride: ``stride=1`` catches every duplicated window (exact semantics);
larger strides trade recall for an N/stride smaller shuffle, the
standard production compromise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _tokens(col):
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def find_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 20,
    min_dups: int = 2,
    stride: int = 1,
) -> DataFrame:
    """(span_hash, doc_id, pos, n_occurrences, keep) — every occurrence
    of every token span appearing >= min_dups times corpus-wide; the
    first occurrence (lowest (doc_id, pos)) is flagged ``keep``."""
    # span hashing in ONE Arrow pass (r14, guide §4.2): the former JVM
    # transform lambda (slice + array_join + md5 per window) executed
    # interpreted per span — 14 s of task CPU at sf0.1, the operator's
    # hottest stage. Values are bit-identical (functions/vec.span_hashes_udf
    # docstring has the proof); 15 hex digits = 60 bits, collision-safe
    # for any real corpus while staying inside a signed 64-bit long.
    # The < span_tokens pre-filter lives inside the UDF (empty array,
    # dropped by explode).
    from ..functions.vec import span_hashes_udf

    spans_of = span_hashes_udf(span_tokens, stride, nhex=15)
    occ = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(spans_of(F.col(text_col))).alias("sp"),
    ).select("sp.span_hash", "doc_id", "sp.pos")
    w_cnt = Window.partitionBy("span_hash")
    w_rank = Window.partitionBy("span_hash").orderBy("doc_id", "pos")
    return (
        occ.withColumn("n_occurrences", F.count(F.lit(1)).over(w_cnt))
        .where(F.col("n_occurrences") >= min_dups)
        .withColumn("keep", F.row_number().over(w_rank) == 1)
        .select("span_hash", "doc_id", "pos", "n_occurrences", "keep")
    )


def remove_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 20,
    min_dups: int = 2,
    stride: int = 1,
) -> DataFrame:
    """Rewrite every document with non-first duplicated spans removed.

    Output: (id, text, n_tokens, n_removed_tokens, clean_text). Interval
    merging is a sorted JVM fold, so nested/overlapping doomed spans
    remove each covered token exactly once.
    """
    spans = find_repeated_spans(
        df, text_col, id_col, span_tokens, min_dups, stride
    )
    doomed = (
        spans.where(~F.col("keep"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("pos")).alias("starts"))
    )
    # no broadcast hint: the doomed set scales with duplicated coverage
    # (worst case corpus-sized), so the planner must stay free to pick a
    # shuffled join when it outgrows the broadcast threshold
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias(text_col),
    ).join(doomed, "doc_id", "left")

    # stage: token array and covered-index set each computed once per row
    # (the covered expression referenced inside the keep-filter lambda
    # would otherwise re-run the whole interval merge per TOKEN)
    base = base.select(
        "doc_id", text_col, "starts", _tokens(F.col(text_col)).alias("__toks")
    )
    # merge [s, s+span) intervals over the sorted starts
    intervals = F.aggregate(
        F.coalesce(F.col("starts"), F.array().cast("array<int>")),
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(
                            F.element_at(acc, -1)["e"], s + span_tokens
                        ).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(F.struct(s.alias("s"), (s + span_tokens).alias("e"))),
            )
        ),
    )
    base = base.select("doc_id", text_col, "__toks", intervals.alias("__iv"))
    tcol, iv = F.col("__toks"), F.col("__iv")
    n = F.size(tcol)
    # merged intervals are sorted and DISJOINT, so the kept text is the
    # gap slices between them: [0, s1) ∪ [e1, s2) ∪ ... ∪ [e_last, n).
    # One zip_with over (interval ends ∪ {0}) x (interval starts ∪ {n})
    # and one slice per gap — O(tokens + intervals), no per-token scan.
    gap_los = F.concat(
        F.array(F.lit(0)), F.transform(iv, lambda x: x["e"])
    )
    gap_his = F.concat(F.transform(iv, lambda x: x["s"]), F.array(n))
    kept = F.flatten(
        F.zip_with(
            gap_los,
            gap_his,
            lambda lo, hi: F.slice(tcol, lo + 1, F.greatest(hi - lo, F.lit(0))),
        )
    )
    n_removed = F.aggregate(
        iv, F.lit(0), lambda acc, x: acc + (x["e"] - x["s"])
    )
    return base.select(
        "doc_id",
        F.col(text_col),
        n.cast("long").alias("n_tokens"),
        n_removed.cast("long").alias("n_removed_tokens"),
        F.array_join(kept, " ").alias("clean_text"),
    )
