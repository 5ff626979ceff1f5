"""Paragraph-level exact deduplication (the CCNet/RefinedWeb shape):
drop every later occurrence of a duplicated PARAGRAPH corpus-wide,
keeping the first by (doc_id, position). The discrete sibling of
substring span dedup (operators/substring_dedup.py) — paragraphs are
natural units, so removal never cuts mid-sentence, and the hash space
is documents x paragraphs instead of documents x token-windows.

Scale: paragraph splitting + normalization + hashing are row-local
(codegen column chains); the ONE corpus-sized shuffle carries
(hash, doc, pos) triples — linear in paragraph count, independent of
paragraph length (the hash is 60-bit md5, never the text);
reassembly is a doc-keyed aggregate over the surviving paragraphs.
The same plan shape the span-dedup operator runs, so the 100 TB
argument carries over verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import md5_int


def _norm(col):
    """Normalization before hashing (CCNet: lowercase + whitespace
    collapse), so trivially reformatted copies still deduplicate."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def dedup_paragraphs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """(id, n_paragraphs, n_removed_paragraphs, clean_text): keep the
    FIRST corpus-wide occurrence (by id, then position) of each
    normalized paragraph; later occurrences are removed and the kept
    paragraphs rejoin in document order. Empty paragraphs pass through
    untouched (they are formatting, not content). NULL text is coalesced
    to '' before splitting so every input document appears in the output
    (split(NULL) -> NULL array would otherwise emit no rows under
    posexplode and silently drop the document)."""
    paras = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), F.lit(sep))
        ).alias("__pos", "__para"),
    )
    hashed = paras.withColumn("__norm", _norm(F.col("__para"))).withColumn(
        "__h",
        md5_int(F.col("__norm"), nhex=15),
    )
    w = Window.partitionBy("__h").orderBy("__id", "__pos")
    marked = hashed.withColumn(
        "__keep",
        (F.col("__norm") == "") | (F.row_number().over(w) == 1),
    )
    return (
        marked.groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_paragraphs"),
            F.count(F.when(~F.col("__keep"), F.lit(1))).alias(
                "n_removed_paragraphs"
            ),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__keep"),
                                F.struct("__pos", "__para"),
                            )
                        )
                    ),
                    lambda s: s["__para"],
                ),
                sep,
            ).alias("clean_text"),
        )
        .select(
            F.col("__id").alias(id_col),
            "n_paragraphs",
            "n_removed_paragraphs",
            "clean_text",
        )
    )
