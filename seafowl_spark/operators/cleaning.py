"""C4/RefinedWeb-style corpus cleaning: line-level rules and
cross-document boilerplate line removal.

Two stages every web-scale pretraining pipeline runs between raw text and
dedup (C4: Raffel et al. 2020 §2.2; RefinedWeb: Penedo et al. 2023 §3):

* :func:`clean_lines` — per-document line filters (terminal punctuation,
  minimum words, policy/boilerplate markers, brace-heavy code lines).
  Pure JVM array expressions over ``split(text, '\\n')`` — row-local, no
  shuffle, composes with the other per-doc text operators at scan cost.
* :func:`strip_boilerplate_lines` — corpus-global: a line whose hash
  occurs in more than ``max_doc_frac`` of documents (site headers,
  cookie banners, nav menus) is removed from EVERY document. One shuffle
  on the line hash to count, then a broadcast/shuffled semi-join back;
  the frequent-line set is tiny by construction (frequency threshold),
  so the join side Spark must replicate is bounded regardless of corpus
  size.

Thresholds follow C4's published rules where they exist (>= 3 words per
line, terminal punctuation, "lorem ipsum" / "javascript" / policy-phrase
blocklists) and are keyword arguments so a pipeline can tighten them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# C4 drops any line containing one of these (lower-cased match) and any
# DOCUMENT containing the policy phrases / lorem ipsum / curly braces
LINE_BLOCKLIST = ("javascript", "cookie policy", "terms of use", "privacy policy")
DOC_BLOCKLIST = ("lorem ipsum",)

TERMINAL_PUNCT = (".", "!", "?", '"', "'")


def _line_ok(
    line: Column,
    min_words: int,
    blocklist: tuple[str, ...],
) -> Column:
    lw = F.lower(line)
    ends_ok = F.lit(False)
    for p in TERMINAL_PUNCT:
        ends_ok = ends_ok | lw.endswith(p)
    blocked = F.lit(False)
    for b in blocklist:
        blocked = blocked | lw.contains(b)
    n_words = F.size(F.filter(F.split(F.trim(line), r"\s+"), lambda t: t != ""))
    return ends_ok & ~blocked & (n_words >= min_words)


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    blocklist: tuple[str, ...] = LINE_BLOCKLIST,
) -> DataFrame:
    """Apply C4's line-level rules: keep lines that end in terminal
    punctuation, have at least ``min_words`` words, and contain no
    blocklisted marker. Adds:

    * ``clean_text`` — surviving lines re-joined with ``\\n``;
    * ``n_lines`` / ``n_kept_lines`` — before/after counts;
    * ``doc_blocked`` — document-level kill switch (curly brace or a
      DOC_BLOCKLIST phrase anywhere — C4 drops the whole document).
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda ln: _line_ok(ln, min_words, blocklist))
    low = F.lower(F.col(text_col))
    # C4's rule is CURLY BRACES — either one flags the document (a doc
    # containing only '}' is just as code-like as one with '{')
    doc_blocked = low.contains("{") | low.contains("}")
    for b in DOC_BLOCKLIST:
        doc_blocked = doc_blocked | low.contains(b)
    return df.select(
        "*",
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
        doc_blocked.alias("doc_blocked"),
    )


def frequent_lines(
    df: DataFrame,
    doc_count: int,
    text_col: str = "text",
    max_doc_frac: float = 0.01,
    min_words: int = 1,
) -> DataFrame:
    """Lines (by exact text) occurring in more than ``max_doc_frac`` of
    documents: ``(line, n_docs)``. Distinct per doc first so one spammy
    document can't promote its own refrain to boilerplate."""
    lines = (
        df.select(F.explode(F.array_distinct(F.split(F.col(text_col), "\n"))).alias("line"))
        .where(F.trim(F.col("line")) != "")
        .where(
            F.size(F.filter(F.split(F.trim(F.col("line")), r"\s+"), lambda t: t != ""))
            >= min_words
        )
    )
    threshold = max(int(doc_count * max_doc_frac), 1)
    return (
        lines.groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") > threshold)
    )


def strip_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    max_doc_frac: float = 0.01,
    broadcast_max_lines: int = 4096,
    approx_capacity: int | None = None,
) -> DataFrame:
    """Remove corpus-frequent lines from every document.

    ``approx_capacity`` picks the frequent-line finder: None (default)
    counts distinct lines exactly; a capacity routes through the
    Misra-Gries finder (:func:`frequent_lines_approx`), whose shuffle is
    bounded at capacity x partitions rows — the 100 TB path when the
    distinct-line universe itself is too large to shuffle. With
    ``capacity >= (avg distinct lines per doc) / max_doc_frac`` the two
    finders return the SAME frequent set (survivors are exact-recounted
    before thresholding), so the strip output is identical.

    Scale shape: the count is one hash-partitioned shuffle over DISTINCT
    lines (tiny next to the corpus). When the frequent set fits
    ``broadcast_max_lines`` — the overwhelmingly common case, since it is
    bounded by lines that repeat across >1% of documents — it broadcasts
    as one array and the strip is a row-local ``array_contains`` filter:
    the corpus text itself never shuffles, so the operator costs one scan
    at 100 TB. Only a pathologically large frequent set falls back to the
    explode -> anti-membership join -> positional rebuild, which shuffles
    exploded lines on the line text.

    Adds ``stripped_text`` and ``n_boilerplate_removed``.
    """
    doc_count = df.count()
    if approx_capacity is None:
        freq = frequent_lines(df, doc_count, text_col, max_doc_frac)
    else:
        freq = frequent_lines_approx(
            df, doc_count, text_col, max_doc_frac, capacity=approx_capacity
        )
    lines = F.split(F.col(text_col), "\n")

    # materialize the candidate frequent set once (<= broadcast_max_lines+1
    # rows): the count gate and the broadcast agg below are separate
    # ACTIONS, and without this each re-runs the whole finder — including
    # its corpus-sized scan(s) — from scratch
    top = (
        freq.orderBy(F.desc("n_docs"), "line")
        .limit(broadcast_max_lines + 1)
        .localCheckpoint()
    )
    if top.count() <= broadcast_max_lines:
        boiler = top.agg(F.collect_list("line").alias("__boiler_lines"))
        kept = F.filter(
            lines, lambda ln: ~F.array_contains(F.col("__boiler_lines"), ln)
        )
        return (
            df.crossJoin(F.broadcast(boiler))
            .select(
                *df.columns,
                F.array_join(kept, "\n").alias("stripped_text"),
                (F.size(lines) - F.size(kept)).cast("long").alias(
                    "n_boilerplate_removed"
                ),
            )
        )

    # fallback: frequent set too large to broadcast — membership via join
    with_id = df.withColumn("__row", F.monotonically_increasing_id())
    exploded = with_id.select(
        "__row", F.posexplode(lines).alias("__pos", "__line")
    )
    joined = exploded.join(
        freq.select(F.col("line").alias("__line"), F.lit(True).alias("__boiler")),
        "__line",
        "left",
    )
    rebuilt = (
        joined.groupBy("__row")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__boiler").isNull(),
                                F.struct(F.col("__pos"), F.col("__line")),
                            )
                        )
                    ),
                    lambda s: s["__line"],
                ),
                "\n",
            ).alias("stripped_text"),
            F.sum(F.when(F.col("__boiler").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_boilerplate_removed"),
        )
    )
    return with_id.join(rebuilt, "__row").drop("__row")


def frequent_lines_approx(
    df: DataFrame,
    doc_count: int,
    text_col: str = "text",
    max_doc_frac: float = 0.01,
    min_words: int = 1,
    capacity: int | str = 4096,
) -> DataFrame:
    """Misra-Gries variant of :func:`frequent_lines` for corpora whose
    DISTINCT-line universe is itself too large to shuffle comfortably
    (every unique page footer, timestamped banner, ...). The per-partition
    summary caps the shuffle at ``capacity`` x partitions rows. The MG
    survival threshold is ``total_exploded_rows / (capacity + 1)`` where
    total counts (doc, distinct-line) pairs — NOT documents — so with
    ``L`` = average distinct lines per document, a line appearing in
    > ``max_doc_frac`` of docs is guaranteed to survive (and the finder
    returns the SAME frequent set as the exact one, survivors being
    exact-recounted before thresholding — see operators/heavy_hitters.py)
    whenever ``capacity >= L / max_doc_frac``. The default 4096 covers
    L <= ~40 at the default 1% threshold; beyond that, frequent lines
    near the threshold may be missed. ``capacity="auto"`` MEASURES L
    (one count over the exploded lines, already the frame this operator
    builds) and sizes ``capacity = 2L / max_doc_frac`` — the exactness
    guarantee then holds by construction at any document length, at the
    cost of that one extra counting pass."""
    from .heavy_hitters import approx_top_k

    lines = (
        df.select(
            F.explode(
                F.array_distinct(F.split(F.col(text_col), "\n"))
            ).alias("line")
        )
        .where(F.trim(F.col("line")) != "")
        .where(
            F.size(
                F.filter(F.split(F.trim(F.col("line")), r"\s+"), lambda t: t != "")
            )
            >= min_words
        )
    )
    if capacity == "auto":
        n_lines = lines.count()
        l_per_doc = n_lines / max(doc_count, 1)
        capacity = max(1024, int(2 * l_per_doc / max_doc_frac) + 1)
    elif not isinstance(capacity, int):
        raise ValueError(f"capacity must be an int or 'auto', got {capacity!r}")
    threshold = max(int(doc_count * max_doc_frac), 1)
    return (
        approx_top_k(lines, "line", k=capacity, capacity=capacity)
        .where(F.col("exact_weight") > threshold)
        .select(
            F.col("item").alias("line"),
            F.col("exact_weight").alias("n_docs"),
        )
    )
