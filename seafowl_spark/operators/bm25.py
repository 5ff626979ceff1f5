"""Distributed BM25 full-text ranking.

The retrieval half of a training-data pipeline: given a corpus and a batch
of keyword queries, return the top-k documents per query under BM25
(Robertson/Spärck Jones; the scoring function Lucene/Elasticsearch and the
common-crawl curation stacks use for seed-document retrieval and
decontamination lookups). The reference engine has no text ranking — this
extends the LLM-pipeline suite the way s_ann_* extends it for embeddings.

Spark-first shape, stage by stage:

* **Postings are row-local.** Per-document (term, tf) pairs come from one
  ``array_sort`` + run-length projection (the same sorted-fold idiom as
  repetition.py — O(n log n) per doc, JVM codegen, NO shuffle of token
  instances). Exploding those pairs yields the postings relation at scan
  cost; at 100 TB you'd persist it once, bucketed by term, and every
  query batch below becomes bucket-local.
* **Corpus work is pruned by the query terms FIRST.** The distinct query
  terms broadcast into a semi-join against postings, so document
  frequencies and scores are only ever computed for terms a query
  mentions — df over the pruned postings still counts every document
  containing the term, so the values match a full-corpus computation.
* **Everything that joins is broadcast.** Query terms and the one-row
  corpus stats are tiny; the corpus side never shuffles for a join
  (plan-gated in tests). Document frequency derives from a term-keyed
  COUNT window over the pruned candidates (one pass — re-evaluating the
  postings projection for a df aggregate measured 4.5x slower), so the
  hash exchanges carry query-pruned candidates and (query_id, doc) pairs
  — bounded by matches, not corpus.

Determinism: idf uses the BM25+ style ``ln(1 + (N - df + 0.5)/(df + 0.5))``
(always positive, no disappearing terms); per-doc scores sum through a
decimal cast (order-independent) and ties break by doc_id, so top-k is
stable and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tokens(col: Column, lowercase: bool = True) -> Column:
    base = F.lower(col) if lowercase else col
    return F.filter(F.split(base, r"\s+"), lambda t: t != "")


def build_postings(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """``(postings, dfreq, stats)`` for a corpus.

    postings: (term, doc_id, tf, dl) — term frequency + doc length,
              computed row-local (no shuffle; see module docstring);
    dfreq:    (term, df)             — number of docs containing term
              (one term-keyed aggregate with map-side partials);
    stats:    (n_docs, avgdl)        — one row, corpus-level.

    The sorted array and the run-start index list are MATERIALIZED as
    intermediate columns, staged so each is computed once per row.
    Inlining them into the downstream lambdas re-evaluates the full
    array_sort per ELEMENT (lambda bodies are not common-subexpression
    eliminated) — the original formulation was O(n^2 log n) per document
    and 60x slower at sf0.1; CollapseProject keeps the staging because it
    refuses to duplicate non-cheap multiply-referenced expressions.
    """
    toks = _tokens(F.col(text_col))
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("dl"),
        F.array_sort(toks).alias("__srt"),
    )
    srt = F.col("__srt")
    staged = staged.select(
        "doc_id",
        "dl",
        "__srt",
        F.filter(
            F.sequence(F.lit(0), F.greatest(F.col("dl"), F.lit(1)) - 1),
            lambda i: (i == 0)
            | (F.element_at(srt, i + 1) != F.element_at(srt, i)),
        ).alias("__starts"),
    )
    starts = F.col("__starts")
    pairs = F.zip_with(
        starts,
        F.concat(
            F.slice(starts, 2, F.size(starts) - 1), F.array(F.col("dl"))
        ),
        lambda s, e: F.struct(
            F.element_at(srt, s + 1).alias("term"), (e - s).alias("tf")
        ),
    )
    postings = staged.select(
        "doc_id",
        "dl",
        F.explode(
            F.when(F.col("dl") > 0, pairs).otherwise(
                F.array().cast("array<struct<term:string,tf:int>>")
            )
        ).alias("p"),
    ).select("p.term", "doc_id", "p.tf", "dl")
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(toks)).alias("avgdl"),
    )
    return postings, dfreq, stats


def _field_tokens(fname: str) -> Column:
    # a NULL field is an EMPTY field: without the coalesce one NULL
    # column would NULL the whole document's weighted length and drop
    # its other fields' postings on the floor
    return F.coalesce(
        _tokens(F.col(fname)), F.array().cast("array<string>")
    )


def _weighted_dl(fields: list[tuple[str, float]]) -> Column:
    out = None
    for fname, w in fields:
        term = F.lit(float(w)) * F.size(_field_tokens(fname))
        out = term if out is None else out + term
    return out


def build_postings_fielded(
    docs: DataFrame,
    fields: list[tuple[str, float]],
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """``(postings, stats)`` for a MULTI-FIELD corpus under the weighted
    field model (simple BM25F: title/body style boosts).

    Per document, each field contributes ``weight x tf`` to a combined
    term frequency and ``weight x field_length`` to a combined document
    length; scoring then runs the ordinary BM25 formula over the
    combined (tfw, dlw) — so a title hit outranks the same hit buried in
    the body, with ONE idf per term (a document counts toward df when
    the term appears in ANY field).

    Shape: exactly as row-local as the single-field build. Each field
    runs the same staged sort + run-length projection into a
    ``map<term, tf>``; the weighted merge walks the union of the maps'
    key sets with ``try_element_at`` lookups (fields are few — 2-3 —
    so the per-term merge cost is a handful of map probes). NO shuffle
    anywhere before the explode; df/stats aggregate exactly like the
    single-field path.
    """
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        _weighted_dl(fields).alias("dlw"),
        *[
            F.array_sort(_field_tokens(fname)).alias(f"__srt{i}")
            for i, (fname, _w) in enumerate(fields)
        ],
    )
    # per-field run-length starts, staged (lambda bodies are not CSE'd).
    # Closures come from factory functions: a `s=srt` default arg would
    # count as a lambda PARAMETER and flip F.filter/F.zip_with into
    # their higher-arity variants.
    def _starts_pred(s):
        return lambda j: (j == 0) | (
            F.element_at(s, j + 1) != F.element_at(s, j)
        )

    def _run_pair(s):
        return lambda a, e: F.struct(
            F.element_at(s, a + 1).alias("term"), (e - a).alias("tf")
        )

    starts_cols = []
    for i in range(len(fields)):
        srt = F.col(f"__srt{i}")
        starts_cols.append(
            F.filter(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size(srt), F.lit(1)) - 1,
                ),
                _starts_pred(srt),
            ).alias(f"__starts{i}")
        )
    staged = staged.select("*", *starts_cols)
    # per-field map<term, tf> from the run-length pairs
    map_cols = []
    for i in range(len(fields)):
        srt, starts = F.col(f"__srt{i}"), F.col(f"__starts{i}")
        pairs = F.zip_with(
            starts,
            F.concat(
                F.slice(starts, 2, F.size(starts) - 1),
                F.array(F.size(srt)),
            ),
            _run_pair(srt),
        )
        map_cols.append(
            F.map_from_entries(
                F.when(F.size(srt) > 0, pairs).otherwise(
                    F.array().cast("array<struct<term:string,tf:int>>")
                )
            ).alias(f"__map{i}")
        )
    staged = staged.select("doc_id", "dlw", *map_cols)
    # union of the fields' term sets, then the weighted merge
    staged = staged.select(
        "doc_id",
        "dlw",
        *[F.col(f"__map{i}") for i in range(len(fields))],
        F.array_distinct(
            F.concat(
                *[F.map_keys(F.col(f"__map{i}")) for i in range(len(fields))]
            )
        ).alias("__terms"),
    )

    def _tfw(t: Column) -> Column:
        out = None
        for i, (_fname, w) in enumerate(fields):
            term = F.lit(float(w)) * F.coalesce(
                F.try_element_at(F.col(f"__map{i}"), t), F.lit(0)
            )
            out = term if out is None else out + term
        return out

    merged = F.transform(
        F.col("__terms"),
        lambda t: F.struct(t.alias("term"), _tfw(t).alias("tf")),
    )
    postings = staged.select(
        "doc_id",
        F.col("dlw").cast("double").alias("dl"),
        F.explode(
            F.when(F.size("__terms") > 0, merged).otherwise(
                F.array().cast("array<struct<term:string,tf:double>>")
            )
        ).alias("p"),
    ).select("p.term", "doc_id", F.col("p.tf").cast("double").alias("tf"), "dl")
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(_weighted_dl(fields).cast("double")).alias("avgdl"),
    )
    return postings, stats


def bm25f_topk(
    docs: DataFrame,
    queries: DataFrame,
    fields: list[tuple[str, float]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    query_text_col: str = "query_text",
    query_id_col: str = "query_id",
    match_all: bool = False,
) -> DataFrame:
    """Top-k per query under weighted multi-field BM25 (see
    :func:`build_postings_fielded`); same scoring tail as single-field,
    so the formula/tie-break can never drift between the variants."""
    postings, stats = build_postings_fielded(docs, fields, id_col)
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(_tokens(F.col(query_text_col))).alias("term"),
    ).distinct()
    return _score_and_rank(postings, qterms, stats, k, k1, b,
                           df_via_window=True, match_all=match_all)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "query_text",
    query_id_col: str = "query_id",
    match_all: bool = False,
) -> DataFrame:
    """Top-k ``(query_id, doc_id, score, rank)`` per query under BM25.

    The query side deduplicates to (query_id, term) before joining, so a
    term repeated inside one query counts once (standard bag-of-words
    query semantics; repeat weighting belongs in the query builder).
    ``match_all=True`` ranks only documents containing EVERY distinct
    query term (AND semantics — see :func:`_score_and_rank`).
    """
    postings, _dfreq, stats = build_postings(docs, text_col, id_col)
    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(_tokens(F.col(query_text_col))).alias("term"),
    ).distinct()

    return _score_and_rank(postings, qterms, stats, k, k1, b,
                           df_via_window=True, match_all=match_all)


def score_per_doc(
    postings: DataFrame,
    qterms: DataFrame,
    stats: DataFrame,
    k1: float,
    b: float,
    df_via_window: bool = True,
) -> DataFrame:
    """The scoring HALF of :func:`_score_and_rank`: prune postings to
    query terms, compute df over the pruned set, BM25-score each
    (query, doc, term), decimal-sum per doc. Returns
    ``(query_id, doc_id, score, __nterms)`` — __nterms is the distinct
    matched-term count (postings carry one row per (term, doc), so a
    plain COUNT is the distinct count). Split out (r13) so a caller
    ranking the SAME corpus/query batch several ways (plain, AND-mode,
    term-overlap, over-fetched negative mining — q_bm25_search does all
    four) can compute the per-doc scores ONCE instead of once per
    ranking; :func:`rank_and_cut` is the other half.

    ``df_via_window`` picks how per-term document frequency derives:

    * True (ad-hoc default): a COUNT() window over the term — ONE pass
      over the pruned candidates. The alternative re-evaluates the
      postings subtree (the expensive row-local projection) a second
      time for the df aggregate: measured 4.5x slower end-to-end. Cost:
      the window shuffles candidates BY TERM, so a stop-word query term
      concentrates its postings in one partition — filter stop-words
      from queries, as any posting-list system expects.
    * False (indexed default): aggregate + broadcast — two reads of the
      pruned index partitions (cheap: column-pruned parquet), zero term
      skew.
    """
    # prune the corpus to query terms before ANY per-term work; df over
    # the pruned postings still sees every doc containing the term
    cand = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    if df_via_window:
        cand = cand.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        with_df = cand.join(F.broadcast(qterms), "term")
    else:
        dfreq_q = cand.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        with_df = cand.join(F.broadcast(qterms), "term").join(
            F.broadcast(dfreq_q), "term"
        )

    scored = (
        with_df
        .crossJoin(F.broadcast(stats.select("n_docs", "avgdl")))
        .select(
            "query_id",
            "doc_id",
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return scored.groupBy("query_id", "doc_id").agg(
        F.sum(F.col("term_score").cast("decimal(25,6)"))
        .cast("double")
        .alias("score"),
        # distinct terms are free to count here (postings carry one row
        # per (term, doc)), and the column is dropped again in
        # rank_and_cut for OR mode
        F.count(F.lit(1)).alias("__nterms"),
    )


def rank_and_cut(
    per_doc: DataFrame,
    k: int,
    match_all: bool = False,
    qterms: DataFrame | None = None,
) -> DataFrame:
    """The ranking HALF of :func:`_score_and_rank`: optional AND-mode
    filter, deterministic (score DESC, doc_id) window rank, cut at k.

    ``match_all`` switches OR semantics (any query term may contribute,
    the BM25 default) to AND semantics: only documents containing EVERY
    distinct term of the query are ranked (requires ``qterms``). The
    filter is a per-(query, doc) distinct-matched-term count compared to
    the query's own distinct term count (broadcast, |queries| rows) —
    it composes with the same pruned candidate set, so AND mode never
    reads more than OR mode."""
    if match_all:
        if qterms is None:
            raise ValueError("match_all ranking needs the qterms frame")
        qn = qterms.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("__qn")  # qterms is already distinct
        )
        per_doc = per_doc.join(F.broadcast(qn), "query_id").where(
            F.col("__nterms") == F.col("__qn")
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "score", F.col("rank").cast("long").alias("rank")
        )
    )


def _score_and_rank(
    postings: DataFrame,
    qterms: DataFrame,
    stats: DataFrame,
    k: int,
    k1: float,
    b: float,
    df_via_window: bool = True,
    match_all: bool = False,
) -> DataFrame:
    """The shared scoring tail of both retrieval variants — the
    composition of :func:`score_per_doc` and :func:`rank_and_cut`. One
    definition: the formula/tie-break can never drift between ad-hoc
    and indexed (or, since the r13 split, between the one-per_doc
    multi-ranking branches of q_bm25_search)."""
    per_doc = score_per_doc(postings, qterms, stats, k1, b, df_via_window)
    return rank_and_cut(per_doc, k, match_all=match_all, qterms=qterms)


# --------------------------------------------------------------------------
# Persisted index: write postings once, serve query batches with pruning
# --------------------------------------------------------------------------

def write_bm25_index(
    docs: DataFrame,
    path: str,
    n_buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    fields: list[tuple[str, float]] | None = None,
) -> None:
    """Materialize the inverted index: postings land under
    ``{path}/postings`` partitioned by a term-hash bucket, corpus stats
    under ``{path}/stats``. This is the 100 TB serving shape the ad-hoc
    :func:`bm25_topk` docstring promises — the corpus-sized work happens
    ONCE here; every query batch below reads only the partitions its
    terms hash into (partition pruning, no full-index scan).

    ``fields`` switches to the weighted multi-field build
    (:func:`build_postings_fielded`); the field spec persists in the
    stats sidecar so appends replay the same weighting without the
    caller re-supplying it."""
    from .index_tombstones import clear_tombstones

    clear_tombstones(path)  # a full build masks nothing
    if fields:
        postings, _stats = build_postings_fielded(docs, fields, id_col)
    else:
        postings, _dfreq, _stats = build_postings(docs, text_col, id_col)
    # bucket cast to INT: the sidecar DDL must match what partition-dir
    # inference always gave readers (an int), or every bucket filter in
    # existing plan gates changes attribute type
    bucketed = postings.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    ).withColumn(
        # build-time rows are epoch 0; incremental refreshes append at
        # later epochs so (id, epoch) tombstones can mask updated /
        # re-inserted documents' OLD rows only (index_tombstones.py)
        "epoch", F.lit(0).cast("long")
    )
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(
        f"{path}/postings"
    )
    # stats persist as MERGEABLE sums (doc count + total tokens), not the
    # final average, so appends can combine them without a corpus rescan
    _write_stats(
        docs, path, n_buckets, text_col, mode="overwrite",
        postings_ddl=_ddl(bucketed), fields=fields,
    )


def _ddl(df) -> str:
    """Schema as DDL text — persisted in the stats sidecar so the reader
    can open an EMPTY postings dir (an index built over an empty table
    writes no part files; schema inference would fail, r10 fuzz find)."""
    return ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )


def _write_stats(docs, path, n_buckets, text_col, mode, postings_ddl,
                 fields=None):
    import json as _json

    if fields:
        # weighted document length; total_dl is DOUBLE in fielded
        # indexes (fragments of one index are consistently typed)
        dl = _weighted_dl(fields).cast("double")
        fields_json = _json.dumps([[f, float(w)] for f, w in fields])
    else:
        dl = F.size(_tokens(F.col(text_col)))
        fields_json = None
    out = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(dl).alias("total_dl"),
    ).withColumn("n_buckets", F.lit(n_buckets)).withColumn(
        "postings_ddl", F.lit(postings_ddl)
    )
    if fields_json is not None:
        # only fielded indexes carry the column: adding a NULL column to
        # plain-index fragments would fork the sidecar schema across
        # fragments of pre-existing indexes
        out = out.withColumn("fields", F.lit(fields_json))
    out.write.mode(mode).parquet(f"{path}/stats")


def read_index_fields(spark, path: str) -> list[tuple[str, float]] | None:
    """The field spec a persisted index was built with (None for plain
    single-column indexes, including pre-fielded sidecars)."""
    import json as _json

    stats = spark.read.parquet(f"{path}/stats")
    if "fields" not in stats.columns:
        return None
    raw = stats.select("fields").first()[0]
    return [(f, float(w)) for f, w in _json.loads(raw)] if raw else None


def append_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    epoch: int = 0,
) -> None:
    """Incrementally add documents to an existing index: new postings
    append into the same term-hash partitions (no old-partition rewrite —
    parquet append only creates files in the buckets the new terms hash
    to) and a new stats fragment lands next to the existing ones; readers
    merge the fragments, so corpus-wide n_docs/avgdl stay exact. The
    corpus-sized work is proportional to the NEW documents only.

    A fielded index replays its OWN persisted field weighting (the
    sidecar is authoritative; ``text_col`` is ignored) — appended
    fragments can never mix weightings within one index."""
    spark = docs.sparkSession
    n_buckets = int(
        spark.read.parquet(f"{path}/stats").select("n_buckets").first()[0]
    )
    fields = read_index_fields(spark, path)
    if fields:
        postings, _stats = build_postings_fielded(docs, fields, id_col)
    else:
        postings, _dfreq, _stats = build_postings(docs, text_col, id_col)
    bucketed = postings.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
    ).withColumn("epoch", F.lit(int(epoch)).cast("long"))
    bucketed.write.mode("append").partitionBy("bucket").parquet(
        f"{path}/postings"
    )
    _write_stats(
        docs, path, n_buckets, text_col, mode="append",
        postings_ddl=_ddl(bucketed), fields=fields,
    )


def delete_from_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    epoch: int = 0,
) -> None:
    """Incrementally REMOVE documents from an existing index (the
    delete-aware half of the ingest shape; operators/index_tombstones.py
    has the model): the removed ids append to the tombstone mask and a
    NEGATIVE stats fragment lands next to the existing ones, so merged
    n_docs/avgdl equal a from-scratch rebuild exactly. The artifact's
    postings are untouched — lookups mask them out. A fielded index
    replays its own persisted weighting for the dl sums, same as
    :func:`append_bm25_index`."""
    from .index_tombstones import write_tombstones

    spark = docs.sparkSession
    head = (
        spark.read.parquet(f"{path}/stats")
        .select("n_buckets", "postings_ddl")
        .first()
    )
    n_buckets = int(head["n_buckets"])
    fields = read_index_fields(spark, path)
    if fields:
        dl = _weighted_dl(fields).cast("double")
    else:
        dl = F.size(_tokens(F.col(text_col)))
    neg = docs.agg(
        (-F.count(F.lit(1))).alias("n_docs"),
        (-F.coalesce(F.sum(dl), F.lit(0).cast("long"))).alias("total_dl"),
    ).withColumn("n_buckets", F.lit(n_buckets)).withColumn(
        # replicate the sidecar DDL so every fragment stays non-null and
        # the reader's F.first never lands on a null
        "postings_ddl", F.lit(head["postings_ddl"])
    )
    if fields:
        import json as _json

        neg = neg.withColumn(
            "fields",
            F.lit(_json.dumps([[f, float(w)] for f, w in fields])),
        )
    neg.write.mode("append").parquet(f"{path}/stats")
    write_tombstones(docs, path, id_col, epoch=epoch)


def compact_bm25_stats(spark, path: str) -> None:
    """Collapse the per-write stats fragments (one per append/delete)
    into a single row with the same merged sums. Every incremental
    refresh adds a fragment file, so a long-lived index accumulates
    thousands of tiny parquet files the reader must open per query —
    OPTIMIZE folds them. Staged + swapped like the postings rewrite."""
    import os
    import shutil

    src = f"{path}/stats"
    raw = spark.read.parquet(src)
    aggs = [
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_dl").alias("total_dl"),
        F.first("n_buckets").alias("n_buckets"),
        F.first("postings_ddl", ignorenulls=True).alias("postings_ddl"),
    ]
    if "fields" in raw.columns:
        aggs.append(F.first("fields", ignorenulls=True).alias("fields"))
    one = raw.agg(*aggs).coalesce(1)
    tmp = src + ".__compact"
    shutil.rmtree(tmp, ignore_errors=True)
    one.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(src)
    os.rename(tmp, src)


def bm25_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_text_col: str = "query_text",
    query_id_col: str = "query_id",
    match_all: bool = False,
) -> DataFrame:
    """Top-k retrieval against a persisted index. The postings scan
    carries a ``bucket IN (...)`` partition filter computed from the
    query batch's terms, so only the matching term-hash partitions are
    read (gate-tested via inputFiles) — query cost scales with the query
    batch, not the corpus. ``match_all=True`` = AND semantics over the
    same pruned partitions (see :func:`_score_and_rank`)."""
    # merge stats fragments (one per write/append) into corpus totals.
    # r13: the sidecar is bounded (one row per write), so the merge is a
    # driver-side pyarrow read when the store is locally visible — the
    # Spark agg+collect cost one job (3 stages) per lookup; the Spark
    # path remains the fallback for remote stores.
    from ..io import read_small_parquet

    local_rows = read_small_parquet(f"{path}/stats")
    if local_rows is not None:
        merged = {
            "n_docs": sum(r["n_docs"] or 0 for r in local_rows),
            "total_dl": sum(r["total_dl"] or 0 for r in local_rows),
            "n_buckets": local_rows[0]["n_buckets"] if local_rows else None,
        }
        has_ddl = any("postings_ddl" in r for r in local_rows)
        if has_ddl:
            merged["postings_ddl"] = next(
                (
                    r["postings_ddl"]
                    for r in local_rows
                    if r.get("postings_ddl")
                ),
                None,
            )
    else:
        raw_stats = spark.read.parquet(f"{path}/stats")
        aggs = [
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_dl").alias("total_dl"),
            F.first("n_buckets").alias("n_buckets"),
        ]
        has_ddl = "postings_ddl" in raw_stats.columns
        if has_ddl:
            aggs.append(F.first("postings_ddl").alias("postings_ddl"))
        merged = raw_stats.agg(*aggs).collect()[0]
    n_buckets = merged["n_buckets"]
    if n_buckets is None:
        # empty/corrupt stats sidecar: pmod(x, NULL) would yield NULL
        # buckets and int(None) a TypeError below (advisor find, r13) —
        # fail with the artifact named, like the missing-artifact path
        raise ValueError(
            f"BM25 index at {path} has no usable stats sidecar "
            "(n_buckets missing) — rebuild the index"
        )
    # r13: local one-row relation — createDataFrame builds a pickled-RDD
    # plan whose every scan spawns Python-worker tasks (see
    # engine/search_index.py lookup()); parameterized SQL plans as
    # OneRowRelation with exact double binding
    stats = spark.sql(
        "SELECT CAST(:n AS BIGINT) AS n_docs, CAST(:a AS DOUBLE) AS avgdl",
        args={
            "n": int(merged["n_docs"] or 0),
            "a": float(merged["total_dl"]) / merged["n_docs"]
            if merged["n_docs"]
            else 0.0,
        },
    )

    qterms = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(_tokens(F.col(query_text_col))).alias("term"),
    ).distinct()
    # bucket list straight off the query rows (r13): a per-row
    # transform+array_distinct Project folds driver-side when the batch
    # is a LocalRelation (the serving path), where the old
    # explode+distinct aggregate over qterms forced a cluster job per
    # lookup. Driver set-union dedups across rows; the bucket SET is
    # identical (same terms, same pmod(xxhash64)).
    bucket_rows = queries.select(
        F.array_distinct(
            F.transform(
                _tokens(F.col(query_text_col)),
                lambda t: F.pmod(F.xxhash64(t), F.lit(n_buckets)),
            )
        ).alias("b")
    ).collect()
    q_buckets = sorted({int(x) for r in bucket_rows for x in (r["b"] or [])})
    # an empty bucket list (no query terms) filters everything out but
    # keeps the REAL schema — no hardcoded empty-frame type that could
    # drift from the non-empty path. The explicit sidecar schema (when
    # present) lets an EMPTY postings dir read cleanly — an index built
    # over an empty table has no part files to infer from.
    reader = spark.read
    if has_ddl and merged["postings_ddl"]:
        reader = reader.schema(merged["postings_ddl"])
    postings = reader.parquet(f"{path}/postings").where(
        F.col("bucket").isin(q_buckets)
    )
    # delete-aware serving: mask tombstoned documents out of the PRUNED
    # candidates BEFORE df derives, so document frequencies (and with
    # the negative stats fragments, avgdl/n_docs) equal a from-scratch
    # rebuild bit-for-bit (operators/index_tombstones.py)
    from .index_tombstones import filter_tombstones

    postings = filter_tombstones(spark, path, postings, "doc_id")
    return _score_and_rank(
        postings, qterms, stats, k, k1, b, df_via_window=False,
        match_all=match_all,
    )
