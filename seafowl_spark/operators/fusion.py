"""Reciprocal-rank fusion (RRF): merge ranked retrieval lists from
heterogeneous scorers into one hybrid ranking (Cormack et al., SIGIR
2009 — the standard hybrid-search combiner, used whenever BM25 and a
vector ANN list must fuse without score calibration).

RRF is rank-only: each list contributes ``1 / (k + rank)`` for the docs
it retrieved (k=60 in the paper), so incomparable score scales (BM25
sums vs cosines vs overlap counts) never need normalizing — exactly why
it is the production default for lexical+vector hybrid serving.

Shape at 100 TB: fusion runs over the RETRIEVED lists (n_queries x
top_k rows each), never the corpus — the expensive part is the upstream
retrievers (operators/bm25.py, operators/quantize.py ivf_quantized_topk,
operators/pq.py), which are already index-pruned. The fuse itself is a
union of tiny frames + one (query, doc) aggregate; its shuffle carries
lists x top_k rows per query. Contributions quantize at DECIMAL(25,6)
before summing (order-independent, engine-exact — the house float
discipline), and every rank breaks ties (score DESC, id) so the fused
ranking is deterministic end to end.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_K = 60


def rank_topk(
    df: DataFrame,
    top_k: int,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """(query, id, score, rank): deterministic per-query ranking
    (score DESC, id) truncated to each list's top_k — the retrieval
    contract every fusion input satisfies."""
    w = Window.partitionBy(query_col).orderBy(F.desc(score_col), id_col)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
    )


def rrf_fuse(
    lists: list[DataFrame],
    topn: int = 10,
    rrf_k: int = RRF_K,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fuse already-ranked lists (each with a ``rank`` column, e.g. from
    :func:`rank_topk`) into (query, id, score, rank) where score is the
    summed reciprocal-rank contribution and rank re-ranks the fusion
    (score DESC, id). A doc absent from a list simply contributes
    nothing for it — the paper's convention."""
    if not lists:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contribs = [
        lst.select(
            F.col(query_col),
            F.col(id_col),
            (F.lit(1).cast("double") / (F.lit(rrf_k) + F.col("rank")))
            .cast("decimal(25,6)")
            .alias("contrib"),
        )
        for lst in lists
    ]
    u = reduce(DataFrame.unionByName, contribs)
    fused = u.groupBy(query_col, id_col).agg(
        F.sum("contrib").cast("double").alias("score")
    )
    w = Window.partitionBy(query_col).orderBy(F.desc("score"), id_col)
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topn)
    )


def term_overlap_scores(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """(query, doc, score): the count of DISTINCT query terms a document
    contains — the simplest second retrieval signal (pure set overlap,
    deliberately uncalibrated against BM25: fusing it is the point).
    The query-term table broadcasts and semi-prunes the corpus token
    instances, so only matching (term, doc) rows ever aggregate."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            )
        ).alias("term"),
    )
    qterms = queries.select(
        F.col(query_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(query_text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("term"),
    ).distinct()
    return (
        toks.join(F.broadcast(qterms), "term")
        .groupBy(query_col, id_col)
        .agg(F.countDistinct("term").cast("double").alias("score"))
    )
