"""Hard-negative mining for retrieval/embedding training.

The standard contrastive-training data step (DPR / sentence-transformers
recipes): for each training query, retrieve top-k candidates with a
cheap retriever, drop the KNOWN positives, and keep the highest-ranked
survivors — documents that LOOK relevant but aren't labeled so, which
carry most of the training signal.

Composition of existing operators, no new distributed machinery:

* retrieval = :func:`operators.bm25.bm25_topk` (query-term semi-join,
  shuffle-free postings — its 100 TB shape), over-fetched by the
  positive count so dropping positives still leaves k rows;
* positives removal = one LEFT ANTI join on (query_id, doc_id) — the
  positives table is training data (queries x labels), broadcastable
  in any realistic regime, and Spark's planner does so on its own
  below the threshold;
* re-rank = one window per query over <= k + max_positives rows.

Determinism: BM25 scores are pure functions of the corpus; rank ties
break on doc id. Re-running mines the same negatives — the property
auditable training sets need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def mine_hard_negatives(
    docs: DataFrame,
    queries: DataFrame,
    positives: DataFrame,
    k: int = 10,
    overfetch: int | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
) -> DataFrame:
    """(query_id, doc_id, score, rank) of the top-k NON-positive
    retrieval hits per query. ``positives`` carries (query_id, doc_id)
    labeled-relevant pairs; ``overfetch`` (default k + the largest
    per-query positive count) sizes the retrieval depth so removal
    cannot starve a query of its k negatives."""
    from .bm25 import bm25_topk

    if overfetch is None:
        agg = positives.groupBy(query_id_col).agg(
            F.count(F.lit(1)).alias("n")
        )
        row = agg.agg(F.max("n")).collect()[0][0]  # 1-row scalar
        overfetch = k + int(row or 0)
    hits = bm25_topk(
        docs,
        queries,
        k=overfetch,
        k1=k1,
        b=b,
        text_col=text_col,
        id_col=id_col,
        query_text_col=query_text_col,
        query_id_col=query_id_col,
    )
    # bm25_topk emits the FIXED schema (query_id, doc_id, score, rank)
    # regardless of its input column names — restore the caller's names
    hits = hits.select(
        F.col("query_id").alias(query_id_col),
        F.col("doc_id").alias(id_col),
        "score",
        "rank",
    )
    return rerank_negatives(hits, positives, k, query_id_col, id_col)


def rerank_negatives(
    hits: DataFrame,
    positives: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """The positives-removal + re-rank tail of
    :func:`mine_hard_negatives`, split out (r13) so a caller that
    already holds the over-fetched retrieval list (q_bm25_search shares
    one per-doc score table across its ranking branches) reuses the
    exact anti-join/re-rank — the negative-mining semantics can never
    drift between the composed and the shared-scores path."""
    pos = positives.select(
        F.col(query_id_col).alias("__p_qid"), F.col(id_col).alias("__p_did")
    ).distinct()
    # positives are training labels (queries x labeled docs) — broadcast
    # EXPLICITLY: the frame is often derived (windows/aggregates), so the
    # planner can't size it and would fall back to a sort-merge anti-join
    # that shuffles the retrieval lists
    neg = hits.join(
        F.broadcast(pos),
        (hits[query_id_col] == pos.__p_qid) & (hits[id_col] == pos.__p_did),
        "left_anti",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        neg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )
