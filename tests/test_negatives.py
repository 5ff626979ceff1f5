"""Hard-negative mining (operators/negatives.py, r8 session D): BM25
retrieval minus labeled positives, deterministic per-query top-k."""

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.negatives import mine_hard_negatives

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "text")
    )


@pytest.fixture(scope="module")
def queries(spark, corpus):
    return (
        corpus.where(F.col("doc_id") < 4)
        .select(
            F.col("doc_id").alias("query_id"),
            F.concat_ws(
                " ", F.slice(F.split(F.lower("text"), r"\s+"), 1, 5)
            ).alias("query_text"),
        )
    )


class TestHardNegatives:
    def test_positives_never_mined(self, spark, corpus, queries):
        # label each query's own document (and doc 7) as positive
        pos = queries.select(
            "query_id", F.col("query_id").alias("doc_id")
        ).unionAll(
            queries.select("query_id", F.lit(7).alias("doc_id"))
        )
        out = mine_hard_negatives(corpus, queries, pos, k=5)
        mined = {(r["query_id"], r["doc_id"]) for r in out.collect()}
        banned = {(r["query_id"], r["doc_id"]) for r in pos.collect()}
        assert mined and not (mined & banned)

    def test_k_and_rank_shape(self, spark, corpus, queries):
        pos = queries.select("query_id", F.col("query_id").alias("doc_id"))
        out = mine_hard_negatives(corpus, queries, pos, k=3).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        for q, ranks in per_q.items():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
            assert len(ranks) <= 3

    def test_deterministic(self, spark, corpus, queries):
        pos = queries.select("query_id", F.col("query_id").alias("doc_id"))
        a = sorted(map(tuple, mine_hard_negatives(corpus, queries, pos, k=4).collect()))
        b = sorted(map(tuple, mine_hard_negatives(corpus, queries, pos, k=4).collect()))
        assert a == b

    def test_negatives_are_subset_of_plain_retrieval(self, spark, corpus, queries):
        from seafowl_spark.operators.bm25 import bm25_topk

        pos = queries.select("query_id", F.col("query_id").alias("doc_id"))
        k = 4
        neg = {
            (r["query_id"], r["doc_id"])
            for r in mine_hard_negatives(corpus, queries, pos, k=k).collect()
        }
        deep = {
            (r["query_id"], r["doc_id"])
            for r in bm25_topk(corpus, queries, k=k + 1).collect()
        }
        assert neg <= deep

    def test_custom_column_names(self, spark, corpus, queries):
        docs2 = corpus.withColumnsRenamed({"doc_id": "docid"})
        q2 = queries.withColumnsRenamed(
            {"query_id": "qid", "query_text": "qtext"}
        )
        pos = q2.select("qid", F.col("qid").alias("docid"))
        out = mine_hard_negatives(
            docs2, q2, pos, k=3,
            id_col="docid", query_id_col="qid", query_text_col="qtext",
        )
        assert set(out.columns) == {"qid", "docid", "score", "rank"}
        assert out.count() > 0
