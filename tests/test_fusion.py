"""Reciprocal-rank fusion (operators/fusion.py): pure-Python mirror of
the contribution arithmetic plus the edge cases that define RRF —
single-list docs, cross-list rank disagreement, deterministic ties."""

from decimal import Decimal

import pytest

from seafowl_spark.operators.fusion import (
    RRF_K,
    rank_topk,
    rrf_fuse,
    term_overlap_scores,
)


def _contrib(rank: int, k: int = RRF_K) -> Decimal:
    return Decimal(1.0 / (k + rank)).quantize(Decimal("0.000001"))


class TestRrfFuse:
    def _lists(self, spark):
        a = spark.createDataFrame(
            [(1, 10, 5.0), (1, 11, 3.0), (1, 12, 1.0)],
            ["query_id", "doc_id", "score"],
        )
        b = spark.createDataFrame(
            [(1, 11, 0.9), (1, 13, 0.8)],
            ["query_id", "doc_id", "score"],
        )
        return rank_topk(a, 10), rank_topk(b, 10)

    def test_values_match_python(self, spark):
        ra, rb = self._lists(spark)
        out = {
            r["doc_id"]: (r["score"], r["rank"])
            for r in rrf_fuse([ra, rb]).collect()
        }
        # a-ranks: 10->1, 11->2, 12->3 ; b-ranks: 11->1, 13->2
        want = {
            10: float(_contrib(1)),
            11: float(_contrib(2) + _contrib(1)),
            12: float(_contrib(3)),
            13: float(_contrib(2)),
        }
        assert set(out) == set(want)
        for d, s in want.items():
            assert out[d][0] == pytest.approx(s, abs=1e-12), d
        # doc 11 appears in both lists -> highest fused score
        assert out[11][1] == 1

    def test_single_list_doc_still_ranked(self, spark):
        ra, rb = self._lists(spark)
        out = {r["doc_id"]: r["rank"] for r in rrf_fuse([ra, rb]).collect()}
        assert 13 in out and 12 in out

    def test_equal_contrib_ties_break_by_id(self, spark):
        # docs 12 (rank 3 in a) and ... craft a tie: two docs each only in
        # one list at the same rank get identical scores -> id order
        a = spark.createDataFrame(
            [(1, 20, 2.0), (1, 21, 1.0)], ["query_id", "doc_id", "score"]
        )
        b = spark.createDataFrame(
            [(1, 30, 2.0), (1, 31, 1.0)], ["query_id", "doc_id", "score"]
        )
        out = rrf_fuse([rank_topk(a, 10), rank_topk(b, 10)]).collect()
        ranks = {r["doc_id"]: r["rank"] for r in out}
        assert ranks[20] < ranks[30]  # same contrib, lower id first
        assert ranks[21] < ranks[31]

    def test_topn_truncates(self, spark):
        ra, rb = self._lists(spark)
        out = rrf_fuse([ra, rb], topn=2).collect()
        assert len(out) == 2

    def test_per_query_independence(self, spark):
        a = spark.createDataFrame(
            [(1, 10, 5.0), (2, 10, 5.0), (2, 99, 9.0)],
            ["query_id", "doc_id", "score"],
        )
        out = {
            (r["query_id"], r["doc_id"]): r["rank"]
            for r in rrf_fuse([rank_topk(a, 10)]).collect()
        }
        assert out[(1, 10)] == 1
        assert out[(2, 99)] == 1 and out[(2, 10)] == 2


class TestTermOverlap:
    def test_distinct_terms_counted_once(self, spark):
        docs = spark.createDataFrame(
            [(1, "spark spark join"), (2, "join window"), (3, "nothing")],
            ["doc_id", "text"],
        )
        qs = spark.createDataFrame(
            [(1, "spark join")], ["query_id", "query_text"]
        )
        out = {
            r["doc_id"]: r["score"]
            for r in term_overlap_scores(docs, qs).collect()
        }
        assert out == {1: 2.0, 2: 1.0}  # doc 3 retrieved by nothing


class TestHybridServing:
    """The production hybrid shape end to end: a PERSISTED bucket-pruned
    BM25 index and a vector cosine ranking over the same id space, fused
    with RRF — the serving stack a retrieval deployment actually runs."""

    def test_bm25_index_plus_vector_list_fuse(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from seafowl_spark.functions import cosine_similarity
        from seafowl_spark.operators.bm25 import (
            bm25_topk,
            bm25_topk_indexed,
            write_bm25_index,
        )

        docs = spark.createDataFrame(
            [
                (1, "spark shuffle join window", [1.0, 0.0, 0.0]),
                (2, "join window rank", [0.9, 0.1, 0.0]),
                (3, "stream batch state", [0.0, 1.0, 0.0]),
                (4, "vector cosine search", [0.0, 0.9, 0.4]),
                (5, "unrelated prose entirely", [0.0, 0.0, 1.0]),
            ],
            ["doc_id", "text", "emb"],
        )
        qs = spark.createDataFrame(
            [(1, "spark join", [1.0, 0.05, 0.0])],
            ["query_id", "query_text", "q_emb"],
        )
        idx = str(tmp_path / "bm25_idx")
        write_bm25_index(docs.select("doc_id", "text"), idx, n_buckets=8)
        lex = bm25_topk_indexed(
            spark, idx, qs.select("query_id", "query_text"), k=3
        )
        # indexed serving == ad-hoc scoring (the persisted-index contract)
        adhoc = bm25_topk(
            docs.select("doc_id", "text"),
            qs.select("query_id", "query_text"),
            k=3,
        )
        assert sorted(map(tuple, lex.collect())) == sorted(
            map(tuple, adhoc.collect())
        )
        vec = rank_topk(
            docs.crossJoin(
                F.broadcast(qs.select("query_id", "q_emb"))
            ).select(
                "query_id",
                "doc_id",
                cosine_similarity(F.col("emb"), F.col("q_emb")).alias(
                    "score"
                ),
            ),
            top_k=3,
        )
        fused = rrf_fuse([lex, vec], topn=5)
        rows = {r["doc_id"]: r["rank"] for r in fused.collect()}
        # doc 1 tops both lists -> must top the fusion; doc 2 is second in
        # both; docs retrieved by only one list still appear
        assert rows[1] == 1 and rows[2] == 2
        assert len(rows) >= 3
