"""Sequence packing (operators/packing.py) and int8 embedding quantization
(operators/quantize.py) over the testdata tables."""

from pyspark.sql import functions as F

from seafowl_spark.io import table
from seafowl_spark.operators.packing import pack_sequences
from seafowl_spark.operators.quantize import (
    quantize_int8,
    quantized_cosine,
)

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 512


class TestPackSequences:
    def _docs(self, spark):
        d = table(spark, SF_DIR, "documents")
        return d.select(
            "doc_id",
            F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias(
                "n_tokens"
            ),
        )

    def test_matches_sequential_reference(self, spark):
        docs = self._docs(spark)
        out = {
            r.doc_id: r
            for r in pack_sequences(
                docs, "n_tokens", ["doc_id"], BUDGET
            ).collect()
        }
        rows = sorted(
            ((r.doc_id, r.n_tokens) for r in docs.collect())
        )
        cum = 0
        for doc_id, n in rows:
            r = out[doc_id]
            assert r.pack_id == cum // BUDGET
            assert r.offset_in_pack == cum % BUDGET
            assert r.spans_boundary == (cum % BUDGET + n > BUDGET)
            cum += n

    def test_pack_fill_bounded(self, spark):
        out = pack_sequences(self._docs(spark), "n_tokens", ["doc_id"], BUDGET)
        fills = (
            out.groupBy("pack_id")
            .agg(F.sum("n_tokens").alias("toks"))
            .collect()
        )
        # chunking: every pack except the last holds >= budget worth of
        # starts+carry, i.e. first tokens of each pack fill the stream
        total = sum(r.toks for r in fills)
        n_packs = 1 + max(r.pack_id for r in fills)
        assert (n_packs - 1) * BUDGET < total <= n_packs * BUDGET + max(
            r.toks for r in fills
        )

    def test_sharded_packing_independent(self, spark):
        docs = self._docs(spark).withColumn("shard", F.col("doc_id") % 2)
        out = pack_sequences(
            docs, "n_tokens", ["doc_id"], BUDGET, shard_cols=["shard"]
        )
        # each shard starts its own pack 0 at offset 0
        firsts = (
            out.groupBy("shard")
            .agg(F.min("doc_id").alias("first"))
            .collect()
        )
        first_rows = {
            (r.shard, r.doc_id): r for r in out.collect()
        }
        for f in firsts:
            r = first_rows[(f.shard, f.first)]
            assert r.pack_id == 0 and r.offset_in_pack == 0

    def test_bad_budget_rejected(self, spark):
        import pytest

        with pytest.raises(ValueError):
            pack_sequences(self._docs(spark), "n_tokens", ["doc_id"], 0)


class TestQuantize:
    def test_quantization_bounds_and_scale(self, spark):
        e = table(spark, SF_DIR, "embeddings")
        q = quantize_int8(e, "embedding")
        row = q.select(
            F.max(F.array_max("q")).alias("hi"),
            F.min(F.array_min("q")).alias("lo"),
            F.min("q_scale").alias("smin"),
        ).collect()[0]
        assert row.hi <= 127 and row.lo >= -127
        assert row.smin > 0

    def test_quantized_cosine_close_to_exact(self, spark):
        from seafowl_spark.functions import cosine_similarity

        e = table(spark, SF_DIR, "embeddings").limit(30)
        q = quantize_int8(e, "embedding").select("vec_id", "embedding", "q")
        a = q.alias("a")
        b = q.alias("b")
        pairs = a.crossJoin(b).where(F.col("a.vec_id") < F.col("b.vec_id"))
        scored = pairs.select(
            cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias("exact"),
            quantized_cosine(F.col("a.q"), F.col("b.q")).alias("approx"),
        ).collect()
        worst = max(abs(r.exact - r.approx) for r in scored)
        assert worst < 0.02  # int8 keeps cosine within ~2e-2

    def test_topk_recall_vs_exact(self, spark):
        from seafowl_spark.functions import cosine_similarity

        e = table(spark, SF_DIR, "embeddings")
        q = quantize_int8(e, "embedding")
        query = q.where(F.col("vec_id") == 0).select(
            F.col("embedding").alias("qe"), F.col("q").alias("qq")
        )
        scored = (
            q.where(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(query))
            .select(
                "vec_id",
                cosine_similarity(F.col("embedding"), F.col("qe")).alias("exact"),
                quantized_cosine(F.col("q"), F.col("qq")).alias("approx"),
            )
            .collect()
        )
        top_exact = {r.vec_id for r in sorted(scored, key=lambda r: -r.exact)[:10]}
        top_approx = {r.vec_id for r in sorted(scored, key=lambda r: -r.approx)[:10]}
        assert len(top_exact & top_approx) >= 8  # recall@10 >= 0.8


class TestQuantizedAnnTopk:
    def _frames(self, spark):
        e = table(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        q = e.where(F.col("vec_id").isin([0, 1, 2])).select(
            F.col("vec_id").alias("query_id"), "emb"
        )
        return e, q

    def test_recall_vs_exact_bruteforce(self, spark):
        from seafowl_spark.functions import cosine_similarity
        from seafowl_spark.operators.quantize import ann_quantized_topk

        corpus, queries = self._frames(spark)
        approx = ann_quantized_topk(corpus, queries, k=10, shortlist=50)
        got = {}
        for r in approx.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])

        exact = (
            corpus.crossJoin(
                F.broadcast(
                    queries.select(
                        F.col("query_id"), F.col("emb").alias("q_emb")
                    )
                )
            )
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                "vec_id",
                cosine_similarity(F.col("emb"), F.col("q_emb")).alias("c"),
            )
            .collect()
        )
        by_q = {}
        for r in exact:
            by_q.setdefault(r["query_id"], []).append((r["c"], r["vec_id"]))
        for qid, scored in by_q.items():
            top = {v for _, v in sorted(scored, key=lambda t: (-t[0], t[1]))[:10]}
            assert len(got[qid] & top) >= 9  # recall@10 >= 0.9 w/ 5x shortlist

    def test_output_shape_and_ranks(self, spark):
        from seafowl_spark.operators.quantize import ann_quantized_topk

        corpus, queries = self._frames(spark)
        out = ann_quantized_topk(corpus, queries, k=5, shortlist=20).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert set(per_q) == {0, 1, 2}
        for ranks in per_q.values():
            assert sorted(ranks) == [1, 2, 3, 4, 5]


class TestIvfQuantizedTopk:
    def _frames(self, spark):
        e = table(spark, SF_DIR, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("emb")
        )
        q = e.where(F.col("vec_id").isin([0, 1, 2])).select(
            F.col("vec_id").alias("query_id"), "emb"
        )
        return e, q

    def test_recall_vs_exact_bruteforce(self, spark):
        from seafowl_spark.functions import cosine_similarity
        from seafowl_spark.operators.kmeans import fit_kmeans
        from seafowl_spark.operators.quantize import ivf_quantized_topk

        corpus, queries = self._frames(spark)
        cents = fit_kmeans(corpus, k=8, max_iter=5)
        approx = ivf_quantized_topk(
            corpus, queries, cents, k=10, nprobe=4, shortlist=50
        )
        got = {}
        for r in approx.collect():
            got.setdefault(r["query_id"], set()).add(r["vec_id"])

        exact = (
            corpus.crossJoin(
                F.broadcast(
                    queries.select(F.col("query_id"), F.col("emb").alias("q_emb"))
                )
            )
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                "vec_id",
                cosine_similarity(F.col("emb"), F.col("q_emb")).alias("c"),
            )
            .collect()
        )
        by_q = {}
        for r in exact:
            by_q.setdefault(r["query_id"], []).append((r["c"], r["vec_id"]))
        recalls = []
        for qid, scored in by_q.items():
            top = {v for _, v in sorted(scored, key=lambda t: (-t[0], t[1]))[:10]}
            recalls.append(len(got.get(qid, set()) & top) / 10)
        # probing half the cells: IVF loses candidates outside probed
        # cells, int8 coarse loses within — jointly still most of top-10
        assert sum(recalls) / len(recalls) >= 0.5, recalls

    def test_no_corpus_cross_join_in_plan(self, spark):
        """The whole point of the composed form: coarse scoring joins on
        the cell id — a corpus-wide cartesian anywhere in the plan means
        the composition regressed to brute force."""
        from seafowl_spark.operators.kmeans import fit_kmeans
        from seafowl_spark.operators.quantize import ivf_quantized_topk

        corpus, queries = self._frames(spark)
        cents = fit_kmeans(corpus, k=8, max_iter=2)
        out = ivf_quantized_topk(corpus, queries, cents, k=5, nprobe=2)
        out.count()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "cell" in plan  # coarse stage keyed on the IVF cell

    def test_ranks_contiguous(self, spark):
        from seafowl_spark.operators.kmeans import fit_kmeans
        from seafowl_spark.operators.quantize import ivf_quantized_topk

        corpus, queries = self._frames(spark)
        cents = fit_kmeans(corpus, k=4, max_iter=2)
        out = ivf_quantized_topk(corpus, queries, cents, k=5, nprobe=4).collect()
        per_q = {}
        for r in out:
            per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert set(per_q) == {0, 1, 2}
        for ranks in per_q.values():
            assert sorted(ranks) == [1, 2, 3, 4, 5]


class TestChunkDocuments:
    def test_cover_and_overlap(self, spark):
        from seafowl_spark.operators.packing import chunk_documents

        text = " ".join(f"w{i}" for i in range(300))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = sorted(
            chunk_documents(df, chunk_tokens=256, overlap=32).collect(),
            key=lambda r: r["chunk_id"],
        )
        assert [r["chunk_id"] for r in out] == [0, 1]
        assert out[0]["n_chunk_tokens"] == 256
        assert out[0]["chunk_text"].split()[0] == "w0"
        assert out[0]["chunk_text"].split()[-1] == "w255"
        # stride 224: second chunk starts at w224, covers the tail
        assert out[1]["chunk_text"].split()[0] == "w224"
        assert out[1]["chunk_text"].split()[-1] == "w299"
        assert out[1]["n_chunk_tokens"] == 76
        # overlap region present in both
        assert "w230" in out[0]["chunk_text"] and "w230" in out[1]["chunk_text"]

    def test_short_and_empty_docs(self, spark):
        from seafowl_spark.operators.packing import chunk_documents

        df = spark.createDataFrame(
            [(1, "just five words right here"), (2, ""), (3, "   ")],
            "doc_id long, text string",
        )
        out = chunk_documents(df, chunk_tokens=256, overlap=32).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(by_doc.get(1, [])) == 1
        assert by_doc[1][0]["n_chunk_tokens"] == 5
        assert 2 not in by_doc and 3 not in by_doc  # no empty chunks

    def test_every_token_covered(self, spark):
        from seafowl_spark.operators.packing import chunk_documents

        text = " ".join(f"t{i}" for i in range(1000))
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        out = chunk_documents(df, chunk_tokens=128, overlap=16).collect()
        seen = set()
        for r in out:
            seen.update(r["chunk_text"].split())
        assert seen == {f"t{i}" for i in range(1000)}

    def test_bad_params_rejected(self, spark):
        from seafowl_spark.operators.packing import chunk_documents

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        import pytest as _pt

        with _pt.raises(ValueError):
            chunk_documents(df, chunk_tokens=0)
        with _pt.raises(ValueError):
            chunk_documents(df, chunk_tokens=16, overlap=16)


class TestFfdBinPacking:
    """pack_bins_ffd (r8 session D): whole-document first-fit-decreasing
    per shard — no example ever straddles a bin, oversize docs isolate."""

    def _df(self, spark, rows_):
        return spark.createDataFrame(
            rows_, "src string, doc_id bigint, n_tok bigint"
        )

    def test_no_bin_exceeds_budget_and_nothing_splits(self, spark):
        from seafowl_spark.operators.packing import pack_bins_ffd

        rows_ = [("a", i, (i * 37) % 90 + 10) for i in range(40)]
        out = pack_bins_ffd(
            self._df(spark, rows_), "n_tok", "doc_id", budget=128,
            shard_cols=["src"],
        ).collect()
        assert len(out) == 40  # every doc exactly once
        fills = {}
        for r in out:
            assert not r["oversize"]
            fills.setdefault(r["bin_id"], 0)
            fills[r["bin_id"]] += r["n_tok"]
        assert all(f <= 128 for f in fills.values())
        # reported bin_fill is the final fill of that bin
        for r in out:
            assert r["bin_fill"] == fills[r["bin_id"]]

    def test_oversize_isolated_and_flagged(self, spark):
        from seafowl_spark.operators.packing import pack_bins_ffd

        rows_ = [("a", 1, 500), ("a", 2, 60), ("a", 3, 60)]
        out = {r["doc_id"]: r for r in pack_bins_ffd(
            self._df(spark, rows_), "n_tok", "doc_id", budget=128
        ).collect()}
        assert out[1]["oversize"] and out[1]["bin_fill"] == 500
        assert not out[2]["oversize"] and not out[3]["oversize"]
        assert out[2]["bin_id"] == out[3]["bin_id"]  # 60+60 fits one bin
        assert out[1]["bin_id"] != out[2]["bin_id"]

    def test_deterministic_and_shard_independent(self, spark):
        from seafowl_spark.operators.packing import pack_bins_ffd

        rows_ = [(s, i, (i * 13) % 70 + 5) for s in ("a", "b") for i in range(25)]
        df = self._df(spark, rows_)
        a = sorted(map(tuple, pack_bins_ffd(df, "n_tok", "doc_id", 96, ["src"]).collect()))
        b = sorted(map(tuple, pack_bins_ffd(
            df.repartition(7), "n_tok", "doc_id", 96, ["src"]
        ).collect()))
        assert a == b

    def test_ffd_beats_or_matches_naive_bin_count(self, spark):
        from math import ceil

        from seafowl_spark.operators.packing import pack_bins_ffd

        rows_ = [("a", i, t) for i, t in enumerate([70, 70, 60, 40, 40, 30, 20, 20])]
        out = pack_bins_ffd(self._df(spark, rows_), "n_tok", "doc_id", 100).collect()
        n_bins = len({r["bin_id"] for r in out})
        lower_bound = ceil(sum(r[2] for r in rows_) / 100)
        assert n_bins <= lower_bound + 1  # FFD is within 11/9 OPT + 1
