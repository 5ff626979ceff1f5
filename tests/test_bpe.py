"""BPE tokenizer training + encoding (operators/bpe.py): merge-list parity
with a pure-Python Sennrich reference, training/encoding consistency,
determinism, early stop, and the closure-data plan gate."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.bpe import bpe_encode, learn_bpe

SF_DIR = "/root/testdata/sf0.001"

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "low lower newest widest"),
]


def _py_bpe(texts, n_merges):
    """Sennrich et al. 2016 reference: word counts, then per-round best
    adjacent pair (max count, lexicographically smallest on ties), merged
    greedily left-to-right."""
    wc = collections.Counter()
    for t in texts:
        for w in t.lower().split():
            wc[w] += 1
    vocab = {
        tuple(list(w[:-1]) + [w[-1] + "</w>"]): c for w, c in wc.items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


class TestLearnBpe:
    def test_merges_match_reference(self, corpus):
        got = learn_bpe(corpus, n_merges=12)
        expect = _py_bpe([t for _, t in CORPUS], 12)
        assert got == expect

    def test_deterministic(self, corpus):
        assert learn_bpe(corpus, n_merges=6) == learn_bpe(corpus, n_merges=6)

    def test_early_stop_when_words_fully_merged(self, spark):
        tiny = spark.createDataFrame([(1, "ab ab ab")], ["doc_id", "text"])
        merges = learn_bpe(tiny, n_merges=50)
        # 'ab</w>' needs exactly 1 merge: (a, b</w>) -> done
        assert merges == [("a", "b</w>")]

    def test_routes_produce_identical_merges(self, corpus):
        """The driver-side incremental trainer and the Spark per-round
        trainer are exactly equivalent — same counts, same lexicographic
        tie-break, same early stop."""
        local = learn_bpe(corpus, n_merges=20, route="local")
        spark_side = learn_bpe(corpus, n_merges=20, route="spark")
        assert local == spark_side == _py_bpe([t for _, t in CORPUS], 20)

    def test_auto_route_engages_local_below_threshold(self, corpus, monkeypatch):
        """route='auto' must train driver-side when the distinct-word
        table fits under local_threshold (the r6 verdict's sequencing
        requirement: no per-merge Spark jobs for vocab-sized tables) and
        fall back to Spark rounds above it."""
        import seafowl_spark.operators.bpe as bpe_mod

        calls = []
        real_local, real_spark = bpe_mod._learn_bpe_local, bpe_mod._learn_bpe_spark
        monkeypatch.setattr(
            bpe_mod,
            "_learn_bpe_local",
            lambda *a, **k: calls.append("local") or real_local(*a, **k),
        )
        monkeypatch.setattr(
            bpe_mod,
            "_learn_bpe_spark",
            lambda *a, **k: calls.append("spark") or real_spark(*a, **k),
        )
        bpe_mod.learn_bpe(corpus, n_merges=2, local_threshold=1_000_000)
        assert calls == ["local"]
        bpe_mod.learn_bpe(corpus, n_merges=2, local_threshold=0)
        assert calls == ["local", "spark"]

    def test_invalid_route_rejected(self, corpus):
        with pytest.raises(ValueError):
            learn_bpe(corpus, n_merges=2, route="gpu")

    def test_local_route_many_merges_fast(self, corpus):
        """The incremental trainer must keep producing reference-exact
        merges deep into the list (regression net for the stats/index
        bookkeeping) — run far past the corpus's merge capacity."""
        got = learn_bpe(corpus, n_merges=500, route="local")
        assert got == _py_bpe([t for _, t in CORPUS], 500)


class TestBpeEncode:
    def test_encoding_reproduces_training_segmentation(self, corpus):
        """Encoding the training corpus with the learned merges must give
        the same segmentation the final training round held."""
        merges = learn_bpe(corpus, n_merges=10)
        out = {
            r.doc_id: list(r.bpe_tokens)
            for r in bpe_encode(corpus, merges).collect()
        }
        # reference final vocab segmentation
        ref_merges = _py_bpe([t for _, t in CORPUS], 10)
        assert merges == ref_merges

        def ref_encode(word):
            syms = list(word[:-1]) + [word[-1] + "</w>"]
            for a, b in ref_merges:
                out_s, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out_s.append(a + b)
                        i += 2
                    else:
                        out_s.append(syms[i])
                        i += 1
                syms = out_s
            return syms

        for doc_id, text in CORPUS:
            expect = [s for w in text.lower().split() for s in ref_encode(w)]
            assert out[doc_id] == expect, doc_id

    def test_token_count_decreases_with_merges(self, corpus):
        none = bpe_encode(corpus, []).select(
            F.sum(F.size("bpe_tokens")).alias("n")
        ).collect()[0].n
        ten = bpe_encode(corpus, learn_bpe(corpus, n_merges=10)).select(
            F.sum(F.size("bpe_tokens")).alias("n")
        ).collect()[0].n
        assert ten < none

    def test_null_and_empty_text(self, spark):
        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "  ")], ["doc_id", "text"]
        )
        out = {r.doc_id: r.bpe_tokens for r in bpe_encode(df, []).collect()}
        assert out[1] is None and out[2] == [] and out[3] == []

    def test_plan_o1_in_merge_count(self, corpus):
        """10 merges vs 1000 merges: same plan — the merge table is
        closure data, not plan operators."""
        m10 = [(f"x{i}", f"y{i}") for i in range(10)]
        m1000 = [(f"x{i}", f"y{i}") for i in range(1000)]
        p10 = bpe_encode(corpus, m10)._jdf.queryExecution().executedPlan().toString()
        p1000 = bpe_encode(corpus, m1000)._jdf.queryExecution().executedPlan().toString()
        assert abs(len(p1000) - len(p10)) < 100


class TestOnTestdata:
    def test_trains_on_documents_table(self, spark):
        """End-to-end over the real documents table: merges learn the
        corpus's frequent character sequences and compress the encoding."""
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        merges = learn_bpe(docs.limit(100), n_merges=8)
        assert len(merges) == 8
        enc = bpe_encode(docs.limit(20), merges)
        row = enc.select(
            F.sum(F.size("bpe_tokens")).alias("bpe"),
            F.sum(
                F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
            ).alias("words"),
        ).collect()[0]
        assert row.bpe > 0
        # subword tokens at 8 merges: more tokens than words, fewer than
        # characters
        assert row.bpe > row.words
