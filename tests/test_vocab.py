"""Vocabulary building + unigram-LM scoring (operators/vocab.py)."""

from __future__ import annotations

import math

import pytest

from seafowl_spark.operators.vocab import build_vocab, unigram_logprob


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "The THE the"),
        (4, "zebra quagga"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBuildVocab:
    def test_counts_and_order(self, corpus):
        v = build_vocab(corpus).collect()
        assert (v[0]["token"], v[0]["n"]) == ("the", 7)
        got = {r["token"]: r["n"] for r in v}
        assert got["sat"] == 2 and got["on"] == 2
        assert got["zebra"] == 1
        # deterministic tie-break: equal counts sort by token
        ties = [r["token"] for r in v if r["n"] == 2]
        assert ties == sorted(ties)

    def test_top_k_and_min_count(self, corpus):
        top = build_vocab(corpus, top_k=3).collect()
        assert len(top) == 3 and top[0]["token"] == "the"
        floored = build_vocab(corpus, min_count=2).collect()
        assert all(r["n"] >= 2 for r in floored)
        assert "zebra" not in {r["token"] for r in floored}

    def test_case_sensitive_mode(self, corpus):
        v = {r["token"]: r["n"] for r in build_vocab(corpus, lowercase=False).collect()}
        assert v["the"] == 5 and v["The"] == 1 and v["THE"] == 1


class TestUnigramLogprob:
    def test_matches_hand_computation(self, corpus):
        vocab = build_vocab(corpus)
        counts = {r["token"]: r["n"] for r in vocab.collect()}
        total = sum(counts.values())

        out = {
            r["doc_id"]: r
            for r in unigram_logprob(corpus, vocab).collect()
        }

        def expected(text):
            toks = text.lower().split()
            nlps = [
                -math.log(counts.get(t, 1.0) / (total + 1)) for t in toks
            ]
            return sum(nlps) / len(nlps)

        assert out[1]["n_scored"] == 6
        # per-term DECIMAL(25,6) quantization shifts the mean by <= 5e-7
        assert out[1]["avg_neg_logprob"] == pytest.approx(
            expected("the cat sat on the mat"), abs=2e-6
        )
        # common-word doc scores lower (more typical) than rare-word doc
        assert out[3]["avg_neg_logprob"] < out[4]["avg_neg_logprob"]

    def test_oov_takes_floor(self, spark, corpus):
        vocab = build_vocab(corpus, min_count=2)  # zebra/quagga fall out
        counts = {r["token"]: r["n"] for r in vocab.collect()}
        total = sum(counts.values())
        out = {r["doc_id"]: r for r in unigram_logprob(corpus, vocab).collect()}
        floor_nlp = -math.log(1.0 / (total + 1))
        assert out[4]["avg_neg_logprob"] == pytest.approx(floor_nlp, abs=2e-6)

    def test_scoring_against_capped_vocab_broadcasts(self, corpus):
        vocab = build_vocab(corpus, top_k=5)
        plan = (
            unigram_logprob(corpus, vocab)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
