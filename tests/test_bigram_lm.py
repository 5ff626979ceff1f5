"""Bigram LM with interpolated smoothing (operators/vocab.py): score
parity with a pure-Python mirror, quality-ranking sanity on structured vs
shuffled text, determinism, and the broadcast/row-local plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.vocab import (
    BOS,
    UNK,
    bigram_logprob,
    fit_bigram_lm,
)

CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the rug"),
    (3, "the cat ate the fish"),
    (4, "a dog ate a bone"),
    (5, "the cat sat on the rug"),
]


def _py_model(texts, vocab_size, min_count=1):
    from collections import Counter

    uni = Counter()
    for t in texts:
        uni.update(t.lower().split())
    vocab = {
        t: n
        for t, n in sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
        if n >= min_count
    }
    big = Counter()
    for t in texts:
        toks = [w if w in vocab else UNK for w in t.lower().split()]
        if toks:
            big[(BOS, toks[0])] += 1
        for a, b in zip(toks, toks[1:]):
            big[(a, b)] += 1
    ctx = Counter()
    for (a, _b), c in big.items():
        ctx[a] += c
    return vocab, big, ctx


def _py_score(text, vocab, big, ctx, lam=0.8):
    total, V = sum(vocab.values()), len(vocab)
    toks = [w if w in vocab else UNK for w in text.lower().split()]
    pairs = ([(BOS, toks[0])] if toks else []) + list(zip(toks, toks[1:]))
    nlps = []
    for a, b in pairs:
        p_uni = (vocab.get(b, 0) + 1) / (total + V + 1)
        p_big = big.get((a, b), 0) / ctx[a] if ctx.get(a) else 0.0
        # mirror the engine's decimal(25,6) quantization of each -ln p
        nlps.append(round(-math.log(lam * p_big + (1 - lam) * p_uni), 6))
    return len(pairs), sum(nlps) / len(pairs)


@pytest.fixture(scope="module")
def model(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    vocab, bigrams = fit_bigram_lm(df, vocab_size=8)
    return df, vocab, bigrams


class TestParity:
    def test_scores_match_python_mirror(self, spark, model):
        df, vocab, bigrams = model
        got = {
            r.doc_id: (r.n_scored, r.avg_neg_logprob)
            for r in bigram_logprob(df, vocab, bigrams).collect()
        }
        pv, pb, pc = _py_model([t for _, t in CORPUS], vocab_size=8)
        for i, text in CORPUS:
            n, s = _py_score(text, pv, pb, pc)
            assert got[i][0] == n, i
            assert got[i][1] == pytest.approx(s, abs=2e-6), i

    def test_counts_match_python_mirror(self, model):
        _df, vocab, bigrams = model
        pv, pb, _pc = _py_model([t for _, t in CORPUS], vocab_size=8)
        assert {r.token: r.n for r in vocab.collect()} == pv
        got = {(r.prev, r.cur): r.c for r in bigrams.collect()}
        assert got == dict(pb)

    def test_deterministic(self, spark, model):
        df, vocab, bigrams = model
        a = sorted(
            (r.doc_id, r.avg_neg_logprob)
            for r in bigram_logprob(df, vocab, bigrams).collect()
        )
        b = sorted(
            (r.doc_id, r.avg_neg_logprob)
            for r in bigram_logprob(df, vocab, bigrams).collect()
        )
        assert a == b


class TestQualityGate:
    def test_corpus_typical_beats_shuffled(self, spark):
        """The gate's purpose: word salad from the same unigram
        distribution scores strictly worse (higher perplexity) than
        corpus-typical sentences — the bigram structure is what the
        unigram model cannot see."""
        train = spark.createDataFrame(
            [(i, "the cat sat on the mat") for i in range(20)]
            + [(100 + i, "a dog ate a bone") for i in range(20)],
            ["doc_id", "text"],
        )
        vocab, bigrams = fit_bigram_lm(train, vocab_size=32)
        probe = spark.createDataFrame(
            [(1, "the cat sat on the mat"), (2, "mat the on sat cat the")],
            ["doc_id", "text"],
        )
        got = {
            r.doc_id: r.avg_neg_logprob
            for r in bigram_logprob(probe, vocab, bigrams).collect()
        }
        assert got[1] < got[2]

    def test_runs_on_testdata(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        vocab, bigrams = fit_bigram_lm(docs, vocab_size=512)
        out = bigram_logprob(docs, vocab, bigrams)
        rows = out.collect()
        assert len(rows) == docs.count()
        assert all(r.avg_neg_logprob > 0 for r in rows)


class TestPlan:
    def test_model_joins_broadcast_pairs_row_local(self, spark, model):
        df, vocab, bigrams = model
        out = bigram_logprob(df, vocab, bigrams)
        p = out._jdf.queryExecution().executedPlan().toString()
        # all model joins are broadcasts; no sort-merge of the pair stream
        assert "SortMergeJoin" not in p
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p
