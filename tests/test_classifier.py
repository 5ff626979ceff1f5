"""Multinomial Naive Bayes (operators/classifier.py): exact parity with a
pure-Python reference, prediction sanity on a separable corpus, OOV and
empty-document behavior, determinism, and the broadcast-model plan gate."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.classifier import fit_nb, nb_predict, nb_scores

SF_DIR = "/root/testdata/sf0.001"

TRAIN = [
    (1, "spark shuffle partition executor task", "eng"),
    (2, "executor task stage shuffle spark spark", "eng"),
    (3, "partition task spark stage stage", "eng"),
    (4, "recipe butter flour sugar oven", "food"),
    (5, "oven sugar sugar butter bake", "food"),
    (6, "flour bake recipe oven oven butter", "food"),
]
TEST = [
    (10, "spark task shuffle"),
    (11, "butter oven recipe"),
    (12, "zebra zebra zebra"),  # all OOV: priors + floors decide
    (13, ""),                    # empty: priors alone decide
]


def _py_nb(train, vocab_size=4096, min_count=1):
    """Reference: same capped vocab, Laplace smoothing, shared OOV bucket."""
    from collections import Counter

    tok = {d: t.lower().split() for d, t, _l in train}
    labels = {d: l for d, _t, l in train}
    corpus_counts = Counter(w for t in tok.values() for w in t)
    vocab = sorted(
        (w for w, c in corpus_counts.items() if c >= min_count),
        key=lambda w: (-corpus_counts[w], w),
    )[:vocab_size]
    vocab = set(vocab)
    v_plus = len(vocab) + 1
    by_label: dict = {}
    n_docs: dict = {}
    for d, words in tok.items():
        l = labels[d]
        n_docs[l] = n_docs.get(l, 0) + 1
        c = by_label.setdefault(l, Counter())
        for w in words:
            if w in vocab:
                c[w] += 1
    n_total = len(train)
    model = {}
    for l, c in by_label.items():
        tot = sum(c.values())
        model[l] = {
            "log_prior": math.log(n_docs[l] / n_total),
            "oov": math.log(1.0 / (tot + v_plus)),
            "ll": {w: math.log((n + 1.0) / (tot + v_plus)) for w, n in c.items()},
            "vocab": vocab,
        }
    return model


def _py_score(model, text, q6=True):
    from decimal import ROUND_HALF_UP, Decimal

    def q(x):
        if not q6:
            return x
        return float(Decimal(x).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    out = {}
    for l, m in model.items():
        s = 0.0
        for w in text.lower().split():
            if w in m["vocab"]:
                s += q(m["ll"].get(w, m["oov"]))
            else:
                s += q(m["oov"])
        out[l] = m["log_prior"] + s
    return out


@pytest.fixture(scope="module")
def frames(spark):
    train = spark.createDataFrame(TRAIN, ["doc_id", "text", "label"])
    test = spark.createDataFrame(TEST, ["doc_id", "text"])
    return train, test


@pytest.fixture(scope="module")
def model(frames):
    train, _ = frames
    return fit_nb(train)


class TestFit:
    def test_model_values_match_reference(self, model):
        ref = _py_nb(TRAIN)
        priors = {r.label: r for r in model.priors.collect()}
        assert set(priors) == set(ref)
        for l, m in ref.items():
            assert priors[l].log_prior == pytest.approx(m["log_prior"], rel=1e-12)
            assert priors[l].oov_ll == pytest.approx(m["oov"], rel=1e-12)
        lik = {(r.label, r.token): r.ll for r in model.likelihood.collect()}
        for l, m in ref.items():
            for w, v in m["ll"].items():
                assert lik[(l, w)] == pytest.approx(v, rel=1e-12), (l, w)
        assert len(lik) == sum(len(m["ll"]) for m in ref.values())


class TestScore:
    def test_scores_match_reference(self, frames, model):
        _, test = frames
        got = {}
        for r in nb_scores(test, model).collect():
            got[(r.doc_id, r.label)] = r.score
        ref = _py_nb(TRAIN)
        for doc_id, text in TEST:
            for l, es in _py_score(ref, text).items():
                assert got[(doc_id, l)] == pytest.approx(es, abs=1e-4), (
                    doc_id,
                    l,
                )

    def test_predictions_separable(self, frames, model):
        _, test = frames
        pred = {r.doc_id: r.predicted for r in nb_predict(test, model).collect()}
        assert pred[10] == "eng"
        assert pred[11] == "food"
        assert 12 in pred and 13 in pred  # OOV/empty docs still classified

    def test_empty_doc_scores_prior_only(self, frames, model):
        _, test = frames
        got = {
            r.label: r.score
            for r in nb_scores(test, model).where(F.col("doc_id") == 13).collect()
        }
        priors = {r.label: r.log_prior for r in model.priors.collect()}
        for l, s in got.items():
            assert s == pytest.approx(priors[l], rel=1e-12)

    def test_deterministic(self, frames, model):
        _, test = frames
        a = sorted(map(tuple, nb_scores(test, model).collect()))
        b = sorted(map(tuple, nb_scores(test, model).collect()))
        assert a == b


class TestPlan:
    def test_model_broadcasts_into_scoring(self, frames, model):
        """The model is vocab-capped, so scoring must be broadcast joins —
        a sort-merge join would shuffle every token instance by token."""
        _, test = frames
        out = nb_scores(test, model)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "Python" not in plan


class TestOnTestdata:
    def test_lang_classifier_end_to_end(self, spark):
        """Train on the documents table's lang labels and score the same
        corpus: the pipeline runs end-to-end and every doc gets exactly
        one prediction from the training label set."""
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text", F.col("lang").alias("label")
        )
        model = fit_nb(docs, vocab_size=256)
        pred = nb_predict(docs.select("doc_id", "text"), model)
        n_docs = docs.count()
        assert pred.count() == n_docs
        labels = {r.label for r in model.priors.collect()}
        assert {r.predicted for r in pred.collect()} <= labels
