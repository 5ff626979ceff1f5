"""DoReMi-style domain reweighting (operators/doremi.py, r8 session D):
per-domain proxy loss in one pass, multiplicative excess-loss weights
driver-side, composition with the logreg proxy and mixture sampling."""

import math

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.doremi import (
    doremi_targets,
    per_domain_loss,
    reweight_domains,
)

SF_DIR = "/root/testdata/sf0.001"


class TestPerDomainLoss:
    def test_matches_numpy_mirror(self, spark):
        rows_ = [
            ("a", 1, 0.9), ("a", 0, 0.2), ("a", 1, 0.6),
            ("b", 1, 0.1), ("b", 0, 0.8),
        ]
        df = spark.createDataFrame(rows_, "lang string, y int, p double")
        got = per_domain_loss(df)
        from decimal import Decimal

        def q(x):  # DECIMAL(25,6) quantization of each -ln term
            return float(Decimal(x).quantize(Decimal("0.000001")))

        def nll(y, p):
            return q(-(y * math.log(p) + (1 - y) * math.log(1 - p)))

        want = {}
        for d in ("a", "b"):
            terms = [nll(y, p) for dd, y, p in rows_ if dd == d]
            want[d] = sum(terms) / len(terms)
        for d in want:
            assert got[d] == pytest.approx(want[d], abs=2e-6)
        # b is much worse than a (mispredicts both rows)
        assert got["b"] > got["a"]

    def test_probabilities_clipped(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 0.0), ("a", 0, 1.0)], "lang string, y int, p double"
        )
        got = per_domain_loss(df)
        assert math.isfinite(got["a"]) and got["a"] > 0


class TestReweight:
    def test_high_excess_domain_gains_weight(self):
        w = reweight_domains(
            {"a": 0.2, "b": 0.9, "c": 0.5}, ref_losses=0.4, iters=5, lr=1.0
        )
        assert w["b"] > w["c"] > w["a"]
        assert sum(w.values()) == pytest.approx(1.0)

    def test_no_excess_keeps_uniform(self):
        w = reweight_domains({"a": 0.1, "b": 0.2}, ref_losses=0.5, iters=3)
        assert w == {"a": 0.5, "b": 0.5}

    def test_matches_closed_form(self):
        losses, ref, lr, iters = {"a": 0.7, "b": 0.3}, 0.3, 0.5, 4
        w = reweight_domains(losses, ref, iters=iters, lr=lr)
        # only 'a' has excess 0.4: after k rounds w_a/w_b = exp(k*lr*0.4)
        ratio = math.exp(iters * lr * 0.4)
        assert w["a"] / w["b"] == pytest.approx(ratio, rel=1e-9)

    def test_deterministic_and_order_free(self):
        l1 = {"a": 0.6, "b": 0.8, "c": 0.4}
        l2 = {"c": 0.4, "a": 0.6, "b": 0.8}
        assert reweight_domains(l1, 0.5) == reweight_domains(l2, 0.5)


class TestComposition:
    def test_proxy_to_mixture_end_to_end(self, spark):
        from seafowl_spark.operators.logreg import (
            hashed_features,
            logreg_scores,
            train_logreg,
        )
        from seafowl_spark.operators.mixture import mixture_sample

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "lang", "text"
        )
        feat = hashed_features(
            docs, label=(F.col("lang") == "en").cast("int"), dim=8
        ).localCheckpoint()
        w, b, _ = train_logreg(feat, dim=8, epochs=2, lr=0.5)
        scored = logreg_scores(feat, w, b, 8).join(
            docs.select("doc_id", "lang"), "doc_id"
        ).join(feat.select("doc_id", "y"), "doc_id")
        targets = doremi_targets(scored, ref_losses=0.0, iters=3, lr=0.5)
        assert set(targets) == {
            r["lang"] for r in docs.select("lang").distinct().collect()
        }
        assert sum(targets.values()) == pytest.approx(1.0)
        mixed = mixture_sample(docs, targets)
        assert 0 < mixed.count() <= docs.count()
