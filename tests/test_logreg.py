"""Logistic-regression quality classifier (operators/logreg.py): numpy
mirror of the fixed-epoch gradient loop, feature exactness, and the r8
registry folds (q_setops -> q_subqueries, m_frame_sample ->
m_payload_pipeline) that donated the graded slots."""

import math

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.logreg import (
    hashed_features,
    logreg_scores,
    train_logreg,
)

DOCS = [
    (1, "good clean prose with varied words", 1),
    (2, "good good good good good", 1),
    (3, "spam spam buy now spam buy", 0),
    (4, "click here buy now click here now", 0),
    (5, "varied thoughtful prose and clean writing style", 1),
    (6, "now now now buy buy buy", 0),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string, y int")


def _py_features(dim):
    """Driver-side mirror: md5-bucket counts / token total."""
    import hashlib

    out = {}
    for doc_id, text, y in DOCS:
        toks = [t for t in text.lower().split() if t]
        xs = [0] * dim
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim
            xs[b] += 1
        out[doc_id] = (float(y), [c / len(toks) for c in xs])
    return out


class TestHashedFeatures:
    def test_features_match_python_mirror(self, spark, docs):
        dim = 8
        got = {
            r["doc_id"]: (r["y"], [r[f"x{j}"] for j in range(dim)])
            for r in hashed_features(docs, F.col("y"), dim=dim).collect()
        }
        assert got == _py_features(dim)


class TestTrainLogreg:
    def test_training_matches_python_mirror(self, spark, docs):
        """Fixed-epoch GD replicated driver-side with the same quantized
        sigmoid and exact decimal sums — weights must match to the bit."""
        from decimal import ROUND_HALF_UP, Decimal

        dim, epochs, lr = 8, 3, 0.5
        feat = hashed_features(docs, F.col("y"), dim=dim)
        w, b, n = train_logreg(feat, dim=dim, epochs=epochs, lr=lr)
        assert n == len(DOCS)

        py = _py_features(dim)
        ew, eb = [0.0] * dim, 0.0
        q6 = Decimal("0.000001")
        q12 = Decimal("0.000000000001")
        for _ in range(epochs):
            gs, gb = [Decimal(0)] * dim, Decimal(0)
            for y, xs in py.values():
                z = ew[0] * xs[0]
                for j in range(1, dim):
                    z = z + ew[j] * xs[j]
                z = z + eb
                p = 1.0 / (1.0 + math.exp(-z))
                pq = float(Decimal(repr(p)).quantize(q6, ROUND_HALF_UP))
                r = pq - y
                for j in range(dim):
                    gs[j] += Decimal(repr(r * xs[j])).quantize(q12, ROUND_HALF_UP)
                gb += Decimal(repr(r)).quantize(q12, ROUND_HALF_UP)
            ew = [ew[j] - lr * (float(gs[j]) / n) for j in range(dim)]
            eb = eb - lr * (float(gb) / n)
        assert w == pytest.approx(ew, abs=0, rel=0)
        assert b == eb

    def test_scores_separate_classes(self, spark, docs):
        dim = 8
        feat = hashed_features(docs, F.col("y"), dim=dim).localCheckpoint()
        w, b, _ = train_logreg(feat, dim=dim, epochs=20, lr=2.0)
        got = {
            r["doc_id"]: (r["p"], r["pred"])
            for r in logreg_scores(feat, w, b, dim).collect()
        }
        pos = [got[i][0] for i in (1, 2, 5)]
        neg = [got[i][0] for i in (3, 4, 6)]
        assert min(pos) > max(neg)
        # threshold label consistent with the score everywhere
        assert all(pred == (1 if p >= 0.5 else 0) for p, pred in got.values())
        # negatives firmly rejected (positives may sit near the boundary
        # on this tiny corpus — ranking separation above is the signal)
        assert all(got[i][1] == 0 for i in (3, 4, 6))


class TestRegistryFolds:
    """The r8 slot donations must lose no coverage: each absorbed row's
    values remain identical inside its absorber."""

    SF = "/root/testdata/sf0.001"

    def test_setops_branches_match_standalone(self, spark):
        from seafowl_spark.queries import load_all
        from seafowl_spark.queries.relational import q_setops

        reg = load_all()
        inner = {
            (r["tag"], r["key"])
            for r in q_setops(spark, self.SF).collect()
        }
        folded = {
            (r["tag"].removeprefix("setops_"), r["key"])
            for r in reg["q_subqueries"].fn(spark, self.SF).collect()
            if r["tag"].startswith("setops_")
        }
        assert folded == inner and inner

    def test_frames_branch_matches_standalone(self, spark):
        from seafowl_spark.queries import load_all
        from seafowl_spark.queries.multimodal import m_frame_sample

        reg = load_all()
        inner = {
            (r["doc_id"], r["frame_idx"], r["frame_offset"])
            for r in m_frame_sample(spark, self.SF).collect()
        }
        folded = {
            (r["doc_id"], r["frame_idx"], r["frame_offset"])
            for r in reg["m_payload_pipeline"].fn(spark, self.SF).collect()
            if r["branch"] == "frames"
        }
        assert folded == inner and inner
