"""Near-duplicate cross-corpus contamination
(operators/cross_contamination.py): python-mirror parity of signatures and
pair estimates, paraphrase detection that exact shingles would miss only
partially, band-bucket capping, and the cross-join-free plan."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.cross_contamination import (
    N_PERM,
    cross_contamination,
    minhash_signatures,
)
from seafowl_spark.queries.similarity import MINHASH_A, MINHASH_B, MINHASH_P


def _py_h8(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_sigs(text):
    toks = [t for t in text.split() if t]
    sh = sorted(
        {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    ) if len(toks) >= 3 else []
    if not sh:
        return None
    hh = [_py_h8(x) for x in sh]
    return [
        min((a * h + b) % MINHASH_P for h in hh)
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]


BASE = (
    "the quick brown fox jumps over the lazy dog near the quiet river "
    "bank every sunny morning in early spring"
)
PARA = (
    "the quick brown fox jumps over the lazy dog near the quiet river "
    "bank every rainy evening in late autumn"
)
OTHER = "completely different text about spark shuffles and parquet footers here"

TRAIN = [(1, BASE), (2, OTHER), (3, "tiny doc")]
EVAL = [(10, PARA), (11, "unrelated eval question about databases and joins wow")]


@pytest.fixture(scope="module")
def frames(spark):
    return (
        spark.createDataFrame(TRAIN, ["doc_id", "text"]),
        spark.createDataFrame(EVAL, ["doc_id", "text"]),
    )


class TestSignatures:
    def test_match_python_mirror(self, spark, frames):
        train, _ = frames
        got = {
            r.doc_id: list(r.sigs)
            for r in minhash_signatures(train).collect()
        }
        for i, t in TRAIN:
            exp = _py_sigs(t)
            if exp is None:
                assert i not in got
            else:
                assert got[i] == exp, i


class TestPairs:
    def test_paraphrase_detected_with_estimate(self, spark, frames):
        train, ev = frames
        got = {
            (r.eval_id, r.train_id): r.est_jaccard
            for r in cross_contamination(train, ev, threshold=0.3).collect()
        }
        assert (10, 1) in got  # the paraphrase pair
        # mirror estimate: agreeing slots / 16
        sa, sb = _py_sigs(BASE), _py_sigs(PARA)
        exp = sum(1 for x, y in zip(sa, sb) if x == y) / N_PERM
        assert got[(10, 1)] == pytest.approx(exp)
        assert exp >= 0.3  # shared prefix dominates the shingle sets
        # the unrelated eval doc matches nothing
        assert not any(e == 11 for e, _ in got)

    def test_identical_doc_full_score(self, spark):
        tr = spark.createDataFrame([(1, BASE)], ["doc_id", "text"])
        ev = spark.createDataFrame([(9, BASE)], ["doc_id", "text"])
        got = cross_contamination(tr, ev, threshold=0.9).collect()
        assert [(r.eval_id, r.train_id, r.est_jaccard) for r in got] == [
            (9, 1, 1.0)
        ]

    def test_bucket_cap_bounds_candidates(self, spark):
        # 50 identical train docs all land in the same buckets; cap=5
        tr = spark.createDataFrame(
            [(i, BASE) for i in range(50)], ["doc_id", "text"]
        )
        ev = spark.createDataFrame([(9, BASE)], ["doc_id", "text"])
        got = cross_contamination(
            tr, ev, threshold=0.9, max_bucket_train_rows=5
        ).collect()
        # only the capped (lowest-id) train rows can report
        assert 0 < len(got) <= 5
        assert all(r.train_id < 5 for r in got)

    def test_plan_no_cartesian(self, spark, frames):
        train, ev = frames
        out = cross_contamination(train, ev)
        p = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


class TestBoundedReporting:
    """r13 (the r12 verdict's task #5): contamination reporting modes
    that stay bounded when a hot eval doc (or a boilerplate shingle)
    would otherwise make the report itself the blow-up."""

    def test_top_k_per_eval_keeps_best_matches(self, spark):
        # 20 train docs, all near-identical to the eval doc, plus one
        # paraphrase with a LOWER estimate: top-3 must keep the three
        # lowest-id exact copies (est 1.0 ties break by train_id)
        tr = spark.createDataFrame(
            [(i, BASE) for i in range(20)] + [(99, PARA)],
            ["doc_id", "text"],
        )
        ev = spark.createDataFrame([(9, BASE)], ["doc_id", "text"])
        got = cross_contamination(
            tr, ev, threshold=0.3, top_k_per_eval=3
        ).collect()
        assert sorted((r.eval_id, r.train_id) for r in got) == [
            (9, 0), (9, 1), (9, 2)
        ]
        assert all(r.est_jaccard == 1.0 for r in got)

    def test_top_k_unset_reports_everything(self, spark):
        tr = spark.createDataFrame(
            [(i, BASE) for i in range(20)], ["doc_id", "text"]
        )
        ev = spark.createDataFrame([(9, BASE)], ["doc_id", "text"])
        assert len(cross_contamination(tr, ev, threshold=0.9).collect()) == 20

    def test_counts_bounded_matches_exact_on_small_data(self, spark):
        """The HLL variant's shingle counts are EXACT and the eval-doc
        estimate matches the true distinct count on small cardinalities
        (HLL at lg_k=12 is exact far beyond these sizes)."""
        from seafowl_spark.operators.cross_contamination import (
            contamination_counts_bounded,
        )

        # train doc 1 shares h 100,101 with eval docs {10,11}; doc 2
        # shares h 200 with eval doc {12}; doc 3 matches nothing
        tr = spark.createDataFrame(
            [(1, 100), (1, 101), (1, 999), (2, 200), (3, 555),
             (1, 100)],  # duplicate (doc,h) row must not double-count
            ["doc_id", "h"],
        )
        ev = spark.createDataFrame(
            [(10, 100), (11, 100), (11, 101), (12, 200), (13, 777)],
            ["eval_doc", "h"],
        )
        got = {
            r.doc_id: (r.n_shared_shingles, r.n_eval_docs_approx)
            for r in contamination_counts_bounded(tr, ev).collect()
        }
        assert got == {1: (2, 2), 2: (1, 1)}

    def test_counts_bounded_plan_has_no_pair_explosion(self, spark):
        """The join output is |distinct train (doc,h)| even when every
        eval doc matches every train shingle — the pair-shaped
        intermediate the exact countDistinct forces simply does not
        exist in this plan. Verified by cardinality: 200 eval docs all
        sharing one hot shingle with 100 train docs yields 100 output
        rows and the right counts, never 20k pair rows surfacing."""
        from seafowl_spark.operators.cross_contamination import (
            contamination_counts_bounded,
        )

        tr = spark.createDataFrame(
            [(d, 42) for d in range(100)], ["doc_id", "h"]
        )
        ev = spark.createDataFrame(
            [(e, 42) for e in range(1000, 1200)], ["eval_doc", "h"]
        )
        rows = contamination_counts_bounded(tr, ev).collect()
        assert len(rows) == 100
        for r in rows:
            assert r.n_shared_shingles == 1
            # HLL estimate of 200 distinct ids at lg_k=12: ~1.6% rsd
            assert abs(r.n_eval_docs_approx - 200) <= 10
