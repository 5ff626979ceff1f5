"""Deterministic weighted sampling (operators/sampling.py): parity with a
pure-Python A-ES mirror, weight-proportional inclusion statistics over many
seeds (mirror-side), determinism, edge rules, and the TakeOrdered plan."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.sampling import weighted_sample

ROWS = [(i, float(10 if i % 10 == 0 else 1)) for i in range(200)]


def _py_key(seed, i, w):
    u = (int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:15], 16) + 1) / float(
        1 << 60
    )
    return -math.log(u) / w


def _py_sample(rows, k, seed):
    keyed = sorted(
        ((_py_key(seed, i, w), i) for i, w in rows if w and w > 0)
    )
    return [i for _, i in keyed[:k]]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "w"])


class TestParity:
    def test_matches_python_mirror(self, spark, df):
        for seed in ("a", "b", "42"):
            got = [
                r.doc_id
                for r in weighted_sample(df, 25, "w", seed=seed)
                .orderBy("__aes_key", "doc_id")
                .collect()
            ]
            assert got == _py_sample(ROWS, 25, seed), seed

    def test_deterministic_across_layouts(self, spark, df):
        a = {r.doc_id for r in weighted_sample(df, 30, "w").collect()}
        b = {
            r.doc_id
            for r in weighted_sample(df.repartition(13), 30, "w").collect()
        }
        assert a == b

    def test_weights_drive_inclusion(self, spark, df):
        """Mirror-side statistics (cheap: pure Python over 200 rows x 400
        seeds): a weight-10 item must be selected ~10x as often as a
        weight-1 item — the A-ES correctness property the engine
        expression inherits through exact mirror parity above."""
        heavy = hits = 0
        for s in range(400):
            sel = set(_py_sample(ROWS, 20, f"s{s}"))
            heavy += sum(1 for i in sel if i % 10 == 0)
            hits += len(sel)
        frac_heavy = heavy / hits
        # 20 heavy items with weight 10 of total weight 380: expected
        # inclusion share well above the 10% population share
        assert 0.45 < frac_heavy < 0.75, frac_heavy

    def test_nonpositive_and_null_never_selected(self, spark):
        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (5, 2.0)],
            ["doc_id", "w"],
        )
        got = {r.doc_id for r in weighted_sample(df, 10, "w").collect()}
        assert got == {1, 5}

    def test_invalid_k(self, spark, df):
        with pytest.raises(ValueError):
            weighted_sample(df, 0, "w")


class TestPlan:
    def test_topk_no_global_sort(self, spark, df):
        p = (
            weighted_sample(df, 10, "w")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in p
        assert "Exchange rangepartitioning" not in p  # no global sort
