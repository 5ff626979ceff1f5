"""Count-Min sketch (operators/countmin.py): the overestimate guarantee
(hard, every item), the epsilon error bound over the real token stream,
weighted builds, unseen items, and the bounded-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.countmin import count_min_build, count_min_estimate

SF_DIR = "/root/testdata/sf0.001"

W, D = 2048, 4


@pytest.fixture(scope="module")
def tokens(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("text")
    return docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("token")
    )


@pytest.fixture(scope="module")
def exact(tokens):
    return {
        r.token: r.n
        for r in tokens.groupBy("token").agg(F.count("*").alias("n")).collect()
    }


class TestGuarantees:
    def test_never_underestimates_and_epsilon_bound(self, spark, tokens, exact):
        sketch = count_min_build(tokens, "token", width=W, depth=D)
        q = spark.createDataFrame([(t,) for t in exact], ["token"])
        got = {
            r.token: r.est_count
            for r in count_min_estimate(sketch, q, "token", width=W, depth=D).collect()
        }
        total = sum(exact.values())
        import math

        eps_bound = math.e / W * total
        over = [t for t in exact if got[t] < exact[t]]
        assert not over, over[:5]  # hard guarantee: never under
        # with depth=4 the eps bound holds w.p. 1-e^-4 per item; allow a
        # tiny tail but the overwhelming majority must be inside it
        bad = [t for t in exact if got[t] - exact[t] > eps_bound]
        assert len(bad) <= max(1, len(exact) // 100), (len(bad), len(exact))

    def test_sketch_size_bounded(self, tokens):
        sketch = count_min_build(tokens, "token", width=64, depth=3)
        assert sketch.count() <= 64 * 3

    def test_unseen_item_estimates_zero_or_collision(self, spark, tokens, exact):
        sketch = count_min_build(tokens, "token", width=W, depth=D)
        q = spark.createDataFrame(
            [("zz_never_in_corpus_1",), ("zz_never_in_corpus_2",)], ["token"]
        )
        got = count_min_estimate(sketch, q, "token", width=W, depth=D).collect()
        total = sum(exact.values())
        import math

        for r in got:
            assert 0 <= r.est_count <= math.e / W * total + 1


class TestMechanics:
    def test_weighted_matches_exact_when_wide(self, spark):
        df = spark.createDataFrame(
            [("a", 100), ("b", 5), ("a", 50), (None, 9), ("c", -3)],
            ["item", "w"],
        )
        sketch = count_min_build(df, "item", width=4096, depth=4, weight_col="w")
        q = spark.createDataFrame([("a",), ("b",), ("c",)], ["item"])
        got = {
            r.item: r.est_count
            for r in count_min_estimate(sketch, q, "item", width=4096, depth=4).collect()
        }
        # wide sketch, 2 live items: no collisions -> exact; null and
        # non-positive weights skipped
        assert got == {"a": 150, "b": 5, "c": 0}

    def test_invalid_params(self, spark, tokens):
        with pytest.raises(ValueError):
            count_min_build(tokens, "token", width=0)
        with pytest.raises(ValueError):
            count_min_build(tokens, "token", depth=0)

    def test_build_shuffle_is_sketch_bounded(self, spark, tokens):
        """Map-side partial aggregation over a <= depth x width key space:
        the exchange carries partial sums, and the estimate join is a
        broadcast — the token stream never hash-shuffles by token."""
        sketch = count_min_build(tokens, "token", width=64, depth=3)
        p = sketch._jdf.queryExecution().executedPlan().toString()
        assert "partial_sum" in p  # map-side combine over the cell keys
        assert p.count("Exchange hashpartitioning") == 1
        q = tokens.limit(5)
        est = count_min_estimate(sketch, q, "token", width=64, depth=3)
        pe = est._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in pe
        assert "SortMergeJoin" not in pe
