"""Approximate heavy hitters (operators/heavy_hitters.py): the Misra-Gries
frequency guarantee against exact counts, weighting, capacity bounds, and
the bounded-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from seafowl_spark.operators.heavy_hitters import approx_top_k

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tokens(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    return docs.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("token")
    )


class TestGuarantee:
    def test_frequent_items_always_survive(self, spark, tokens):
        """Every item with true frequency > total/(capacity+1) must be in
        the survivor set — the MG guarantee, checked against exact
        counts over the real token stream."""
        capacity = 64
        exact = {
            r.token: r.n
            for r in tokens.groupBy("token")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        total = sum(exact.values())
        threshold = total / (capacity + 1)
        must_survive = {t for t, n in exact.items() if n > threshold}
        got = approx_top_k(
            tokens, "token", k=len(must_survive) + 50, capacity=capacity
        ).collect()
        survivors = {r.item for r in got}
        assert must_survive <= survivors
        # and the exact recount matches the true counts
        for r in got:
            assert r.exact_weight == exact[r.item], r.item
            assert r.approx_weight <= r.exact_weight

    def test_topk_by_exact_weight_matches_groupby(self, spark, tokens):
        """With capacity comfortably above the heavy-hitter count, the
        top-k by exact weight equals the exact groupBy top-k."""
        exact_top = (
            tokens.groupBy("token")
            .agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "token")
            .limit(10)
            .collect()
        )
        got = approx_top_k(tokens, "token", k=10, capacity=512).collect()
        assert [(r.item, r.exact_weight) for r in got] == [
            (r.token, r.n) for r in exact_top
        ]


class TestMechanics:
    def test_weighted_items(self, spark):
        df = spark.createDataFrame(
            [("a", 100), ("b", 5), ("a", 50), ("c", 1)], ["item", "w"]
        )
        got = approx_top_k(df, "item", k=2, capacity=8, weight_col="w").collect()
        assert [(r.item, r.exact_weight) for r in got] == [("a", 150), ("b", 5)]

    def test_heavy_weight_arriving_at_full_table_survives(self, spark):
        """Adversarial weighted case: a huge-weight item arriving while
        the counter table is full must survive the MG decay — the naive
        "subtract w from everyone, drop the arrival" step wipes the
        table and loses the item (the r6 bug: capacity=1 with (a,1),
        (b,1000) returned an empty summary)."""
        df = spark.createDataFrame(
            [("a", 1), ("b", 1000)], ["item", "w"]
        ).coalesce(1)
        got = approx_top_k(df, "item", k=1, capacity=1, weight_col="w").collect()
        assert [(r.item, r.exact_weight) for r in got] == [("b", 1000)]
        # and the summary's lower bound keeps the guarantee: underestimate
        # by at most total/(capacity+1)
        assert got[0].approx_weight >= 1000 - (1001 // 2)

    def test_weighted_guarantee_under_churn(self, spark):
        """Weighted MG guarantee on a stream engineered to keep the table
        full: one dominant item mixed into a sea of distinct singletons.
        The dominant item must survive with any capacity >= 1."""
        rows = []
        for i in range(400):
            rows.append((f"noise_{i}", 3))
            if i % 4 == 0:
                rows.append(("hot", 50))
        df = spark.createDataFrame(rows, ["item", "w"]).coalesce(1)
        got = approx_top_k(df, "item", k=3, capacity=8, weight_col="w").collect()
        assert got[0].item == "hot"
        assert got[0].exact_weight == 100 * 50

    def test_nulls_and_nonpositive_weights_skipped(self, spark):
        df = spark.createDataFrame(
            [("a", 2), (None, 9), ("b", 0), ("b", -3), ("b", 1)],
            ["item", "w"],
        )
        got = approx_top_k(df, "item", k=5, capacity=8, weight_col="w").collect()
        assert {(r.item, r.exact_weight) for r in got} == {("a", 2), ("b", 1)}

    def test_invalid_params(self, spark, tokens):
        with pytest.raises(ValueError):
            approx_top_k(tokens, "token", k=0)
        with pytest.raises(ValueError):
            approx_top_k(tokens, "token", capacity=0)

    def test_shuffle_is_summary_bounded(self, spark, tokens):
        """The only rows that reach the merge aggregate come from the
        per-partition summaries (<= capacity each): the plan's first
        exchange sits ABOVE the Python summarizer, and the corpus-side
        exact recount joins through a broadcast, never a shuffle of the
        token stream."""
        out = approx_top_k(tokens, "token", k=5, capacity=32)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Exchange hashpartitioning(item" not in line:
                continue
            below = "\n".join(lines[i : i + 6])
            # within a few lines under the item-keyed exchanges there is
            # either the Python summarizer (merge side) or an aggregate
            # over the broadcast-pruned recount — never a raw Generate
            assert "Generate explode" not in lines[i + 1]
