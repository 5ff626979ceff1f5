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


class TestDeterministicShuffle:
    def test_permutation_is_stable_and_seed_dependent(self, spark):
        from seafowl_spark.operators.sampling import deterministic_shuffle_key

        import pyspark.sql.functions as F

        df = spark.range(200).select(F.col("id").alias("doc_id"))
        def order(seed):
            return [
                r["doc_id"]
                for r in df.orderBy(
                    deterministic_shuffle_key(F.col("doc_id"), seed), "doc_id"
                ).collect()
            ]
        a, b = order("s1"), order("s1")
        assert a == b  # reproducible
        assert a != order("s2")  # epochs reshuffle
        assert sorted(a) == list(range(200))  # a permutation

    def test_shard_local_variant_has_no_exchange(self, spark):
        import pyspark.sql.functions as F

        from seafowl_spark.operators.sampling import deterministic_shuffle_key

        df = spark.range(100).select(F.col("id").alias("doc_id"))
        local = df.sortWithinPartitions(
            deterministic_shuffle_key(F.col("doc_id"), "s")
        )
        p = local._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p


class TestCapPerGroup:
    def _df(self, spark):
        rows = [(i, "a" if i < 50 else "b", float(i % 7)) for i in range(60)]
        return spark.createDataFrame(rows, ["doc_id", "source", "quality"])

    def test_caps_and_is_deterministic(self, spark):
        from seafowl_spark.operators.sampling import cap_per_group

        df = self._df(spark)
        out = cap_per_group(df, "source", 10)
        got = [tuple(r) for r in out.orderBy("doc_id").collect()]
        counts = {}
        for _id, s, _q in got:
            counts[s] = counts.get(s, 0) + 1
        assert counts == {"a": 10, "b": 10}
        again = [
            tuple(r)
            for r in cap_per_group(df, "source", 10).orderBy("doc_id").collect()
        ]
        assert got == again

    def test_small_groups_untouched(self, spark):
        from seafowl_spark.operators.sampling import cap_per_group

        df = self._df(spark)
        assert cap_per_group(df, "source", 1000).count() == 60

    def test_quality_first_keeps_best(self, spark):
        import pyspark.sql.functions as F

        from seafowl_spark.operators.sampling import cap_per_group

        df = self._df(spark)
        out = cap_per_group(df, "source", 5, weight_col="quality")
        mins = {
            r["source"]: r["mn"]
            for r in out.groupBy("source")
            .agg(F.min("quality").alias("mn"))
            .collect()
        }
        # group a (50 rows, quality i%7): seven rows at 6.0 -> top-5 all 6.0
        # group b (10 rows, qualities {0,1,1,2,2,3,3,4,5,6}) -> top-5 min 3.0
        assert mins["a"] == 6.0
        assert mins["b"] == 3.0


class TestSplitAssign:
    def test_disjoint_stable_and_proportional(self, spark):
        import pyspark.sql.functions as F

        from seafowl_spark.operators.sampling import split_assign

        df = spark.range(10_000).select(F.col("id").alias("doc_id"))
        fr = {"train": 0.8, "val": 0.1, "test": 0.1}
        lab = df.withColumn("split", split_assign(F.col("doc_id"), fr))
        counts = {
            r["split"]: r["n"]
            for r in lab.groupBy("split").agg(F.count("*").alias("n")).collect()
        }
        assert set(counts) == set(fr)
        for name, frac in fr.items():
            assert abs(counts[name] / 10_000 - frac) < 0.02, (name, counts)
        again = {
            r["doc_id"]: r["split"]
            for r in lab.collect()
        }
        twice = {
            r["doc_id"]: r["split"]
            for r in df.withColumn(
                "split", split_assign(F.col("doc_id"), fr)
            ).collect()
        }
        assert again == twice  # bit-stable

    def test_seed_changes_assignment(self, spark):
        import pyspark.sql.functions as F

        from seafowl_spark.operators.sampling import split_assign

        df = spark.range(500).select(F.col("id").alias("doc_id"))
        fr = {"a": 0.5, "b": 0.5}
        one = [r["s"] for r in df.select(split_assign(F.col("doc_id"), fr, "s1").alias("s")).collect()]
        two = [r["s"] for r in df.select(split_assign(F.col("doc_id"), fr, "s2").alias("s")).collect()]
        assert one != two

    def test_bad_fractions_rejected(self, spark):
        import pyspark.sql.functions as F
        import pytest as _pt

        from seafowl_spark.operators.sampling import split_assign

        with _pt.raises(ValueError):
            split_assign(F.col("x"), {"a": 0.5, "b": 0.6})
