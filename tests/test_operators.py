"""Custom distributed operators: skew-salted join equivalence."""

from pyspark.sql import functions as F

from seafowl_spark.operators.skew import salted_join
from tests.conftest import rows


class TestSaltedJoin:
    def test_inner_equivalence_with_hot_key(self, spark):
        # hot key: 90% of left rows share key 7
        left = spark.range(0, 1000).select(
            F.when(F.col("id") % 10 != 0, 7).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") * 100).alias("w")
        )
        plain = left.join(right, "k").groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
        )
        salted = salted_join(left, right, "k").groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
        )
        assert rows(plain) == rows(salted)

    def test_left_join_preserves_unmatched(self, spark):
        left = spark.range(0, 20).select(F.col("id").alias("k"))
        right = spark.range(0, 5).select(F.col("id").alias("k"), F.lit("m").alias("tag"))
        out = salted_join(left, right, "k", how="left")
        got = rows(out)
        assert len(got) == 20
        assert sum(1 for _, tag in got if tag is None) == 15


class TestApproxDistinct:
    def test_approx_count_distinct_accuracy(self, spark):
        """HLL++ estimate within its configured relative error of the exact
        COUNT(DISTINCT) — keeps the approx-distinct operator verified now
        that its registry row's slot went to q_bpe_train (r7)."""
        from seafowl_spark.queries.relational import q_approx_distinct

        got = {
            r.event_type: (r.approx_users, r.n_events)
            for r in q_approx_distinct(spark, "/root/testdata/sf0.001").collect()
        }
        exact = {
            r.event_type: (r.exact_users, r.n_events)
            for r in spark.read.parquet("/root/testdata/sf0.001/events.parquet")
            .groupBy("event_type")
            .agg(
                F.countDistinct("user_id").alias("exact_users"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .collect()
        }
        assert set(got) == set(exact)
        for et, (approx, n) in got.items():
            ex, n_ex = exact[et]
            assert n == n_ex
            # rsd=0.01 requested; allow 5x slack for small groups
            assert abs(approx - ex) <= max(0.05 * ex, 2), (et, approx, ex)
