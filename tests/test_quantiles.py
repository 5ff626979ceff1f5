"""Approximate quantiles (operators/quantiles.py): rank-error bound vs
exact quantiles, per-group summaries, and the streaming windowed form."""

import pyspark.sql.functions as F
import pytest

from seafowl_spark.operators.quantiles import approx_quantiles, quantile_summary

SF_DIR = "/root/testdata/sf0.001"


class TestQuantileSummary:
    def test_rank_error_bound_vs_exact(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        n = docs.count()
        exact_sorted = [
            r["n_chars"] for r in docs.orderBy("n_chars").collect()
        ]
        qs = [0.1, 0.5, 0.9, 0.99]
        acc = 1000
        got = {
            r["q"]: r["value"]
            for r in quantile_summary(
                docs, "n_chars", qs, accuracy=acc
            ).collect()
        }
        for q in qs:
            # GK guarantee: the returned value's RANK is within n/acc of
            # the target rank
            import bisect

            lo = bisect.bisect_left(exact_sorted, got[q])
            hi = bisect.bisect_right(exact_sorted, got[q])
            target = q * n
            slack = n / acc + 1
            assert lo - slack <= target <= hi + slack, (q, got[q])

    def test_per_group_and_monotone(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        out = quantile_summary(
            docs, "n_chars", [0.25, 0.5, 0.75], group_cols=["lang"]
        ).collect()
        by_lang = {}
        for r in out:
            by_lang.setdefault(r["lang"], {})[r["q"]] = r["value"]
        langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
        assert set(by_lang) == langs
        for lang, vals in by_lang.items():
            assert vals[0.25] <= vals[0.5] <= vals[0.75], lang

    def test_invalid_fraction_rejected(self, spark):
        with pytest.raises(ValueError):
            approx_quantiles(F.col("x"), [1.5])

    def test_streaming_windowed_quantiles(self, spark, tmp_path):
        """The sketch as bounded per-window streaming state: p50/p95 of a
        value column per tumbling event-time window."""
        import json

        src = tmp_path / "src"
        src.mkdir()
        rows = [
            {"ts": f"2026-01-01T00:00:{s:02d}", "v": float(v)}
            for s, v in zip(range(40), list(range(100, 140)))
        ]
        (src / "b0.json").write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n"
        )
        stream = (
            spark.readStream.schema("ts string, v double")
            .json(str(src))
            .select(F.col("ts").cast("timestamp").alias("ts"), "v")
            .withWatermark("ts", "10 seconds")
        )
        agg = stream.groupBy(
            F.window("ts", "20 seconds").alias("w")
        ).agg(approx_quantiles(F.col("v"), [0.5, 0.95], 1000).alias("qv"))
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("qtest")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["w"]["start"].second: r["qv"]
            for r in spark.sql("SELECT * FROM qtest").collect()
        }
        # two 20 s windows over values 100..119 and 120..139
        assert set(got) == {0, 20}
        assert abs(got[0][0] - 110) <= 1 and abs(got[20][0] - 130) <= 1
        assert abs(got[0][1] - 119) <= 1 and abs(got[20][1] - 139) <= 1


class TestStreamingApproxDistinct:
    def test_windowed_hll_distinct_counts(self, spark, tmp_path):
        """approx_count_distinct as bounded per-window streaming state —
        the HLL member of the sketch family over a watermarked stream
        (Count-Min and quantiles already have streaming twins)."""
        import json

        src = tmp_path / "hll_src"
        src.mkdir()
        rows = [
            {"ts": f"2026-01-01T00:00:{s:02d}", "u": s % 7}
            for s in range(40)
        ]
        (src / "b0.json").write_text(
            "\n".join(json.dumps(r) for r in rows) + "\n"
        )
        stream = (
            spark.readStream.schema("ts string, u long")
            .json(str(src))
            .select(F.col("ts").cast("timestamp").alias("ts"), "u")
            .withWatermark("ts", "10 seconds")
        )
        agg = stream.groupBy(F.window("ts", "20 seconds").alias("w")).agg(
            F.approx_count_distinct("u").alias("nd"),
            F.count(F.lit(1)).alias("n"),
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("hlltest")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["w"]["start"].second: (r["nd"], r["n"])
            for r in spark.sql("SELECT * FROM hlltest").collect()
        }
        assert set(got) == {0, 20}
        for sec, (nd, n) in got.items():
            assert n == 20
            # 7 distinct values; HLL at default rsd is exact at this size
            assert nd == 7, (sec, nd)
