"""Resampling + gap filling (operators/timeseries.py): dense grids,
bucket arithmetic, LOCF semantics, and a run over the real events
table."""

import datetime as dt

import pyspark.sql.functions as F
import pytest

from seafowl_spark.operators.timeseries import forward_fill, resample, rolling_stats

SF_DIR = "/root/testdata/sf0.001"


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def sparse(spark):
    rows = [
        ("a", _ts("2026-01-01T00:00:05"), 1.0),
        ("a", _ts("2026-01-01T00:00:07"), 3.0),
        # 10-20 s: gap for key a
        ("a", _ts("2026-01-01T00:00:25"), 5.0),
        ("b", _ts("2026-01-01T00:00:12"), 10.0),
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"])


class TestResample:
    def test_dense_grid_with_null_gaps(self, spark, sparse):
        out = resample(
            sparse,
            "ts",
            10,
            {"v_sum": F.sum("v"), "n": F.count(F.lit(1))},
            key_cols=["k"],
        ).orderBy("k", "bucket_ts")
        rows = [(r["k"], r["bucket_ts"].second, r["v_sum"], r["n"]) for r in out.collect()]
        assert rows == [
            ("a", 0, 4.0, 2),     # 05 + 07 share the :00 bucket
            ("a", 10, None, None),  # the gap EXISTS as a row
            ("a", 20, 5.0, 1),
            ("b", 10, 10.0, 1),   # b's grid spans only b's data
        ]

    def test_bucket_is_epoch_aligned(self, spark):
        df = spark.createDataFrame(
            [(_ts("2026-01-01T00:00:59"),)], ["ts"]
        )
        out = resample(df, "ts", 60, {"n": F.count(F.lit(1))}).collect()
        assert out[0]["bucket_ts"].second == 0

    def test_invalid_interval(self, spark, sparse):
        with pytest.raises(ValueError):
            resample(sparse, "ts", 0, {"n": F.count(F.lit(1))})


class TestForwardFill:
    def test_locf_fills_gaps_leading_nulls_stay(self, spark, sparse):
        grid = resample(
            sparse, "ts", 10, {"v_sum": F.sum("v")}, key_cols=["k"]
        )
        filled = forward_fill(grid, ["v_sum"], key_cols=["k"]).orderBy(
            "k", "bucket_ts"
        )
        rows = [(r["k"], r["bucket_ts"].second, r["v_sum"]) for r in filled.collect()]
        assert rows == [
            ("a", 0, 4.0),
            ("a", 10, 4.0),  # carried forward across the gap
            ("a", 20, 5.0),
            ("b", 10, 10.0),
        ]

    def test_leading_null_not_invented(self, spark):
        rows = [
            ("a", _ts("2026-01-01T00:00:15"), 2.0),
            ("a", _ts("2026-01-01T00:00:05"), None),
        ]
        df = spark.createDataFrame(rows, ["k", "ts", "v"])
        grid = resample(df, "ts", 10, {"v_last": F.max("v")}, key_cols=["k"])
        filled = forward_fill(grid, ["v_last"], key_cols=["k"]).orderBy(
            "bucket_ts"
        )
        vals = [r["v_last"] for r in filled.collect()]
        assert vals == [None, 2.0]  # nothing to carry into the first bucket

    def test_events_table_end_to_end(self, spark):
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "event_type", F.col("ts").cast("timestamp").alias("ts"), "value"
        )
        grid = resample(
            ev,
            "ts",
            3600,
            {"v_sum": F.sum(F.col("value").cast("decimal(25,6)")).cast("double")},
            key_cols=["event_type"],
        )
        filled = forward_fill(grid, ["v_sum"], key_cols=["event_type"])
        # dense: per key, bucket count == span/interval + 1
        import datetime as _dt

        spans = grid.groupBy("event_type").agg(
            F.min("bucket_ts").alias("lo"),
            F.max("bucket_ts").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        for r in spans.collect():
            want = int((r["hi"] - r["lo"]).total_seconds() // 3600) + 1
            assert r["n"] == want, r["event_type"]
        # forward fill leaves no NULLs after each key's first observation
        w = (
            filled.withColumn(
                "first_obs",
                F.min(F.when(F.col("v_sum").isNotNull(), F.col("bucket_ts"))).over(
                    __import__("pyspark.sql.window", fromlist=["Window"])
                    .Window.partitionBy("event_type")
                ),
            )
            .where(
                (F.col("bucket_ts") >= F.col("first_obs"))
                & F.col("v_sum").isNull()
            )
            .count()
        )
        assert w == 0


class TestPreEpoch:
    def test_pre_epoch_buckets_floor(self, spark):
        rows = [("a", _ts("1969-12-31T23:59:55"), 1.0)]
        df = spark.createDataFrame(rows, ["k", "ts", "v"])
        out = resample(
            df, "ts", 10, {"n": F.count(F.lit(1))}, key_cols=["k"]
        ).collect()
        b = out[0]["bucket_ts"]
        # floor semantics: the bucket STARTS at or before the event
        assert (b.year, b.second) == (1969, 50), b


class TestRollingStats:
    def test_matches_numpy_trailing_window(self, spark):
        import math

        rows = [("a", _ts(f"2024-01-01T{h:02d}:00:00"), float(v))
                for h, v in enumerate([1, 2, 4, 8, 16, 3, 3, 3])]
        df = spark.createDataFrame(rows, ["k", "ts", "v"])
        out = {
            r["ts"].hour: r
            for r in rolling_stats(
                df, "v", window=4, ts_col="ts", key_cols=["k"]
            ).collect()
        }
        vals = [1, 2, 4, 8, 16, 3, 3, 3]
        for h in range(8):
            w = vals[max(0, h - 3): h + 1]
            mean = sum(w) / len(w)
            var = max(sum(x * x for x in w) / len(w) - mean * mean, 0.0)
            assert abs(out[h]["roll_mean"] - mean) < 1e-9, h
            assert abs(out[h]["roll_var"] - var) < 1e-9, h
            if var > 0:
                z = (vals[h] - mean) / math.sqrt(var)
                assert abs(out[h]["zscore"] - z) < 1e-9, h
                assert out[h]["is_anomaly"] == int(abs(z) > 3)
            else:
                assert out[h]["zscore"] is None

    def test_all_null_window_stays_null(self, spark):
        rows = [("a", _ts("2024-01-01T00:00:00"), None),
                ("a", _ts("2024-01-01T01:00:00"), None),
                ("a", _ts("2024-01-01T02:00:00"), 5.0)]
        df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
        out = rolling_stats(
            df, "v", window=2, ts_col="ts", key_cols=["k"]
        ).orderBy("ts").collect()
        # leading all-NULL windows: no mean, no z, no ANSI div-by-zero
        assert out[0]["roll_mean"] is None and out[0]["zscore"] is None
        assert out[2]["roll_mean"] == 5.0


class TestInterpolateLinear:
    """Linear interpolation (operators/timeseries.interpolate_linear,
    r8): straight line between nearest non-NULL neighbors; edge gaps
    stay NULL; observed points pass through untouched."""

    def test_interpolates_interior_gaps(self, spark):
        import datetime as dt

        from seafowl_spark.operators.timeseries import interpolate_linear

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("a", t0, 10.0),
            ("a", t0 + dt.timedelta(hours=1), None),
            ("a", t0 + dt.timedelta(hours=2), None),
            ("a", t0 + dt.timedelta(hours=3), 40.0),
            ("a", t0 + dt.timedelta(hours=4), None),  # trailing: stays NULL
            ("b", t0, None),  # leading: stays NULL
            ("b", t0 + dt.timedelta(hours=1), 7.0),
        ]
        df = spark.createDataFrame(rows, "k string, bucket_ts timestamp, v double")
        out = {
            (r["k"], r["bucket_ts"].hour): r["v"]
            for r in interpolate_linear(
                df, ["v"], key_cols=["k"]
            ).collect()
        }
        assert out[("a", 0)] == 10.0
        assert out[("a", 1)] == 20.0
        assert out[("a", 2)] == 30.0
        assert out[("a", 3)] == 40.0
        assert out[("a", 4)] is None
        assert out[("b", 0)] is None
        assert out[("b", 1)] == 7.0

    def test_uneven_spacing_uses_time_weights(self, spark):
        import datetime as dt

        from seafowl_spark.operators.timeseries import interpolate_linear

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("a", t0, 0.0),
            ("a", t0 + dt.timedelta(seconds=100), None),
            ("a", t0 + dt.timedelta(seconds=400), 4.0),
        ]
        df = spark.createDataFrame(rows, "k string, bucket_ts timestamp, v double")
        out = sorted(
            r["v"]
            for r in interpolate_linear(df, ["v"], key_cols=["k"]).collect()
        )
        # 100/400 of the way from 0 to 4 -> 1.0 exactly
        assert out == [0.0, 1.0, 4.0]
