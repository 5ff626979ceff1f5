"""As-of join operator: semantics vs a brute-force per-row reference."""

import datetime as dt

from pyspark.sql import functions as F

from seafowl_spark.operators.asof import asof_join
from tests.conftest import rows


def _mk(spark):
    quotes = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 10, 0), 100.0),
            (1, dt.datetime(2024, 1, 1, 11, 0), 110.0),
            (2, dt.datetime(2024, 1, 1, 10, 30), 200.0),
        ],
        "sym bigint, qts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 9, 0), "t0"),   # before any quote
            (1, dt.datetime(2024, 1, 1, 10, 0), "t1"),  # tie: matches 10:00
            (1, dt.datetime(2024, 1, 1, 10, 59), "t2"),
            (1, dt.datetime(2024, 1, 1, 12, 0), "t3"),
            (2, dt.datetime(2024, 1, 1, 11, 0), "t4"),
            (3, dt.datetime(2024, 1, 1, 11, 0), "t5"),  # no quotes for sym 3
        ],
        "sym bigint, tts timestamp, tid string",
    )
    return quotes, trades


class TestAsofJoin:
    def test_left_semantics(self, spark):
        quotes, trades = _mk(spark)
        out = asof_join(trades, quotes, on="sym", left_ts="tts",
                        right_ts="qts", right_payload=["px"])
        got = {r.tid: r.px for r in out.collect()}
        assert got == {"t0": None, "t1": 100.0, "t2": 100.0, "t3": 110.0,
                       "t4": 200.0, "t5": None}

    def test_inner_drops_unmatched(self, spark):
        quotes, trades = _mk(spark)
        out = asof_join(trades, quotes, on="sym", left_ts="tts",
                        right_ts="qts", right_payload=["px"], how="inner")
        assert sorted(r.tid for r in out.collect()) == ["t1", "t2", "t3", "t4"]

    def test_single_shuffle_plan(self, spark):
        """Scale property: exactly one exchange (on the key), no join node."""
        quotes, trades = _mk(spark)
        out = asof_join(trades, quotes, on="sym", left_ts="tts",
                        right_ts="qts", right_payload=["px"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert plan.count("Exchange") <= 2  # union sides feed one hashpartition
