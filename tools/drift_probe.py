"""FROZEN host-drift probe — DO NOT EDIT (the point is that it never changes).

A byte-stable vendored snapshot of round 1's `q01_pricing_summary`
(commit 78377e8, seafowl_spark/queries/relational.py + functions/__init__.py),
fully self-contained: no imports from the evolving `seafowl_spark` package,
raw `spark.read.parquet` scan. bench.py runs this each round and reports the
wall-clock next to the headline numbers as `drift_probe`, so cross-round
totals can be normalized by host speed instead of re-litigating environment
drift (r4 verdict: the uniform r2->r4 "slowdown" was the machine, not the
code — this probe makes that check mechanical).

`R6_BASELINE_SEC` is the min over nine runs (3x run_probe(n=3)) of this
exact probe on the round-6
host/testdata (sf0.1, local[32]); `ratio` > 1 means the current host is
slower than round 6's by that factor.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# min-of-9 on the round-6 driver host, sf0.1, local[32] (recorded once when
# the probe was introduced; see BENCH_r06.json)
R6_BASELINE_SEC = 1.14


def _dec_sum(col, prec: int = 25, scale: int = 6):
    return F.sum(col.cast(f"decimal({prec},{scale})")).cast("double")


def _dec_avg(col, prec: int = 25, scale: int = 6):
    return F.sum(col.cast(f"decimal({prec},{scale})")).cast("double") / F.count(col)


def frozen_q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-1 q01_pricing_summary, frozen (TPC-H Q1 shape)."""
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum(F.col("l_quantity")).alias("sum_qty"),
        _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        _dec_sum(disc_price).alias("sum_disc_price"),
        _dec_sum(charge).alias("sum_charge"),
        _dec_avg(F.col("l_quantity")).alias("avg_qty"),
        _dec_avg(F.col("l_extendedprice")).alias("avg_price"),
        _dec_avg(F.col("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


def run_probe(spark: SparkSession, sf_dir: str, n: int = 3) -> dict:
    """Execute the frozen query n times (noop sink), return drift stats."""
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        frozen_q01(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    sec = round(best, 3)
    return {
        "frozen": "r1_q01(78377e8)",
        "sec": sec,
        "baseline_sec": R6_BASELINE_SEC,
        # ratio derives from the ROUNDED sec so the reported pair is
        # self-consistent (ratio == round(sec/baseline, 3) exactly)
        "ratio": round(sec / R6_BASELINE_SEC, 3),
    }
