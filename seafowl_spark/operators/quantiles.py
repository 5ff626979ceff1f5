"""Approximate quantiles with bounded state — the last member of the
sketch family (HLL distinct counts, Count-Min frequencies, Misra-Gries
heavy hitters, and now rank/quantile queries).

The 100 TB question: "p50/p95/p99 of document length / tokens / quality
score per source" — exact percentiles need a full sort per group, a
sketch needs one pass with O(1/eps) state per group. Spark ships the
right sketch JVM-side (``percentile_approx`` — a Greenwald-Khanna
variant with mergeable partial state, so it map-side combines like any
aggregate); the Spark-first move is to wrap it, not hand-roll a t-digest
in Python:

* :func:`quantile_summary` — per-group quantiles in ONE aggregate pass;
  the shuffle carries one sketch per (group, column), never rows.
  ``accuracy`` trades state for error: rank error <= 1/accuracy
  (asserted against exact quantiles in test_quantiles.py).
* streaming: the same expression works inside watermarked windowed
  aggregates — the sketch is the bounded per-window state
  (test_quantiles.py runs it over a file stream).

Exact percentiles stay available where graded determinism matters
(q_grouping_multi's ``pct`` branch uses exact ``percentile``); the
sketch is the scale path, deliberately pytest-gated on its error bound
rather than value-graded — approximate answers have no bit-exact DuckDB
mirror (the same honesty rule as q_approx_distinct's HLL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def approx_quantiles(
    col: Column, qs: list[float], accuracy: int = 10_000
) -> Column:
    """array<double> of approximate quantiles of ``col`` at fractions
    ``qs`` — rank error <= 1/accuracy, state O(accuracy) per group."""
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError("qs must be fractions in [0, 1]")
    return F.percentile_approx(
        col, F.array(*[F.lit(float(q)) for q in qs]), F.lit(accuracy)
    )


def quantile_summary(
    df: DataFrame,
    value_col: str,
    qs: list[float] = (0.5, 0.95, 0.99),
    group_cols: list[str] | None = None,
    accuracy: int = 10_000,
) -> DataFrame:
    """One-pass per-group quantile summary: (group..., q, value) rows.
    The aggregate's partial state is one mergeable sketch per group —
    map-side combined, so the shuffle is groups x sketch, never rows."""
    qs = list(qs)
    keys = list(group_cols or [])
    agg = df.groupBy(*keys).agg(
        approx_quantiles(F.col(value_col), qs, accuracy).alias("__qv")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(q)) for q in qs]).alias("q"),
        F.col("__qv").alias("value"),
    )
    return (
        agg.select(*keys, F.explode(pairs).alias("__p"))
        .select(
            *keys,
            F.col("__p.q").alias("q"),
            F.col("__p.value").cast("double").alias("value"),
        )
    )
