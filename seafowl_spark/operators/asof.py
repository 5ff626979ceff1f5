"""As-of join: for each left row, the most recent right row at or before
the left timestamp, per key.

Spark has no ASOF JOIN operator (DuckDB/Pandas do); the scalable
construction is the union-and-carry trick:

1. tag and union both inputs on (key, t),
2. one window sort per key over time (right rows ordered before left rows
   at equal t, so "at or before" includes ties),
3. last_value(ignore nulls) carries the latest right payload forward,
4. keep the left rows.

Cost: ONE shuffle on the key + one sort — same as a single sort-merge
join, no range explosion, no per-row subqueries. This is the 100 TB shape;
the naive alternative (theta join on t_left >= t_right then argmax per
row) is quadratic per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    how: str = "left",
) -> DataFrame:
    """Join each left row to the latest right row with
    right[right_ts] <= left[left_ts] and matching `on` key.

    Returns all left columns plus `right_payload` columns (NULL when no
    right row precedes). `how='inner'` drops unmatched left rows.
    """
    lcols = left.columns
    left_t = left.select(*lcols).schema.simpleString()
    right_t = right.select(*right_payload).schema.simpleString()

    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.struct(*lcols).alias("__left"),
        F.lit(None).cast(right_t).alias("__right"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        F.lit(None).cast(left_t).alias("__left"),
        F.struct(*right_payload).alias("__right"),
    )

    # right rows sort BEFORE left rows at equal __t => ties count as matched
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", F.desc("__is_right"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).withColumn(
        "__matched", F.last("__right", ignorenulls=True).over(w)
    )
    kept = carried.where(F.col("__is_right") == 0)
    if how == "inner":
        kept = kept.where(F.col("__matched").isNotNull())
    return kept.select(
        *[F.col("__left").getField(c).alias(c) for c in lcols],
        *[F.col("__matched").getField(c).alias(c) for c in right_payload],
    )
