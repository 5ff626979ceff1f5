"""Bucketed materialization for shuffle-free (co-located) joins.

Not in the reference (single-node DataFusion has no shuffle to avoid) —
this is the Spark scale story for the repo's own self-join-heavy
operators: MinHash/SimHash band joins and ANN bucket joins re-join the
same corpus on the same key repeatedly. Materializing the corpus ONCE as
a Spark bucketed table hash-splits the data into N sorted files per the
join key; every later equi-join on that key reads co-located buckets and
skips the exchange entirely (`SortMergeJoin` over two bucketed scans with
no `Exchange` below it). At 100 TB this converts per-query shuffles of
the whole corpus into a one-time write.

Spark-native: ``DataFrameWriter.bucketBy`` + ``sortBy`` +
``saveAsTable`` (Hive-style bucketing in the session catalog); joins pick
up the layout through ``spark.sql.sources.bucketing.enabled`` (on by
default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) catalog table.

    Pick ``num_buckets`` so each bucket of the MATERIALIZED table is a
    few hundred MB at target scale: buckets are the parallelism floor for
    every downstream co-located join.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort:
        w = w.sortBy(*bucket_cols)
    w.format("parquet").saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously materialized with the SAME bucket spec
    on the join key. The resulting plan has no shuffle on either side —
    assert with ``assert_no_shuffle`` in tests."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def assert_no_shuffle(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle exchange (broadcast
    exchanges are fine — they move the small side, not the corpus)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            raise AssertionError(f"plan contains a shuffle exchange:\n{plan}")
