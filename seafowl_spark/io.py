"""Testdata table access (TESTDATA.md).

Tables are one parquet file each under ``{sf_dir}/{name}.parquet``; at real
scale each would be a partitioned directory — every reader here goes through
``spark.read.parquet`` so the same code handles both layouts, and Catalyst
gets filter pushdown + column pruning on the scan for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# dimensions small enough to always broadcast in joins (at any realistic SF)
BROADCAST_TABLES = {"region", "nation", "supplier", "part", "customer"}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # timestamp semantics must match the DuckDB oracle's naive-UTC reads
    # even when the hosting session (e.g. the driver's) wasn't built by us
    if spark.conf.get("spark.sql.session.timeZone") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # runtime-settable; makes this loader work in sessions we did not
        # build (e.g. the driver's own smoke session)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts has shipped as TIMESTAMP(NANOS) (older testdata drops) and as
    # naive TIMESTAMP(MICROS) (current drops, surfaced as TIMESTAMP_NTZ by
    # Spark 4's inferTimestampNTZ default). Normalize both to a session-tz
    # TIMESTAMP so downstream unix_micros/date arithmetic is type-stable:
    #   - nanos -> BIGINT via spark.sql.legacy.parquet.nanosAsLong, then
    #     truncate to micros (same as DuckDB/Arrow ns->us) and rebuild;
    #   - TIMESTAMP_NTZ -> cast to TIMESTAMP, which with the UTC session
    #     pin above interprets the naive value as UTC — identical to how
    #     the DuckDB oracle treats it.
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif f.name == "ts" and f.dataType.simpleString() == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register temp views so spark.sql() queries can refer to bare names.

    Mirrors the reference's per-query catalog reload (reference
    src/context/mod.rs:89-112) — cheap in Spark because temp views are
    just plan aliases.
    """
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
