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


# r13 (guide §1/§5 — the driver does almost no data work): one
# spark.read.parquet costs ~100 ms of driver time (fresh InMemoryFileIndex
# + footer schema read, uncached across calls), and table() ~190 ms with
# the conf checks; queries call it 1-7 times PER INVOCATION, so a 6-table
# join paid ~1 s of pure plan-construction overhead per run. The memo
# reuses the immutable DataFrame HANDLE (a logical plan — no data, no
# results; every execution still scans parquet) per (application, dir,
# table), exactly the hot catalog a long-lived server session keeps. Keyed
# on applicationId so a new session never sees a stale plan.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(key)
    if cached is not None:
        return cached
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
    _TABLE_CACHE[key] = df
    return df


def widen(df: DataFrame, *keys: str) -> DataFrame:
    """Spread a parallelism-collapsed scan across the cluster (r13, guide
    §2.5 "input skew ... one huge unsplittable file: repartition
    immediately after the read").

    The local testdata tables are single parquet files with ONE row group
    — unsplittable, so the scan and every narrow operator above it (the
    whole stage up to the first exchange: filters, projections, partial
    aggregation, UDF evaluation) runs as one task regardless of
    maxPartitionBytes. Queries whose map-side work dominates call this
    right after projecting down to the columns they need; when the scan
    already yields at least the session's parallelism (any real multi-file
    / multi-row-group table — i.e. every 100 TB layout), it is a no-op, so
    no extra exchange ever appears at scale.

    Pass a unique-ish key so the spread is a deterministic hash
    partitioning: keyless round-robin repartition pays a per-task local
    sort (spark.sql.execution.sortBeforeRepartition) to stay
    retry-deterministic; hashing an existing key needs neither the sort
    nor the determinism caveat.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    if keys:
        return df.repartition(par, *[F.col(k) for k in keys])
    return df.repartition(par)


def table_rows(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Exact row count from parquet footer metadata when the table is a
    local file/directory — a driver-side metadata read, no Spark job
    (r13, guide §5: the count previously cost one full job per query
    invocation just to parameterize planes_for_corpus). Falls back to a
    Spark count (itself footer-served under parquet aggregate pushdown)
    for layouts the local reader cannot see. Recomputed per call —
    nothing is cached."""
    import os

    path = f"{sf_dir}/{name}.parquet"
    try:
        import pyarrow.parquet as pq

        if os.path.isfile(path):
            return pq.ParquetFile(path).metadata.num_rows
        if os.path.isdir(path):
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    if f.endswith(".parquet"):
                        total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
            if total:
                return total
    except Exception:  # noqa: BLE001 - any reader gap routes to the Spark path
        pass
    return table(spark, sf_dir, name).count()


def read_small_parquet(path: str) -> list[dict] | None:
    """Driver-side read of a TINY parquet sidecar (index stats/meta —
    bounded by construction: one row per write) as a list of dicts, or
    None when the path isn't visible to the local reader (remote stores
    fall back to the Spark path). Saves one Spark job + its stages per
    serving lookup (r13, guide §5 — driver metadata work should not be a
    cluster job). Re-read on every call; nothing is cached."""
    import os

    try:
        import pyarrow.parquet as pq

        if not (os.path.isfile(path) or os.path.isdir(path)):
            return None
        return pq.read_table(path).to_pylist()
    except Exception:  # noqa: BLE001 - any local-reader gap -> Spark path
        return None


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register temp views so spark.sql() queries can refer to bare names.

    Mirrors the reference's per-query catalog reload (reference
    src/context/mod.rs:89-112) — cheap in Spark because temp views are
    just plan aliases.
    """
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
