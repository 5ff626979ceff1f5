"""Extended operator coverage: scalar-function breadth (math, date
arithmetic, null handling), HAVING, UNION DISTINCT, cross join, combined
filter pushdown, BPE-ish regex tokenization, and an IVF-style ANN variant.
Same determinism rules as relational.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import dec_sum
from ..io import table
from . import register


# q_null_handling (COALESCE / NULLIF / IS NULL over outer-join nulls) was
# folded into relational.q_join_left in round 5 (and with it into
# q_join_full_outer's 'left' branch in round 7) to free graded-window slots
# for the round-4 operators; the same expressions run there over the same
# outer join.


@register(
    "q_scalar_breadth",
    oracle="""
    SELECT o_orderkey,
           abs(o_totalprice - 100000.0) AS dist,
           CAST(ceil(o_totalprice) AS BIGINT) AS c,
           CAST(floor(o_totalprice) AS BIGINT) AS f,
           round(sqrt(o_totalprice), 6) AS sq,
           round(ln(o_totalprice), 6) AS lg,
           CAST(o_orderkey % 7 AS BIGINT) AS keymod,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_epoch_start,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           EXTRACT(dow FROM o_orderdate) AS dow,
           EXTRACT(year FROM o_orderdate) AS y,
           EXTRACT(quarter FROM o_orderdate) AS q,
           EXTRACT(month FROM o_orderdate) AS m,
           CAST(sign(o_totalprice - 100000.0) AS BIGINT) AS sgn,
           CAST(GREATEST(o_orderkey % 7, 3) AS BIGINT) AS gr,
           CAST(LEAST(o_orderkey % 7, 3) AS BIGINT) AS le,
           CAST(o_orderkey & 255 AS BIGINT) AS band,
           CAST(o_orderkey | 4096 AS BIGINT) AS bor,
           CAST(xor(o_orderkey, 15) AS BIGINT) AS bxor,
           CAST((o_orderkey % 1024) << 3 AS BIGINT) AS shl,
           CAST(o_orderkey >> 2 AS BIGINT) AS shr,
           ascii(o_orderpriority) AS asc_c,
           left(o_orderpriority, 3) AS l3,
           lpad(o_orderpriority, 12, '*') AS pad,
           reverse(o_orderpriority) AS rev,
           translate(o_orderpriority, '-', '_') AS tr,
           CAST(levenshtein(o_orderpriority, '1-URGENT') AS BIGINT) AS lev,
           regexp_extract(o_orderpriority, '([0-9]+)', 1) AS prio_num,
           sha256(o_orderpriority) AS prio_sha,
           NULLIF(CAST(o_orderkey % 3 AS BIGINT), 0) AS nz
    FROM orders
    """,
)
def q_scalar_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function breadth in one pass over orders: math surface
    (abs/ceil/floor/sqrt/ln/mod, rounded where the final libm step could
    differ in the last bit) plus date arithmetic (interval add, datediff,
    truncation, day-of-week; DuckDB dow: Sunday=0 == Spark dayofweek-1;
    EXTRACT year/quarter/month absorbed from q_datetime_distinct in r6),
    and since r8 the comparison/bit/string surface: sign, greatest/least,
    bitwise and/or/xor + shifts, ascii/left/lpad/reverse/translate,
    levenshtein, regexp_extract, sha256, NULLIF — all value-compared."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.abs(F.col("o_totalprice") - 100000.0).alias("dist"),
        F.ceil("o_totalprice").cast("long").alias("c"),
        F.floor("o_totalprice").cast("long").alias("f"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sq"),
        F.round(F.log("o_totalprice"), 6).alias("lg"),
        (F.col("o_orderkey") % 7).cast("long").alias("keymod"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast("long").alias(
            "days_since_epoch_start"
        ),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.year("o_orderdate").cast("long").alias("y"),
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.signum(F.col("o_totalprice") - 100000.0).cast("long").alias("sgn"),
        F.greatest(F.col("o_orderkey") % 7, F.lit(3)).cast("long").alias("gr"),
        F.least(F.col("o_orderkey") % 7, F.lit(3)).cast("long").alias("le"),
        F.col("o_orderkey").bitwiseAND(255).cast("long").alias("band"),
        F.col("o_orderkey").bitwiseOR(4096).cast("long").alias("bor"),
        F.col("o_orderkey").bitwiseXOR(15).cast("long").alias("bxor"),
        F.shiftleft(F.col("o_orderkey") % 1024, 3).cast("long").alias("shl"),
        F.shiftright(F.col("o_orderkey"), 2).cast("long").alias("shr"),
        F.ascii("o_orderpriority").alias("asc_c"),
        F.substring("o_orderpriority", 1, 3).alias("l3"),
        F.lpad("o_orderpriority", 12, "*").alias("pad"),
        F.reverse(F.col("o_orderpriority")).alias("rev"),
        F.translate(F.col("o_orderpriority"), "-", "_").alias("tr"),
        F.levenshtein(F.col("o_orderpriority"), F.lit("1-URGENT"))
        .cast("long")
        .alias("lev"),
        F.regexp_extract("o_orderpriority", r"([0-9]+)", 1).alias("prio_num"),
        F.sha2(F.col("o_orderpriority").cast("binary"), 256).alias("prio_sha"),
        F.nullif((F.col("o_orderkey") % 3).cast("long"), F.lit(0)).alias("nz"),
    )


# q_cross_join was absorbed into q_join_non_equi in round 6 (its explicit
# crossJoin + VALUES-scan branch rides there as the 'region_pair' union
# branch, plan shape unchanged) to free a graded slot for
# q_bm25_search/q_nb_classify.


@register(
    "q_combined_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    WHERE (l_shipdate > TIMESTAMP '2000-06-01' OR l_returnflag = 'R')
      AND (l_quantity > 45.0 OR l_discount < 0.01)
      AND l_linestatus = 'F'
    """,
)
def q_combined_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-type disjunctive filter (the reference's remote-table pushdown
    test shape, query.rs:276-295) — all four predicates reach the scan."""
    l = table(spark, sf_dir, "lineitem")
    return l.where(
        (
            (F.col("l_shipdate") > F.lit("2000-06-01").cast("timestamp"))
            | (F.col("l_returnflag") == "R")
        )
        & ((F.col("l_quantity") > 45.0) | (F.col("l_discount") < 0.01))
        & (F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")


def _sql_l2(a: str, b: str) -> str:
    """Unrolled squared-L2 chain, left-fold order — bit-identical to the
    fixed-order numpy accumulation in functions/vec._centroid_scores."""
    from .similarity import EMB_DIM

    return " + ".join(
        f"(({a}[{i}] - {b}[{i}]) * ({a}[{i}] - {b}[{i}]))"
        for i in range(1, EMB_DIM + 1)
    )


def _ivf_oracle() -> str:
    """One unrolled Lloyd step, mirroring fit_kmeans(k=16, max_iter=1):
    init = 16 lowest-id vectors (cid = position in vec_id order), assign
    by squared-L2 argmin (first-min-wins == ROW_NUMBER d ASC, cid), update
    = per-(cell, dim) DECIMAL(25,6)-exact means with empty cells keeping
    their init position, then the final full-corpus assignment against
    the updated codebook."""
    from .similarity import EMB_DIM, _sql_dot

    return f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cid, emb AS cemb
           FROM v ORDER BY vec_id LIMIT 16),
    d0 AS (SELECT v.vec_id, c0.cid, ({_sql_l2('v.emb', 'c0.cemb')}) AS d
           FROM v CROSS JOIN c0),
    a0 AS (SELECT vec_id, cid AS cell FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d ASC, cid) AS rn
             FROM d0) WHERE rn = 1),
    sums AS (SELECT a0.cell, t.i AS pos,
                    CAST(SUM(CAST(v.emb[t.i] AS DECIMAL(25,6))) AS DOUBLE)
                      / COUNT(*) AS m
             FROM v JOIN a0 ON v.vec_id = a0.vec_id,
                  range(1, {EMB_DIM + 1}) t(i)
             GROUP BY a0.cell, t.i),
    c1 AS (SELECT c0.cid, COALESCE(nl.cemb, c0.cemb) AS cemb
           FROM c0 LEFT JOIN (SELECT cell AS cid, list(m ORDER BY pos) AS cemb
                              FROM sums GROUP BY cell) nl
             ON c0.cid = nl.cid),
    d1 AS (SELECT v.vec_id, c1.cid, ({_sql_l2('v.emb', 'c1.cemb')}) AS d
           FROM v CROSS JOIN c1),
    cellf AS (SELECT vec_id, cid AS cell FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                             ORDER BY d ASC, cid) AS rn
                FROM d1) WHERE rn = 1),
    assigned AS (
      SELECT v.vec_id, v.emb, cellf.cell FROM v JOIN cellf ON v.vec_id = cellf.vec_id),
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ({_sql_dot('a.emb', 'b.emb')}) AS dot, a.cell
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id <> b.vec_id)
    SELECT query_id, neighbor_id, dot, cell FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY dot DESC, neighbor_id) AS rn
      FROM pairs) WHERE rn <= 3
    """


@register("s_ann_ivf", oracle=_ivf_oracle())
def s_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN with a TRAINED codebook: fit_kmeans (k=16, one Lloyd
    step from the deterministic 16-lowest-id init) trains on the corpus,
    then the full corpus is assigned to its nearest-squared-L2 cell and
    the search scores exact dot products only within each cell.

    Fully oracle-graded: every training step is engine-exact, so the
    oracle unrolls the Lloyd iteration in SQL — init ORDER BY vec_id
    LIMIT 16, L2 chains in fixed fold order (bit-identical to the
    fixed-order numpy accumulation in the closure-carried codebook UDF,
    functions/vec.py), argmin as ROW_NUMBER (d ASC, cid) == np.argmin
    first-min-wins, and DECIMAL(25,6) sums making the centroid means
    independent of partial-sum order on both engines. Pair scoring is the
    proven dot_exact_udf left-fold.

    Scale: the standard IVF shape — train a codebook on a sample (here
    the whole sf corpus; ``df.sample`` upstream at 100 TB), ship the
    (tiny) codebook to executors inside the UDF closure (k never enters
    the plan — test_kmeans.py holds the plan flat to k=256), assignment
    is row-local, search is a hash join on cell id.
    """
    from ..functions.vec import dot_exact_udf
    from ..operators.kmeans import assign_cells, fit_kmeans

    v = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    cents = fit_kmeans(v, k=16, max_iter=1)
    dot_exact = dot_exact_udf()

    # materialize the assignment once (r14, guide §5): the cell-join
    # references `assigned` on BOTH sides, and each side re-executed the
    # scan + nearest-centroid UDF pass — at 100 TB that is a second full
    # corpus assignment for no new information. Per-invocation by
    # construction (a fresh fn() call checkpoints afresh).
    assigned = assign_cells(v, cents, metric="l2").select(
        "vec_id", "emb", F.col("cell").cast("long").alias("cell")
    ).localCheckpoint()
    a = assigned.select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("emb_a"), "cell"
    )
    b = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("emb_b"),
        F.col("cell").alias("cell_b"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("neighbor_id"))
    return (
        a.join(b, (F.col("cell") == F.col("cell_b")) & (F.col("query_id") != F.col("neighbor_id")))
        .select("query_id", "neighbor_id", dot_exact("emb_a", "emb_b").alias("dot"), "cell")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


def _seed_remote_sqlite(sf_dir: str) -> str:
    """Materialize customer.parquet as a SQLite database (once per sf_dir)
    so the remote-table path is exercised against real testdata; the oracle
    reads the same rows straight from parquet."""
    import os
    import sqlite3
    import tempfile
    from hashlib import sha256

    import pyarrow.parquet as pq

    key = sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    db = os.path.join(tempfile.gettempdir(), f"sfs_remote_{key}.db")
    if not os.path.exists(db):
        tmp = f"{db}.tmp{os.getpid()}"
        con = sqlite3.connect(tmp)
        con.execute(
            "CREATE TABLE customer (c_custkey INTEGER, c_name TEXT, "
            "c_nationkey INTEGER, c_acctbal REAL, c_mktsegment TEXT)"
        )
        t = pq.read_table(os.path.join(sf_dir, "customer.parquet"))
        rows = zip(*[t.column(c).to_pylist() for c in
                     ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")])
        con.executemany("INSERT INTO customer VALUES (?,?,?,?,?)", rows)
        con.commit()
        con.close()
        os.replace(tmp, db)  # atomic: concurrent seeders converge
    return db


@register(
    "q_remote_sqlite",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
      AND c_nationkey IN (1, 5, 9, 13, 17, 21)
    """,
)
def q_remote_sqlite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remote-table federation (reference datafusion_remote_tables/src/
    provider.rs:121-235): customer seeded into SQLite, read through the
    seafowl_remote Python DataSource; every conjunct (equality, comparison,
    IN-list) ships to the remote database as SQL via pushFilters, so the
    executor-side scan fetches only matching rows — the oracle reads the
    same parquet directly.

    Scale: reads run on executors with per-partition connections and
    optional range partitioning (JDBC shape); the remote engine does the
    row filtering, Spark does everything after.
    """
    from ..sources.remote import read_remote_table

    db = _seed_remote_sqlite(sf_dir)
    df = read_remote_table(spark, f"sqlite://{db}", "customer")
    return (
        df.where(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("c_acctbal") > 1000.0)
            & F.col("c_nationkey").isin(1, 5, 9, 13, 17, 21)
        )
        .select(
            "c_custkey",
            "c_name",
            F.col("c_nationkey").cast("int").alias("c_nationkey"),
            "c_acctbal",
        )
    )


def _seed_iceberg(spark: SparkSession, sf_dir: str) -> str:
    """Materialize nation.parquet as an Iceberg table (once per sf_dir)
    and commit a v2 merge-on-read DELETE snapshot on top — one positional
    delete (the n_nationkey=0 row) plus equality deletes (n_nationkey %
    5 == 4); returns the current metadata.json path."""
    import glob
    import os
    import shutil
    import tempfile
    from hashlib import sha256

    from ..sources.iceberg import append_iceberg_deletes, write_iceberg_table

    key = sha256(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"sfs_iceberg_mor_{key}")
    marker = os.path.join(d, "metadata")
    if not os.path.isdir(marker):
        stage = f"{d}.stage{os.getpid()}"
        shutil.rmtree(stage, ignore_errors=True)
        nation = table(spark, sf_dir, "nation")
        meta1 = write_iceberg_table(spark, nation, stage)
        # positional: locate nation 0 in the files just written
        from ..sources.iceberg import snapshot_data_files

        hits = (
            spark.read.parquet(*snapshot_data_files(meta1))
            .where(F.col("n_nationkey") == 0)
            .select(
                F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/")
                .alias("fp"),
                F.col("_metadata.row_index").alias("pos"),
            )
            .collect()
        )
        eq_keys = sorted(
            r["n_nationkey"]
            for r in nation.select("n_nationkey").collect()
            if r["n_nationkey"] % 5 == 4
        )
        append_iceberg_deletes(
            stage,
            pos_deletes=[(r["fp"], r["pos"]) for r in hits],
            eq_deletes=([{"n_nationkey": int(k)} for k in eq_keys], ["n_nationkey"]),
        )
        try:
            os.rename(stage, d)  # atomic publish; loser keeps its stage
        except OSError:
            shutil.rmtree(stage, ignore_errors=True)
    metas = sorted(
        glob.glob(os.path.join(d, "metadata", "v*.metadata.json")),
        key=lambda p: int(os.path.basename(p)[1:].split(".")[0]),
    )
    return metas[-1]


@register(
    "q_iceberg_read",
    oracle="""
    SELECT n_regionkey, COUNT(*) AS n_nations,
           MIN(n_name) AS first_name, MAX(n_name) AS last_name
    FROM nation
    WHERE n_nationkey <> 0 AND n_nationkey % 5 <> 4
    GROUP BY n_regionkey
    """,
)
def q_iceberg_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 external table read WITH merge-on-read deletes applied
    (beyond reference src/context/iceberg.rs, which rejects delete-bearing
    tables; base test shape tests/statements/query.rs:372-410): nation is
    written as an Iceberg v2 table (parquet data files + Avro manifests +
    metadata.json), then a DELETE snapshot removes the n_nationkey=0 row
    positionally (file path + row position) and every n_nationkey%5==4
    row via sequence-scoped equality deletes. The read resolves the
    current snapshot, anti-joins the deletes against Spark's _metadata
    columns, and the oracle mirrors the deletes as a WHERE clause over
    the source parquet.

    Scale: manifest walking is metadata-proportional (bytes ~ #files);
    the data path stays Catalyst's vectorized parquet reader with
    pushdown/pruning intact.
    """
    from ..sources.iceberg import read_iceberg

    meta = _seed_iceberg(spark, sf_dir)
    n = read_iceberg(spark, meta)
    return n.groupBy(F.col("n_regionkey").cast("int").alias("n_regionkey")).agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.min("n_name").alias("first_name"),
        F.max("n_name").alias("last_name"),
    )


@register(
    "q_asof_join",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate)
    SELECT e.event_id, e.user_id,
           o.o_orderkey AS last_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS last_orderdate
    FROM events e ASOF LEFT JOIN o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator — Spark lacks ASOF JOIN; DuckDB's native
    one is the oracle): each event joined to the user's most recent order
    at or before the event time. Orders deduped to max orderkey per
    (custkey, date) so the as-of match is unambiguous.

    Scale: operators/asof.py union-and-carry — one shuffle on the key, one
    sort, no range explosion (see module docstring).
    """
    from ..operators.asof import asof_join

    e = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .withColumn("__key", F.col("user_id"))
    )
    o = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("__key"), F.col("o_orderdate"))
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = asof_join(
        e,
        o,
        on="__key",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=["o_orderkey", "o_orderdate"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("last_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
    )


# --------------------------------------------------------------------------
# Time-series resample + LOCF (operators/timeseries.py) — graded in r7
# --------------------------------------------------------------------------

_TS_INTERVAL_S = 3600


@register(
    "q_timeseries",
    oracle=f"""
    WITH agged AS (
      SELECT event_type,
             to_timestamp(
               CAST(floor(epoch(ts)) AS BIGINT)
               - ((CAST(floor(epoch(ts)) AS BIGINT) % {_TS_INTERVAL_S}
                   + {_TS_INTERVAL_S}) % {_TS_INTERVAL_S})) AS bucket_ts,
             COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2),
    span AS (
      SELECT event_type, min(bucket_ts) AS lo, max(bucket_ts) AS hi
      FROM agged GROUP BY 1),
    grid AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL {_TS_INTERVAL_S} SECOND))
               AS bucket_ts
      FROM span),
    j AS (
      SELECT g.event_type, g.bucket_ts, a.n_events, a.sum_value
      FROM grid g LEFT JOIN agged a USING (event_type, bucket_ts)),
    filled AS (
      SELECT event_type, bucket_ts, n_events, sum_value,
             last_value(sum_value IGNORE NULLS) OVER wprev AS filled_sum,
             last_value(sum_value IGNORE NULLS) OVER wprev AS pv,
             last_value(CASE WHEN sum_value IS NOT NULL
                             THEN CAST(epoch(bucket_ts) AS DOUBLE) END
                        IGNORE NULLS) OVER wprev AS pt,
             first_value(sum_value IGNORE NULLS) OVER wnext AS nv,
             first_value(CASE WHEN sum_value IS NOT NULL
                              THEN CAST(epoch(bucket_ts) AS DOUBLE) END
                         IGNORE NULLS) OVER wnext AS nt
      FROM j
      WINDOW wprev AS (PARTITION BY event_type ORDER BY bucket_ts
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wnext AS (PARTITION BY event_type ORDER BY bucket_ts
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
    rolled AS (
      SELECT *,
             CAST(SUM(CAST(filled_sum AS DECIMAL(25,6))) OVER tw AS DOUBLE) AS rs,
             COUNT(filled_sum) OVER tw AS rn,
             CAST(SUM(CAST(filled_sum * filled_sum AS DECIMAL(25,6))) OVER tw AS DOUBLE) AS rs2
      FROM filled
      WINDOW tw AS (PARTITION BY event_type ORDER BY bucket_ts
                    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
    SELECT event_type,
           strftime(bucket_ts, '%Y-%m-%d %H:%M:%S') AS bucket_str,
           n_events, sum_value, filled_sum,
           CASE WHEN sum_value IS NOT NULL THEN sum_value
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                THEN pv + (nv - pv)
                     * ((CAST(epoch(bucket_ts) AS DOUBLE) - pt) / (nt - pt))
           END AS interp_sum,
           CASE WHEN rn > 0 THEN rs / rn END AS roll_mean,
           CASE WHEN rn > 0
                THEN greatest(rs2 / rn - (rs / rn) * (rs / rn), 0.0) END
             AS roll_var,
           CASE WHEN rn > 0
                 AND greatest(rs2 / rn - (rs / rn) * (rs / rn), 0.0) > 0
                THEN (filled_sum - rs / rn)
                     / sqrt(greatest(rs2 / rn - (rs / rn) * (rs / rn), 0.0))
           END AS zscore,
           CAST(abs(CASE WHEN rn > 0
                 AND greatest(rs2 / rn - (rs / rn) * (rs / rn), 0.0) > 0
                THEN (filled_sum - rs / rn)
                     / sqrt(greatest(rs2 / rn - (rs / rn) * (rs / rn), 0.0))
           END) > 3 AS BIGINT) AS is_anomaly
    FROM rolled
    """,
)
def q_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (operators/timeseries.py, graduated per
    COVERAGE.md's round-8 plan; its slot came from merging the former
    p_chunk_documents row into p_pack_sequences): events resampled to a
    DENSE per-type hourly grid — buckets with no events exist as rows with
    NULL aggregates — then LOCF forward fill carries the last observed
    hourly sum into the gaps (leading gaps stay NULL: honesty over
    invention). The raw and filled columns ride side by side so the oracle
    checks both the grid join and the IGNORE NULLS window.

    Scale: one hash exchange on event_type for the bucket aggregate; the
    dense grid is a row-local sequence() explode off a per-key min/max (no
    driver loop, no cross join); the fill is one window pass over the
    already-partitioned grid. A million device streams parallelize per
    key; sums are decimal-cast so the oracle hash-matches bit for bit.
    """
    from ..operators.timeseries import (
        forward_fill,
        interpolate_linear,
        resample,
        rolling_stats,
    )

    e = table(spark, sf_dir, "events").select("event_type", "ts", "value")
    grid = resample(
        e,
        "ts",
        _TS_INTERVAL_S,
        {
            "n_events": F.count(F.lit(1)),
            "sum_value": dec_sum(F.col("value")),
        },
        key_cols=["event_type"],
    ).withColumn("filled_sum", F.col("sum_value")).withColumn(
        "interp_sum", F.col("sum_value")
    )
    filled = forward_fill(
        grid, ["filled_sum"], ts_col="bucket_ts", key_cols=["event_type"]
    )
    # linear-interpolation imputation rides next to LOCF (r8): same
    # grid, same partitioning, straight line between nearest neighbors
    filled = interpolate_linear(
        filled, ["interp_sum"], ts_col="bucket_ts", key_cols=["event_type"]
    )
    # rolling monitoring pass over the regularized+filled series (r7
    # session C, closing the round-8 rolling-analytics candidate):
    # trailing 24-bucket mean/variance and a |z| > 3 anomaly flag,
    # decimal-exact window sums so the oracle hash-matches
    rolled = rolling_stats(
        filled,
        "filled_sum",
        window=24,
        ts_col="bucket_ts",
        key_cols=["event_type"],
    )
    return rolled.select(
        "event_type",
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_str"),
        "n_events",
        "sum_value",
        "filled_sum",
        "interp_sum",
        "roll_mean",
        "roll_var",
        "zscore",
        "is_anomaly",
    )
