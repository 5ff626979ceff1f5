"""Portable column helpers.

Two cross-engine concerns drive this module:

1. **Float determinism.** The driver hash-compares our Spark results against a
   DuckDB oracle. Sums of doubles are order-dependent, and Spark's shuffle
   order is nondeterministic — so every aggregate over doubles routes through
   a decimal cast: ``sum(cast(x as decimal))`` is exact and order-independent
   in both engines, and casting the final decimal back to double is a
   deterministic nearest-double conversion. This also reflects the reference's
   own exact-decimal support (reference src/datafusion/utils.rs:94-104,
   Decimal128 p<=38).

2. **Portable hashing.** Spark's ``hash()`` is Murmur3 and DuckDB's ``hash()``
   is different, so content-addressed ops (dedup, minhash, simhash) use
   md5-derived integers: ``conv(substr(md5(s),1,k),16,10)`` on the Spark side
   equals ``CAST('0x'||substr(md5(s),1,k) AS BIGINT)`` on the DuckDB side.
   k=8 gives a 32-bit value whose affine transforms stay inside signed-64
   arithmetic (no ANSI overflow on either engine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- decimals

def dec_sum(col: Column, prec: int = 25, scale: int = 6) -> Column:
    """Order-independent, engine-exact sum of a double column.

    Oracle equivalent: ``CAST(SUM(CAST(x AS DECIMAL(prec,scale))) AS DOUBLE)``.
    """
    return F.sum(col.cast(f"decimal({prec},{scale})")).cast("double")


def dec_avg(col: Column, prec: int = 25, scale: int = 6) -> Column:
    """Exact-sum-over-count average; identical in DuckDB as
    ``CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE) / COUNT(x)``."""
    return F.sum(col.cast(f"decimal({prec},{scale})")).cast("double") / F.count(col)


# ---------------------------------------------------------------- hashing

# prime just above 2**32 — affine minhash transforms are done mod this
MERSENNE_P = 4294967311


def md5_int(col: Column, nhex: int = 8) -> Column:
    """First `nhex` hex digits of md5 as a BIGINT (portable across engines)."""
    return F.conv(F.substring(F.md5(col), 1, nhex), 16, 10).cast("long")


def md5_int_at(col: Column, start: int, nhex: int = 8) -> Column:
    """Hex digits [start, start+nhex) of md5 as BIGINT (1-indexed start)."""
    return F.conv(F.substring(F.md5(col), start, nhex), 16, 10).cast("long")


def oracle_md5_int(expr: str, nhex: int = 8, start: int = 1) -> str:
    """DuckDB SQL fragment matching md5_int/md5_int_at."""
    return f"CAST(('0x' || substr(md5({expr}), {start}, {nhex})) AS BIGINT)"


# ---------------------------------------------------------- local frames

def local_df(spark, rows, schema: str):
    """Small driver-side rows -> a LocalRelation DataFrame (r13).

    ``spark.createDataFrame(list, ...)`` parallelizes a PICKLED RDD: the
    plan scans an ExistingRDD, and every scan of it spawns
    defaultParallelism tasks that each pay a Python-worker round trip —
    measured at three 32-task / ~10 s-task-time stages per index lookup
    with <0.3 s of actual CPU. This helper binds the same rows through
    parameterized SQL VALUES instead, which constant-folds to a
    LocalRelation: zero tasks, zero Python workers, and broadcast/join
    planning sees exact row counts. Strings bind without escaping
    hazards; floats bind as exact IEEE doubles; array columns round-trip
    through from_json (shortest-repr JSON -> bit-identical doubles).

    ``schema`` is a DDL string: "name type, name2 type2". Only for
    driver-bounded row sets (query batches, probe lists, codebooks).
    """
    import json as _json

    cols = []
    # top-level comma split: parameterized types (decimal(25,6),
    # array<struct<...>>) carry commas of their own (r14)
    parts, depth, cur = [], 0, []
    for ch in schema:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    for part in parts:
        nm, tp = part.strip().split(None, 1)
        cols.append((nm.strip("`"), tp.strip()))
    if not rows:
        sel = ", ".join(
            f"CAST(NULL AS {tp}) AS `{nm}`" for nm, tp in cols
        )
        return spark.sql(f"SELECT {sel}").where("1=0")
    args: dict = {}
    row_sql = []
    for i, row in enumerate(rows):
        items = []
        for j, ((nm, tp), v) in enumerate(zip(cols, row)):
            key = f"p{i}_{j}"
            if tp.lower().startswith("array"):
                args[key] = _json.dumps(v)
                items.append(f"from_json(:{key}, '{tp}')")
            else:
                args[key] = v
                items.append(f"CAST(:{key} AS {tp})")
        row_sql.append("(" + ", ".join(items) + ")")
    names = ", ".join(f"`{nm}`" for nm, _ in cols)
    return spark.sql(
        f"SELECT * FROM VALUES {', '.join(row_sql)} AS t({names})", args=args
    )


# ---------------------------------------------------------------- vectors

def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns.

    Stays fully JVM-side (no UDF): zip_with for the elementwise products,
    aggregate for the sequential sums. At 100 TB this is the hot loop of the
    brute-force ANN path; whole-stage codegen handles it without Python.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))
    return dot / (na * nb)


def dot_product(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
