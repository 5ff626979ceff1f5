"""Local mirror of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at the
given sf dir, normalizes both results (columns sorted by name, rows sorted by
all columns, timestamps/dates stringified), and compares values exactly.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from seafowl_spark.io import TABLES
from seafowl_spark.session import build_session


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith(("datetime", "object")):
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def _dtype_class(dt) -> str:
    s = str(dt)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    if s.startswith("bool"):
        return "bool"
    if s.startswith("datetime"):
        return "datetime"
    return "object"


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    problems = []
    sn, on = _normalize(spark_pdf), _normalize(oracle_pdf)
    if list(sn.columns) != list(on.columns):
        problems.append(f"columns: spark={list(sn.columns)} oracle={list(on.columns)}")
        return problems
    if len(sn) != len(on):
        problems.append(f"rowcount: spark={len(sn)} oracle={len(on)}")
        return problems
    # Dtype parity gate: the driver hashes canonicalized frames, so an int64
    # vs float64 column (DuckDB SUM(BIGINT)->HUGEINT->float64 via fetchdf)
    # hash-mismatches even when every value compares equal — the exact
    # s_quantize_int8 r08 sealed-red failure (see tools/audit_dtypes.py).
    # Enforce it here so the value mirror can never pass a row the driver
    # would hash-fail. Canonicalization matches the observed driver rule:
    # integer WIDTHS unify (q_bm25_search's int64-vs-int32 query_id
    # hash-passed in r08), but int-vs-float is a real mismatch.
    for c in sn.columns:
        sd, od = _dtype_class(sn[c].dtype), _dtype_class(on[c].dtype)
        if sd != od:
            problems.append(
                f"dtype {c}: spark={sn[c].dtype}({sd}) oracle={on[c].dtype}({od})"
            )
    for c in sn.columns:
        sv, ov = sn[c].tolist(), on[c].tolist()
        bad = [
            (i, a, b) for i, (a, b) in enumerate(zip(sv, ov)) if not _values_equal(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            problems.append(f"col {c}: {len(bad)} mismatches, first@{i}: spark={a!r} oracle={b!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    spark = build_session("check_correctness")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: SPARK ERROR {type(ex).__name__}: {str(ex)[:500]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"PASS {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: ORACLE ERROR {type(ex).__name__}: {str(ex)[:500]}")
            n_fail += 1
            continue
        problems = compare(sdf, odf, name)
        if problems:
            print(f"FAIL {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            for p in problems:
                print(f"     {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
