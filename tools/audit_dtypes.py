"""Audit pandas-dtype parity between Spark results and DuckDB oracle results.

The driver's correctness gate hashes canonicalized pandas frames from both
sides; a column that is int64 on the Spark side but float64 on the oracle
side (e.g. DuckDB SUM(int) -> HUGEINT -> float64 via fetchdf) hash-mismatches
even when every value compares equal — exactly the q_sessionize r02 failure.
This audit runs every registry entry at a small SF and reports any column
whose pandas dtype differs between the two sides.

Usage: python tools/audit_dtypes.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from seafowl_spark.io import TABLES
from seafowl_spark.session import build_session


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    spark = build_session("audit_dtypes")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_flag = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only")
            continue
        t0 = time.time()
        try:
            sdt = dict(fn(spark, sf_dir).toPandas().dtypes.astype(str))
            odt = dict(con.execute(oracles[name]).fetchdf().dtypes.astype(str))
        except Exception as ex:
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:300]}")
            n_flag += 1
            continue
        diffs = [
            f"{c}: spark={sdt.get(c)} oracle={odt.get(c)}"
            for c in sorted(set(sdt) | set(odt))
            if sdt.get(c) != odt.get(c)
        ]
        if diffs:
            n_flag += 1
            print(f"FLAG {name} ({time.time()-t0:.1f}s): " + "; ".join(diffs))
        else:
            print(f"ok   {name} ({time.time()-t0:.1f}s)")
    print(f"\n{n_flag} flagged")
    return 1 if n_flag else 0


if __name__ == "__main__":
    raise SystemExit(main())
