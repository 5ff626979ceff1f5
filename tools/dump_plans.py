"""Dump .explain('formatted') for declared queries into plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> [query ...]
  tag     -> plans/<tag>/ directory (e.g. r13)
  suffix  -> file suffix (before|after)
  queries -> registry names; default = all 50

Plan capture is driver-side only (no jobs run beyond what a query's
fn() itself executes while building, e.g. bounded scalar collects).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from seafowl_spark.queries import load_all
from seafowl_spark.session import DEFAULT_SF_DIR, build_session


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    registry = load_all()
    spark = build_session("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, spec in registry.items():
        if names and name not in names:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - record the failure in the file
            plan = f"PLAN CAPTURE FAILED: {e!r}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({suffix}) @ {sf_dir}\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
