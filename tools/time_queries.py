"""Min-of-3 noop-sink timing for arbitrary declared queries (guide §1.4),
with spark.catalog.clearCache() before every rep (the r14 bench protocol)
— for A/B evidence on queries outside bench.py's headline set.

Usage: python tools/time_queries.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
Prints one JSON line: {"queries": {name: min_sec}, "runs": {name: [..]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from seafowl_spark.queries import load_all
from seafowl_spark.session import DEFAULT_SF_DIR, build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    names = sys.argv[1:]
    spark = build_session("time_queries")
    spark.sparkContext.setLogLevel("ERROR")
    regs = load_all()

    def noop(name: str) -> None:
        regs[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")
        noop(name)  # warm-up (JIT, FS cache), uncounted
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            noop(name)
            runs.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(runs)
        all_runs[name] = runs
        print(f"# {name}: {runs} -> {min(runs)}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": timings, "runs": all_runs}))


if __name__ == "__main__":
    main()
