"""Per-stage profile of the bench headline queries (guide §1/§7).

For each query: one uncounted warm run, then a timed noop-sink run with
the event log on; per-stage task counts and durations for the timed
window are reported so single-task (scan-collapsed) stages and
stragglers are visible.

Usage: python tools/profile_queries.py [query ...]  (default: HEADLINE)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from seafowl_spark.queries import load_all
from seafowl_spark.session import DEFAULT_SF_DIR, build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    from bench import HEADLINE

    names = sys.argv[1:] or HEADLINE
    evlog_dir = tempfile.mkdtemp(prefix="prof_evlog_")
    spark = build_session(
        "profile_queries",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evlog_dir,
            "spark.eventLog.compress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    regs = load_all()

    def noop(name: str) -> None:
        regs[name].fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    # session warm-up like bench.py
    noop("q01_pricing_summary")

    ft_re = re.compile(r'"Finish Time":\s*(\d+)')

    def stage_stats(t0_ms: int, t1_ms: int) -> list[dict]:
        time.sleep(1.5)
        by_stage: dict[int, list[float]] = {}
        for path in glob.glob(os.path.join(evlog_dir, "**"), recursive=True):
            if not os.path.isfile(path) or "appstatus" in os.path.basename(path):
                continue
            with open(path, errors="replace") as f:
                for line in f:
                    if '"SparkListenerTaskEnd"' not in line:
                        continue
                    m = ft_re.search(line)
                    if m and not (t0_ms <= int(m.group(1)) <= t1_ms):
                        continue
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    info = ev.get("Task Info") or {}
                    fin = info.get("Finish Time") or 0
                    if not (t0_ms <= fin <= t1_ms):
                        continue
                    dur = (fin - (info.get("Launch Time") or fin)) / 1000.0
                    by_stage.setdefault(ev.get("Stage ID"), []).append(dur)
        out = []
        for sid in sorted(by_stage):
            durs = by_stage[sid]
            out.append(
                {
                    "stage": sid,
                    "tasks": len(durs),
                    "sum_sec": round(sum(durs), 3),
                    "max_sec": round(max(durs), 3),
                    "med_sec": round(statistics.median(durs), 3),
                }
            )
        return out

    results = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        noop(name)  # warm
        t0 = int(time.time() * 1000)
        w0 = time.perf_counter()
        noop(name)
        wall = time.perf_counter() - w0
        t1 = int(time.time() * 1000)
        results[name] = {"wall_sec": round(wall, 3), "stages": stage_stats(t0, t1)}
        print(json.dumps({name: results[name]}), flush=True)
    print("== SUMMARY ==")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
