"""Job-level profile of one declared query: per-job wall (submit ->
last stage complete), stage IDs, and the callsite/description, so a
fat stage can be attributed to the code that launched it (guide §1.5/§7).

Usage: python tools/profile_jobs.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from seafowl_spark.queries import load_all
from seafowl_spark.session import DEFAULT_SF_DIR, build_session


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    names = sys.argv[1:]
    evlog_dir = tempfile.mkdtemp(prefix="prof_evlog_")
    spark = build_session(
        "profile_jobs",
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

    for name in names:
        noop(name)  # warm
        t0 = int(time.time() * 1000)
        w0 = time.perf_counter()
        noop(name)
        wall = time.perf_counter() - w0
        t1 = int(time.time() * 1000)
        time.sleep(1.5)
        jobs: dict[int, dict] = {}
        stage_tasks: dict[int, list[float]] = {}
        for path in glob.glob(os.path.join(evlog_dir, "**"), recursive=True):
            if not os.path.isfile(path) or "appstatus" in os.path.basename(path):
                continue
            with open(path, errors="replace") as f:
                for line in f:
                    if '"SparkListenerJobStart"' in line:
                        ev = json.loads(line)
                        st = ev.get("Submission Time") or 0
                        if not (t0 <= st <= t1):
                            continue
                        props = ev.get("Properties") or {}
                        jobs[ev["Job ID"]] = {
                            "submit": st,
                            "stages": ev.get("Stage IDs") or [],
                            "desc": (props.get("spark.job.description") or "")[
                                :120
                            ],
                            "callsite": (props.get("callSite.short") or "")[:120],
                        }
                    elif '"SparkListenerJobEnd"' in line:
                        ev = json.loads(line)
                        j = jobs.get(ev["Job ID"])
                        if j is not None:
                            j["end"] = ev.get("Completion Time") or 0
                    elif '"SparkListenerTaskEnd"' in line:
                        ev = json.loads(line)
                        info = ev.get("Task Info") or {}
                        fin = info.get("Finish Time") or 0
                        if not (t0 <= fin <= t1):
                            continue
                        dur = (fin - (info.get("Launch Time") or fin)) / 1000.0
                        stage_tasks.setdefault(ev.get("Stage ID"), []).append(dur)
        print(f"== {name}: wall {wall:.3f}s, {len(jobs)} jobs ==")
        prev_end = None
        for jid in sorted(jobs):
            j = jobs[jid]
            jwall = (j.get("end", j["submit"]) - j["submit"]) / 1000.0
            gap = (
                (j["submit"] - prev_end) / 1000.0 if prev_end is not None else 0.0
            )
            prev_end = j.get("end", j["submit"])
            per_stage = []
            for sid in j["stages"]:
                durs = stage_tasks.get(sid)
                if durs:
                    per_stage.append(
                        f"s{sid}:{len(durs)}t/{sum(durs):.2f}s"
                    )
            print(
                f"  job {jid}: wall {jwall:.3f}s gap-before {gap:.3f}s "
                f"[{' '.join(per_stage)}] {j['callsite']} | {j['desc']}"
            )


if __name__ == "__main__":
    main()
