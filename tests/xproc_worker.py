"""Cross-process concurrency worker (r12 — the r11 verdict's task #5).

Spawned by TestCrossProcessConcurrency as a REAL second Python process
with its OWN JVM/SparkSession, pointed at a SHARED engine root. The
in-process races (TestConcurrentWriters) exercise the same code paths,
but the refresh mutex (`_append_pending` exclusive create) and the
commit protocol (store put-if-absent) CLAIM cross-process safety — this
worker is what actually crosses the process boundary.

Protocol: argv = [root, tag, go_file, ready_file, ops?]. The worker
opens a SeafowlContext on `root`, touches `ready_file`, busy-waits for
`go_file`, then fires the comma-separated `ops` (default
"insert,refresh"; r13 adds optimize / vacuum for the REFRESH-vs-
OPTIMIZE and INSERT-vs-VACUUM scenarios — the r12 verdict's task #7)
back-to-back and prints ONE JSON line
{tag, <op>_ok, <op>_err...} on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    root, tag, go_file, ready_file = sys.argv[1:5]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"xproc_{tag}")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from seafowl_spark.engine.context import SeafowlContext

    ctx = SeafowlContext(spark, root)
    out = {"tag": tag}
    with open(ready_file, "w") as fh:
        fh.write("ready")
    deadline = time.time() + 120
    while not os.path.exists(go_file):
        if time.time() > deadline:
            print(json.dumps({"tag": tag, "error": "go timeout"}))
            return
        time.sleep(0.005)
    k = 100 if tag == "a" else 200
    ops = (sys.argv[5] if len(sys.argv) > 5 else "insert,refresh").split(",")
    sql_of = {
        "insert": f"INSERT INTO xd VALUES ({k}, 'xproc {tag} doc')",
        "refresh": "REFRESH SEARCH INDEX ix ON xd",
        "optimize": "OPTIMIZE SEARCH INDEX ix ON xd",
        "vacuum": "VACUUM TABLE xd",
    }
    for op in ops:
        try:
            ctx.execute(sql_of[op])
            out[f"{op}_ok"] = True
        except Exception as ex:  # noqa: BLE001 — reported to the parent
            out[f"{op}_ok"] = False
            out[f"{op}_err"] = f"{type(ex).__name__}: {ex}"
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
