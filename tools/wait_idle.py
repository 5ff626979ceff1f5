"""Block until the host looks idle (steal + load), then exec the rest of
argv. Usage: python tools/wait_idle.py <cmd> [args...]

The bench already settles itself; this wrapper gives ad-hoc measurements
the same discipline (this host shows recurring multi-minute hypervisor
steal waves that inflate 32-thread Spark runs several-fold)."""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import steal_pct  # noqa: E402

deadline = time.time() + 900
while time.time() < deadline:
    s = steal_pct(15.0)
    load = os.getloadavg()[0]
    ok = (s is None or s <= 0.6) and load < 1.5
    print(f"wait_idle: steal={s} load={load:.2f} {'OK' if ok else 'wait'}", flush=True)
    if ok:
        break
    time.sleep(20)
sys.exit(subprocess.call(sys.argv[1:]))
