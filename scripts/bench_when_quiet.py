"""Probe-gated bench runner (the BASELINE.md contention protocol).

The host carries heavy external load that swings single trials 2-3x
(loadavg does not see hypervisor-level contention), so honest bench
numbers require a quiet window. This runner probes with a cheap
1-trial headline run; when the probe beats the threshold it fires the
full default bench (min-of-3 + scaling block) and writes the JSON to
the output path.

Usage: python scripts/bench_when_quiet.py [out.json] [probe_threshold_s]
       [max_attempts] [sleep_s]
"""

import json
import os
import subprocess
import sys
import time

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_quiet.json"
THRESH = float(sys.argv[2]) if len(sys.argv) > 2 else 4.2
MAX_ATTEMPTS = int(sys.argv[3]) if len(sys.argv) > 3 else 12
SLEEP = float(sys.argv[4]) if len(sys.argv) > 4 else 420.0
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> float:
    # a query filter also disables the appended scaling block in bench.py.
    # REPEAT=2 and bench.py's min-of-N: the FIRST trial pays ray worker
    # spawn (cold ~2s even on an idle box), so a cold single trial can
    # never probe below a warm threshold — the second, warm trial is
    # the contention signal
    env = dict(os.environ, RCR_BENCH_QUERIES="headline", RCR_BENCH_REPEAT="2")
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, env=env, cwd=ROOT,
    )
    for line in p.stdout.splitlines():
        if line.startswith("{"):
            return float(json.loads(line)["queries"]["headline"])
    raise RuntimeError(p.stdout[-500:] + p.stderr[-500:])


def main() -> int:
    best = None
    for attempt in range(MAX_ATTEMPTS):
        t = probe()
        print(f"[{time.strftime('%H:%M:%S')}] probe {attempt}: headline {t:.2f}s "
              f"(threshold {THRESH})", flush=True)
        if t <= THRESH:
            p = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                capture_output=True, text=True, cwd=ROOT,
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("{")][-1]
            with open(OUT, "w") as f:
                f.write(line + "\n")
            print("full bench written to", OUT, flush=True)
            return 0
        best = t if best is None else min(best, t)
        time.sleep(SLEEP)
    print(f"no quiet window in {MAX_ATTEMPTS} probes (best {best:.2f}s)", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
