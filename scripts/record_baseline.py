"""Record BENCH_BASELINE.json: the pinned per-query tripwire baseline.

Run in a dedicated session (nothing else on the machine) so timings
are steady-state. Uses best-of-3 (SPARK_GRAFT_BENCH_RUNS=3) under the
engine's sized driver heap — every baseline recorded before round 6's
heap fix (default 1 GiB under 32 local threads) carries 1.3-2.5x GC
inflation and made the tripwire flag ~19 untouched queries.

Usage:  python scripts/record_baseline.py
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

env = dict(os.environ, SPARK_GRAFT_BENCH_RUNS="3")
t0 = time.time()
proc = subprocess.run(
    [sys.executable, os.path.join(REPO, "bench.py")],
    env=env, cwd=REPO, capture_output=True, text=True)
sys.stderr.write(proc.stderr[-2000:])
if proc.returncode != 0:
    sys.exit(f"bench failed rc={proc.returncode}")

with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
    detail = json.load(f)

queries = {n: v for n, v in detail["queries"].items()
           if isinstance(v, (int, float))}
out = {
    "recorded_unix": int(t0),
    "runs": 3,
    "sf": detail["sf"],
    "total_sec": detail["value"],
    "n": len(queries),
    # machine-speed probe from the SAME session: the tripwire scales
    # these baselines by cal_now/cal_sec at compare time, so a slower
    # (or faster) shared-host window doesn't read as a plan change
    "cal_sec": (detail.get("cal") or {}).get("sec"),
    # memory-bandwidth probe twin (bench.calibration_mem_sec): the
    # uniform-slowdown discriminator compares the round's median
    # per-query ratio against BOTH probes' ratios. NOTE (r11): a
    # single-window pin saturates — the r9 pin (0.0737, fast window)
    # read mem_x 1.25-1.31 every window after. The shipped baseline
    # re-pins cal_mem_sec to the MEDIAN of recorded windows
    # (BASELINE.md 2026-08-16 r11 note); when re-recording, prefer
    # median(this window, prior recorded windows) over the raw probe.
    "cal_mem_sec": (detail.get("cal") or {}).get("mem_sec"),
    "queries": queries,
}
path = os.path.join(REPO, "BENCH_BASELINE.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1)
print(f"wrote {path}: {len(queries)} queries, total {detail['value']} s, "
      f"{len(detail['queries']) - len(queries)} errors, "
      f"{time.time() - t0:.0f} s wall")
