"""Quiet-window watcher for scaling reruns.

The shuffle-regime scaling number is only meaningful when the hypervisor
actually delivers the cores (run 6 in ``shuffle_regime_runs.jsonl`` shows
what a contended window does: 32p ALU 179.8 Mops -> efficiency 0.739,
vs 216-231 Mops -> 0.88-1.03 on quiet runs).  This watcher polls the
same pure-ALU calibration probe ``bench_scaling.calibrate()`` uses for
its brackets and launches ``bench_scaling.py --shuffle-regime`` only
once TWO consecutive probes (5 min apart) clear the quiet bar.  If the
box never clears within ``--max-wait`` it exits WITHOUT running -- a
knowingly-contended datapoint adds noise, not evidence.

Usage:  python BENCH/quiet_watch.py [--max-wait SEC] [--bar32 MOPS]
                                    [--bar8 MOPS] [--bar2 MOPS]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench_scaling  # noqa: E402


def probe() -> dict[int, float]:
    return {c["procs"]: c["mops"] for c in bench_scaling.calibrate()}


def is_quiet(p: dict[int, float], bar32: float, bar2: float,
             bar8: float = 45.0) -> bool:
    # bar8 default matches the CLI default so non-main callers screen
    # the 8p contention mode too (run 9's blind spot).
    return (p.get(32, 0.0) >= bar32 and p.get(2, 0.0) >= bar2
            and p.get(8, 0.0) >= bar8)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-wait", type=float, default=4 * 3600)
    # quiet runs measured 216-231 Mops at 32p / 17.2-21.3 at 2p;
    # contended run 6 measured 179.8 / 17.2 -- the 32p probe discriminates
    ap.add_argument("--bar32", type=float, default=195.0)
    ap.add_argument("--bar2", type=float, default=16.0)
    # run 9's launch probe read 19.4 Mops at 8p while 2p and 32p both
    # cleared their bars -- the mid-proc-count contention mode has to be
    # screened too (quiet windows deliver 50-84 Mops at 8p)
    ap.add_argument("--bar8", type=float, default=45.0)
    ap.add_argument("--poll", type=float, default=600.0)
    args = ap.parse_args()

    t0 = time.time()
    streak = 0
    while time.time() - t0 < args.max_wait:
        p = probe()
        quiet = is_quiet(p, args.bar32, args.bar2, args.bar8)
        streak = streak + 1 if quiet else 0
        print(json.dumps({"t": round(time.time() - t0), "probe": p,
                          "quiet": quiet, "streak": streak}), flush=True)
        if streak >= 2:
            print("quiet window confirmed; launching shuffle-regime run",
                  flush=True)
            rc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench_scaling.py"),
                 "--shuffle-regime"]).returncode
            print(json.dumps({"launched": True, "rc": rc}), flush=True)
            return rc
        time.sleep(300.0 if streak == 1 else args.poll)
    print(json.dumps({"launched": False, "reason": "box never quiet"}),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
