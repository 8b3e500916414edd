"""Measure ONE scaling pair and append it to scaling_history.json
WITHOUT regenerating BENCH/BASELINE.md (which presents the declared
4->16 gate pair).  Used to accumulate extra 8->32 sessions — the
round-4 verdict asks that pair to clear 0.8 as a median over its own
recorded sessions, the same statistic as the gate.

    python BENCH/run_pair_session.py [--pair 8:32] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import REPO, measure_pair  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", default="8:32")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--tier", default="bench")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.pair.split(":"))
    r = measure_pair(lo, hi, args.tier, args.runs)

    hist_path = os.path.join(REPO, "BENCH", "scaling_history.json")
    history = []
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            history = json.load(f)
    history.append({
        "ts": int(time.time()),
        "gate_pair": f"{lo}->{hi}",
        "efficiency": r["scaling_efficiency"],
        "low_ips": r["low"]["images_per_sec"],
        "high_ips": r["high"]["images_per_sec"],
        "source": "run_pair_session.py",
    })
    with open(hist_path, "w") as f:
        json.dump(history, f, indent=1)
    import statistics

    effs = sorted(h["efficiency"] for h in history if h["gate_pair"] == f"{lo}->{hi}")
    print(json.dumps({
        "pair": f"{lo}->{hi}",
        "session": r,
        "median_over_sessions": round(statistics.median(effs), 3),
        "sessions": effs,
    }))


if __name__ == "__main__":
    main()
