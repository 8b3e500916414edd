"""Probe: can a config change lift the 8 -> 32 scaling efficiency?

The 8->32 pair sits PAST the box's linear-scaling range (the no-Spark
kernel probe `hw_ceiling.py` shows per-process throughput dropping
~18% from 16 to 32 pinned processes — shared memory bandwidth).  The
round-3 verdict asked for one cheap mitigation experiment: either the
number improves, or the bandwidth attribution gains a measured
negative result.

Two candidate mitigations named there:

* interleaved NUMA allocation — MOOT on this box: `lscpu` reports a
  single NUMA node (1 socket, 32 cores, one memory controller), so
  there is nothing to interleave and no numactl is installed.  That
  itself strengthens the attribution: a single-socket memory
  controller is exactly the resource a real cluster adds per node.
* smaller Arrow batches at high parallelism — measured here: the
  full scaling pair (taskset-pinned local[8] vs local[32], fresh JVM
  per level, warm-up + R timed runs, median) at
  maxRecordsPerBatch = 16 / 64 (baseline) / 256.

    python BENCH/probe_832.py [--runs 2]

Appends a JSON line per variant to BENCH/probe_832.json and prints a
summary table; BASELINE.md carries the conclusions.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import measure_pair  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--batches", default="16,64,256")
    ap.add_argument("--tier", default="bench")
    args = ap.parse_args()

    out_path = os.path.join(REPO, "BENCH", "probe_832.json")
    results = []
    for rows_per_batch in (int(b) for b in args.batches.split(",")):
        os.environ["QFILTER_ARROW_BATCH_ROWS"] = str(rows_per_batch)
        r = measure_pair(8, 32, args.tier, args.runs)
        r["arrow_batch_rows"] = rows_per_batch
        results.append(r)
        print(json.dumps(r))
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("| arrow batch | 8-core img/s | 32-core img/s | eff 8->32 |")
    print("|---|---|---|---|")
    for r in results:
        print(
            f"| {r['arrow_batch_rows']} | {r['low']['images_per_sec']:.0f} "
            f"| {r['high']['images_per_sec']:.0f} "
            f"| {r['scaling_efficiency']:.3f} |"
        )


if __name__ == "__main__":
    main()
