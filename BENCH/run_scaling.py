"""Two-parallelism scaling measurement (BASELINE.md protocol).

No real cluster exists in this sandbox; per the driver instruction the
N -> 4N executor criterion is evidenced by running the SAME job on the
SAME input at local[8] and local[32].  Each parallelism level runs in
a fresh subprocess (a JVM can't change master), one warm-up + R timed
runs, median reported.

    python BENCH/run_scaling.py [--rows-tier bench] [--runs 3]

Writes BENCH/BASELINE.md with the table + efficiency gate check and
prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, shutil, sys, tempfile, time
repo = sys.argv[1]
cpus = int(sys.argv[2])
tier = sys.argv[3]
runs = int(sys.argv[4])
for p in (repo, os.path.join(repo, "tools")):
    sys.path.insert(0, p)
from make_fixtures import ensure_fixtures
from qfilter.session import get_spark
from qfilter.cascade import with_labels
from qfilter.features import with_all_features

spark = get_spark(app=f"scale{cpus}", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")
tdir = ensure_fixtures(tier)
images = (
    spark.read.parquet(os.path.join(tdir, "images.parquet"))
    .repartition(cpus * 3, "image_id")
    .persist()
)
n = images.count()
walls = []
for r in range(runs + 1):  # first run = warm-up, discarded
    sink = tempfile.mkdtemp(prefix=f"qfs{cpus}_")
    t0 = time.time()
    labeled = with_labels(with_all_features(images))
    labeled.select(
        "image_id", "category", "reason", "keep", "is_dark", "lang",
        "caption_scrubbed", "pii_hits", "tox_hits", "phash64",
    ).write.mode("overwrite").parquet(os.path.join(sink, "labels"))
    wall = time.time() - t0
    shutil.rmtree(sink, ignore_errors=True)
    if r > 0:
        walls.append(wall)
walls.sort()
median = walls[len(walls) // 2]
print(json.dumps({"cpus": cpus, "rows": n, "walls": walls, "median": median}))
spark.stop()
"""


def run_level(cpus: int, tier: str, runs: int) -> dict:
    """Run one parallelism level, CPU-pinned to exactly `cpus` cores.

    The pinning is what makes local[N] a faithful stand-in for an
    N-core cluster: without it, the small run's JVM helper threads
    (GC, parquet IO, Arrow serialization) spill onto the machine's
    idle cores and the 8-task run enjoys the full 32-core memory
    bandwidth — overstating small-cluster throughput and understating
    scaling efficiency.  A real N-executor cluster has N cores total.
    """
    cmd = [sys.executable, "-c", _CHILD, REPO, str(cpus), tier, str(runs)]
    if sys.platform == "linux" and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True, text=True, check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-tier", default=os.environ.get("QFILTER_BENCH_TIER", "bench"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    args = ap.parse_args()

    lo = run_level(args.low, args.rows_tier, args.runs)
    hi = run_level(args.high, args.rows_tier, args.runs)
    tput_lo = lo["rows"] / lo["median"]
    tput_hi = hi["rows"] / hi["median"]
    speedup = tput_hi / tput_lo
    efficiency = speedup / (args.high / args.low)

    result = {
        "rows": lo["rows"],
        "low": {"cpus": args.low, "wall_s": round(lo["median"], 2),
                "images_per_sec": round(tput_lo, 1), "all_walls": lo["walls"]},
        "high": {"cpus": args.high, "wall_s": round(hi["median"], 2),
                 "images_per_sec": round(tput_hi, 1), "all_walls": hi["walls"]},
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "gate": efficiency >= 0.8,
    }
    print(json.dumps(result))

    md = f"""# BENCH/BASELINE.md — measured scaling (two-parallelism stand-in)

Protocol (BASELINE.md §3): same job (full quality filter: read ->
decode+features -> cascade -> scrub -> parquet sink) on the same input
({lo['rows']} rows, fixture tier `{args.rows_tier}`, seed 42), fresh JVM per
parallelism level CPU-PINNED to its core budget (taskset -c 0-N-1 —
a real N-executor cluster has N cores of compute and bandwidth total),
1 warm-up + {args.runs} timed runs, median.

| run | parallelism | rows | wall s (median of {args.runs}) | images/sec | efficiency vs N |
|---|---|---|---|---|---|
| N  | local[{args.low}]  | {lo['rows']} | {lo['median']:.2f} | {tput_lo:.1f} | 1.00 |
| 4N | local[{args.high}] | {hi['rows']} | {hi['median']:.2f} | {tput_hi:.1f} | {efficiency:.3f} |

* speedup {args.low}->{args.high} cores: **{speedup:.2f}x** (ideal {args.high / args.low:.0f}x)
* scaling efficiency: **{efficiency:.3f}** (gate: >= 0.8 — {"PASS" if efficiency >= 0.8 else "FAIL"})
* all timed walls, N: {[round(w, 2) for w in lo['walls']]}; 4N: {[round(w, 2) for w in hi['walls']]}
* config: spark.sql.shuffle.partitions = 2x cores,
  spark.sql.execution.arrow.maxRecordsPerBatch = 64, AQE on, zstd parquet.
"""
    # preserve manually-maintained appendix sections (e.g. data-volume
    # scaling) across re-runs
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    appendix = ""
    if os.path.exists(path):
        with open(path) as f:
            old = f.read()
        idx = old.find("\n## ")
        if idx >= 0:
            appendix = old[idx:]
    with open(path, "w") as f:
        f.write(md + appendix)


if __name__ == "__main__":
    main()
