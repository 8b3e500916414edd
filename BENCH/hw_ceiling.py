"""Hardware scaling ceiling probe (no Spark).

Runs the e2e hot-path kernels (decode -> grayscale -> pixel metrics ->
pHash) over a fixed sample of fixture images in P pinned processes and
reports aggregate rows/sec per P.  This bounds what ANY embarrassingly
parallel job can achieve on this box: if per-process throughput drops
at P cores, the machine (memory bandwidth / LLC / host oversubscription)
is the bottleneck, not the Spark plan.

Why it matters for the N->4N scaling gate: a real 4N-executor cluster
has 4x the nodes and therefore 4x the memory bandwidth; a single box
does not.  The probe identifies the largest core count at which this
box still emulates "cores == cluster resources" faithfully, which is
the honest operating range for the local[N] -> local[4N] stand-in.

    python BENCH/hw_ceiling.py [--procs 1,2,4,8,16,32] [--reps 8]

Writes BENCH/hw_ceiling.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)


def load_sample(n: int = 300):
    import pyarrow.parquet as pq

    from make_fixtures import ensure_fixtures

    tdir = ensure_fixtures("bench")
    t = pq.read_table(
        os.path.join(tdir, "images.parquet"),
        columns=["bytes", "fmt", "w", "h"],
    ).slice(0, n)
    return list(
        zip(
            t["bytes"].to_pylist(),
            t["fmt"].to_pylist(),
            t["w"].to_pylist(),
            t["h"].to_pylist(),
        )
    )


def _one_pass(rows):
    # mirrors the PRODUCTION hot path (features._image_features_udf):
    # per-row decode + shape-batched kernels over Arrow-sized chunks
    from qfilter import codecs
    from qfilter.batch_image import image_features_batch
    from qfilter.session import ARROW_BATCH_ROWS

    cnt = 0
    for i in range(0, len(rows), ARROW_BATCH_ROWS):
        chunk = rows[i : i + ARROW_BATCH_ROWS]
        pxs = []
        for b, f, ww, hh in chunk:
            try:  # fixture plants corrupt error-channel rows by design
                pxs.append(codecs.decode(b, f, int(ww), int(hh)))
            except Exception:  # noqa: BLE001
                pass
        image_features_batch(pxs)
        cnt += len(chunk)
    return cnt


def _worker(cpu, rows, reps, q):
    os.sched_setaffinity(0, {cpu})
    _one_pass(rows)  # warm-up pass: imports, page-faults, numpy init — untimed
    t0 = time.time()
    cnt = 0
    for _ in range(reps):
        cnt += _one_pass(rows)
    q.put((cnt, time.time() - t0))


def run_level(nproc: int, rows, reps: int) -> float:
    """Aggregate rows/sec with `nproc` processes pinned 1:1 to cores
    0..nproc-1 (explicit Process per core — a Pool could hand two tasks
    to one worker and zero to another, halving that core's measured
    throughput).  Each worker runs one untimed warm-up pass before its
    timer; wall = max over workers, so stragglers count."""
    import queue as _queue

    avail = os.cpu_count() or 1
    if nproc > avail:
        raise SystemExit(
            f"hw_ceiling: {nproc} pinned processes requested but only "
            f"{avail} cores exist — pass --procs with levels <= {avail}"
        )
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [
        ctx.Process(target=_worker, args=(i, rows, reps, q))
        for i in range(nproc)
    ]
    for p in procs:
        p.start()
    res = []
    try:
        for _ in procs:
            # bounded wait so a crashed worker (import error, affinity
            # failure) surfaces as an error instead of a silent hang
            res.append(q.get(timeout=600))
    except _queue.Empty:
        pass
    for p in procs:
        p.join(timeout=30)
    if len(res) != len(procs):
        codes = [p.exitcode for p in procs]
        raise RuntimeError(
            f"hw_ceiling: only {len(res)}/{len(procs)} workers reported "
            f"(exit codes {codes}) — a worker died or timed out"
        )
    total = sum(c for c, _ in res)
    wall = max(t for _, t in res)
    return total / wall


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", default="1,2,4,8,16,32")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--sample", type=int, default=300)
    args = ap.parse_args()

    rows = load_sample(args.sample)
    levels = [int(x) for x in args.procs.split(",")]
    tput = {}
    for n in levels:
        tput[n] = round(run_level(n, rows, args.reps), 1)
        print(f"# procs={n:3d} rows/sec={tput[n]:8.1f} per_proc={tput[n]/n:7.1f}",
              file=sys.stderr)
    effs = {
        f"{lo}->{hi}": round(tput[hi] / tput[lo] / (hi / lo), 3)
        for lo in levels
        for hi in levels
        if hi == 4 * lo
    }
    out = {"rows_per_sec": tput, "efficiency_4x": effs,
           "sample": args.sample, "reps": args.reps}
    with open(os.path.join(REPO, "BENCH", "hw_ceiling.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
