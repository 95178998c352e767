"""Gather/scatter memory-bandwidth probe: how much DRAM parallelism does
THIS HOST deliver going from N to 4N processes?

The PageRank superstep (CSR gather-scatter especially) moves tens of
bytes per FLOP: its per-core throughput is bounded by the shared memory
controller, not the core count. On a real multi-executor cluster the
north rule's N -> 4N scale-out multiplies memory channels by 4; on a
single sandbox box all workers share one controller, so a bandwidth-bound
job's apparent scaling efficiency is capped by THIS probe's number, not
by 1.0. The probe replicates the superstep's access pattern — random
index gather + scatter-add over arrays far larger than LLC — in separate
processes (no GIL, no shared state) and reports aggregate element
throughput at both parallelism levels, interleaved best-of-3 like
tools/scaling_bench.py.

Usage: python tools/membw_probe.py [n_low] [n_high] [n_elems] [n_ops]
Prints one JSON line; appends a section to BENCH.md.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _worker(seed: int, n_elems: int, n_ops: int, out_q) -> None:
    # pin BLAS to 1 thread (protocol parity with scaling_bench)
    rng = np.random.default_rng(seed)
    src = rng.random(n_elems, dtype=np.float64)          # 8 B/elem, >> LLC
    idx = rng.integers(0, n_elems, size=n_ops)           # random gather idx
    dst_idx = rng.integers(0, n_elems, size=n_ops)       # random scatter idx
    acc = np.zeros(n_elems, dtype=np.float64)
    t0 = time.monotonic()
    for _ in range(4):
        g = src[idx]                                     # gather
        np.add.at(acc, dst_idx[: n_ops // 4], g[: n_ops // 4])  # scatter-add
    wall = time.monotonic() - t0
    out_q.put((4 * n_ops, wall, float(acc[:8].sum() + g[:8].sum())))


def run_level(n_procs: int, n_elems: int, n_ops: int) -> dict:
    q: mp.Queue = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(1000 + i, n_elems, n_ops, q))
        for i in range(n_procs)
    ]
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    # compute-only walls reported by the workers (setup/rng excluded);
    # workers start together and setup cost is uniform, so the slowest
    # worker's compute wall spans the overlapped measurement window
    wall = max(r[1] for r in results)
    total_ops = sum(r[0] for r in results)
    return {
        "procs": n_procs,
        "wall_sec": round(wall, 3),
        "agg_elems_per_sec": round(total_ops / wall),
    }


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_elems = int(sys.argv[3]) if len(sys.argv) > 3 else 64_000_000  # 512 MB
    n_ops = int(sys.argv[4]) if len(sys.argv) > 4 else 50_000_000
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    lows, highs = [], []
    for i in range(3):
        lows.append(run_level(n_low, n_elems, n_ops))
        time.sleep(10)
        highs.append(run_level(n_high, n_elems, n_ops))
        if i < 2:
            time.sleep(10)
    low = max(lows, key=lambda r: r["agg_elems_per_sec"])
    high = max(highs, key=lambda r: r["agg_elems_per_sec"])
    ratio = high["agg_elems_per_sec"] / low["agg_elems_per_sec"]
    eff = ratio / (n_high / n_low)
    result = {
        "pattern": "random gather + scatter-add, 512MB working set/proc",
        "low": low,
        "high": high,
        "speedup": round(ratio, 3),
        "bandwidth_scaling_ceiling": round(eff, 3),
    }
    print(json.dumps(result))
    md = f"""
## Host DRAM gather-scatter ceiling ({n_low} vs {n_high} processes)

Random-index gather + scatter-add over {n_elems * 8 // 1_000_000} MB/process
working sets in independent processes (tools/membw_probe.py, best-of-3
interleaved) — the PageRank superstep's access pattern with zero framework
overhead. This bounds any bandwidth-bound job's apparent scaling on this
box; a real N->4N executor scale-out multiplies memory channels by 4.

| processes | aggregate elems/sec |
|---|---|
| {n_low} | {low['agg_elems_per_sec']:,} |
| {n_high} | {high['agg_elems_per_sec']:,} |

Speedup {n_low}->{n_high}: **{result['speedup']}x** of {n_high // n_low}x ideal ->
host bandwidth-scaling ceiling **{result['bandwidth_scaling_ceiling']}** for this
access pattern.
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
