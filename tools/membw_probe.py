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
processes (no GIL, no shared state), synchronized on a start barrier so
every worker's timed window overlaps, and reports aggregate element
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

# pin BLAS to 1 thread BEFORE numpy loads (OpenBLAS reads these at
# import time; forked children inherit the already-initialized numpy) —
# protocol parity with scaling_bench's pinned workers
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_ITERS = 4


def _worker(seed: int, n_elems: int, n_ops: int, barrier, out_q) -> None:
    rng = np.random.default_rng(seed)
    src = rng.random(n_elems, dtype=np.float64)          # 8 B/elem, >> LLC
    idx = rng.integers(0, n_elems, size=n_ops)           # random gather idx
    dst_idx = rng.integers(0, n_elems, size=n_ops)       # random scatter idx
    acc = np.zeros(n_elems, dtype=np.float64)
    # all workers finish their ~GB of setup before ANY starts timing, so
    # the compute windows fully overlap and sum(ops)/max(wall) is a true
    # aggregate-throughput measurement (not inflated by staggered starts)
    barrier.wait()
    t0 = time.monotonic()
    for _ in range(N_ITERS):
        g = src[idx]                                     # gather: n_ops
        np.add.at(acc, dst_idx[: n_ops // 4], g[: n_ops // 4])  # n_ops//4
    wall = time.monotonic() - t0
    # element-ops actually performed: N_ITERS gathers of n_ops plus
    # N_ITERS scatter-adds of n_ops//4
    ops = N_ITERS * n_ops + N_ITERS * (n_ops // 4)
    out_q.put((ops, wall, float(acc[:8].sum() + g[:8].sum())))


def run_level(n_procs: int, n_elems: int, n_ops: int) -> dict:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(n_procs)
    procs = [
        mp.Process(
            target=_worker, args=(1000 + i, n_elems, n_ops, barrier, q)
        )
        for i in range(n_procs)
    ]
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    # barrier-synchronized compute windows: the slowest worker's wall
    # spans the overlapped measurement window
    wall = max(r[1] for r in results)
    total_ops = sum(r[0] for r in results)
    return {
        "procs": n_procs,
        "wall_sec": round(wall, 3),
        "per_worker_walls": [round(r[1], 3) for r in results],
        "agg_elems_per_sec": round(total_ops / wall),
    }


def main() -> None:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_high = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_elems = int(sys.argv[3]) if len(sys.argv) > 3 else 64_000_000  # 512 MB
    n_ops = int(sys.argv[4]) if len(sys.argv) > 4 else 50_000_000
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
    ideal = n_high / n_low
    eff = ratio / ideal
    ws_mb = n_elems * 8 // 1_000_000
    result = {
        "pattern": (
            f"random gather + scatter-add, {ws_mb}MB working set/proc"
        ),
        "low": low,
        "high": high,
        "all_lows": [r["agg_elems_per_sec"] for r in lows],
        "all_highs": [r["agg_elems_per_sec"] for r in highs],
        "speedup": round(ratio, 3),
        "ideal": round(ideal, 2),
        "bandwidth_scaling_ceiling": round(eff, 3),
    }
    print(json.dumps(result))
    md = f"""
## Host DRAM gather-scatter ceiling ({n_low} vs {n_high} processes)

Random-index gather + scatter-add over {ws_mb} MB/process
working sets in independent processes (tools/membw_probe.py, best-of-3
interleaved, barrier-synchronized compute windows) — the PageRank
superstep's access pattern with zero framework overhead. This bounds any
bandwidth-bound job's apparent scaling on this box; a real N->4N
executor scale-out multiplies memory channels by 4.

| processes | aggregate elems/sec (best) | all runs |
|---|---|---|
| {n_low} | {low['agg_elems_per_sec']:,} | {result['all_lows']} |
| {n_high} | {high['agg_elems_per_sec']:,} | {result['all_highs']} |

Speedup {n_low}->{n_high}: **{result['speedup']}x** of {result['ideal']}x ideal ->
host bandwidth-scaling ceiling **{result['bandwidth_scaling_ceiling']}** for this
access pattern.
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
