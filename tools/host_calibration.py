"""Fixed host-calibration micro-benchmarks, emitted with every bench run.

This sandbox's deliverable CPU/memory throughput swings up to ~2.3x on
identical code over hours (BENCH.md: round-4 forensic A/Bs, overnight
re-runs, membw re-probes). Cross-round wall comparisons are therefore
meaningless without a same-instant host reading. This module runs three
seed-pinned probes, chosen to span the three resources the engine's
kernels actually bind on (BENCH.md round-4 attribution):

1. ``kernel_sec`` — single-core, BLAS-pinned numpy sort-cascade +
   fancy-gather over a fixed 4M-row working set: the descent merge
   kernel's shape (nnd_fused._merge_np's 1-key cascades). Pure CPU +
   cache; best-of-3.
2. ``anon_fault_gbps`` — first-touch rate for fresh 256 MB anonymous
   allocations: the host cost that dominated kernel walls before the
   preallocated-buffer rewrite (BENCH.md 17b: ~2 s / 64 MB in bad
   windows); best-of-3.
3. ``membw_2p/8p`` + ``membw_ceiling`` — one barrier-synchronized
   random gather/scatter run at 2 and at 8 processes (membw_probe's
   pattern at 1/4 working set, single run each for speed): the DRAM
   parallelism the box delivers right now. The full best-of-3 probe
   (tools/membw_probe.py) remains the authority for scaling-precondition
   decisions; this quick reading flags the window.

NORMALIZATION RULE (BENCH.md states the same): when comparing walls
across BENCH_rN.json rounds, scale the older wall by
``kernel_sec(new) / kernel_sec(old)`` for CPU-bound queries and treat
any window whose ``kernel_sec`` is >1.3x the best recorded value as
degraded (report, don't compare). Throughput claims (the like-for-like
kNN point, PageRank e/s/superstep) should only be REPLACED from runs
whose calibration is within ~15% of the best recorded window.

Usage: python tools/host_calibration.py  -> one JSON line.
Library: calibrate() -> dict (used by bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

# pin BLAS before numpy import (parity with membw_probe / scaling_bench)
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np  # noqa: E402

_TOOLS = os.path.dirname(os.path.abspath(__file__))


def pinned_kernel_sec(n: int = 4_000_000, reps: int = 3) -> float:
    """Best-of-`reps` wall for a fixed-seed 1-key sort cascade + gather.

    Mirrors the merge kernel's hot shape (unstable float sort -> stable
    int-key sorts -> fancy gathers) at a size (~100 MB touched) well
    past LLC, so it reads the same CPU+cache+DRAM mix the descent
    kernels do. Deterministic: fixed seed, fixed n.
    """
    rng = np.random.default_rng(12345)
    dist = rng.random(n)
    key = rng.integers(0, 1 << 40, size=n)
    src = rng.integers(0, 1 << 20, size=n)
    best = float("inf")
    sink = 0.0
    for _ in range(reps):
        t0 = time.monotonic()
        o = np.argsort(dist, kind="stable")
        o2 = o[np.argsort(key[o], kind="stable")]
        o3 = o2[np.argsort(src[o2], kind="stable")]
        sink += float(dist[o3[:8]].sum())
        best = min(best, time.monotonic() - t0)
    assert sink == sink  # keep the gathers live
    return round(best, 4)


def anon_fault_gbps(nbytes: int = 1 << 28, reps: int = 3) -> float:
    """Best-of-`reps` first-touch rate (GB/s) for fresh anon memory.

    Each rep allocates AND writes a fresh 256 MB block (np.ones), which
    glibc mmaps (>> mmap threshold) so every page faults — the exact
    cost class BENCH.md 17b measured at ~2 s / 64 MB in degraded
    windows and that MALLOC_MMAP_THRESHOLD_ tuning avoids inside Spark
    workers. This probe intentionally does NOT set that tuning: it
    measures the raw host fault rate.
    """
    best = 0.0
    for _ in range(reps):
        t0 = time.monotonic()
        a = np.ones(nbytes // 8, dtype=np.float64)
        dt = time.monotonic() - t0
        assert a[::65536].sum() > 0
        del a
        best = max(best, nbytes / dt / 1e9)
    return round(best, 3)


def quick_membw() -> dict:
    """One run each at 2 and 8 processes of membw_probe's gather/scatter
    pattern at 1/4 working set (128 MB/proc, 12.5M ops) — a window
    indicator, not the precondition authority (that stays the full
    best-of-3 probe)."""
    sys.path.insert(0, _TOOLS)
    from membw_probe import run_level

    low = run_level(2, 16_000_000, 12_500_000)
    high = run_level(8, 16_000_000, 12_500_000)
    ceiling = (high["agg_elems_per_sec"] / low["agg_elems_per_sec"]) / 4.0
    return {
        "membw_2p_elems_per_sec": low["agg_elems_per_sec"],
        "membw_8p_elems_per_sec": high["agg_elems_per_sec"],
        "membw_ceiling": round(ceiling, 3),
    }


def calibrate(include_membw: bool = True) -> dict:
    out = {
        "kernel_sec": pinned_kernel_sec(),
        "anon_fault_gbps": anon_fault_gbps(),
    }
    if include_membw:
        out.update(quick_membw())
    return out


if __name__ == "__main__":
    print(json.dumps(calibrate()))
