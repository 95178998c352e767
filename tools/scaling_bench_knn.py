"""Compute-bound scaling probe: the brute-force distance-scoring pass.

The PageRank superstep is memory-bandwidth-bound on one box (BENCH.md);
this probe measures the OTHER class of work the engine runs — dense
distance kernels (similarity search / kNN-graph scoring): each corpus
partition streams through mapInPandas and scores every vector against a
BROADCAST batch of query vectors (one numpy matmul per Arrow batch —
operators/similarity's brute-force path). FLOPs per byte scale with the
query-batch size, so the job tracks the hardware CPU ceiling rather
than the memory bus.

Usage: python tools/scaling_bench_knn.py [n_vecs] [n_queries] [n_low] [n_high]
Appends results to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
# pin BLAS to one thread per task — otherwise numpy's own thread pool
# grabs all cores and erases the Spark-level parallelism being measured
for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[v] = "1"
import numpy as np, pandas as pd
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from kgraph_framework_spark.session import get_spark

cores = int(sys.argv[1]); n_vecs = int(sys.argv[2]); n_q = int(sys.argv[3])
spark = get_spark(f"knn-scale-{{cores}}", cores=cores, shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")

# deterministic synthetic vectors, pure JVM arithmetic (dim=64)
def u(col, salt):
    return (F.pmod(col * F.lit(2654435761 + salt * 97), F.lit(1 << 31))
            / F.lit(float(1 << 31)) - F.lit(0.5))
emb = spark.range(n_vecs).select(
    F.col("id").alias("vec_id"),
    F.transform(F.sequence(F.lit(0), F.lit(63)),
                lambda j: u(F.col("id") * 64 + j, 7).cast("float")).alias("embedding"),
).repartition(cores * 2).persist()
emb.count()

rng = np.random.default_rng(42)
queries = rng.standard_normal((n_q, 64))
bq = spark.sparkContext.broadcast(queries)

def nearest(it):
    q = bq.value
    qn = (q * q).sum(1)
    for pdf in it:
        x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ q.T) + qn[None, :]
        yield pd.DataFrame({{"vec_id": pdf["vec_id"], "mind": d2.min(1)}})

scored = emb.mapInPandas(nearest, schema="vec_id long, mind double")
scored.limit(1000).count()  # warmup
t0 = time.monotonic()
total = scored.agg(F.sum("mind")).first()[0]
wall = time.monotonic() - t0
n_pairs = n_vecs * n_q
print(json.dumps({{
    "cores": cores, "n_pairs": n_pairs, "wall_sec": round(wall, 2),
    "pairs_per_sec": round(n_pairs / wall), "checksum": round(total, 3),
}}))
spark.stop()
"""


def run_level(cores: int, n_vecs: int, k: int) -> dict:
    code = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(n_vecs), str(k)],
        capture_output=True, text=True, timeout=3600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        sys.stderr.write(out.stdout[-2000:] + out.stderr[-4000:])
        raise RuntimeError(f"worker at {cores} cores produced no JSON")
    return json.loads(lines[-1])


def best_interleaved(n: int, c_low: int, c_high: int, a, b):
    """Best-of-n per level, INTERLEAVED (low, high, low, high, ...) with a
    cool-down pause: the sandbox's deliverable CPU fluctuates ~2-3x over
    minutes (shared host / sustained-load throttling), so consecutive
    same-level runs would bias whichever level ran during the good
    window. Interleaving exposes both levels to the same conditions; the
    per-level minimum reflects the job."""
    import time as _t
    lows, highs = [], []
    for i in range(n):
        lows.append(run_level(c_low, a, b))
        _t.sleep(20)
        highs.append(run_level(c_high, a, b))
        if i < n - 1:
            _t.sleep(20)
    return (min(lows, key=lambda r: r["wall_sec"]),
            min(highs, key=lambda r: r["wall_sec"]))


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 512  # query-batch size
    n_low = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_high = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    low, high = best_interleaved(3, n_low, n_high, n_vecs, k)
    assert low["checksum"] == high["checksum"], "nondeterministic scoring!"
    eff = (high["pairs_per_sec"] / low["pairs_per_sec"]) / (n_high / n_low)
    result = {
        "n_vecs": n_vecs, "k": k, "n_pairs": low["n_pairs"],
        "low": low, "high": high,
        "speedup": round(high["pairs_per_sec"] / low["pairs_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    md = f"""
## Scaling evidence — compute-bound distance kernel (local[{n_low}] vs local[{n_high}])

Brute-force scoring of {low['n_pairs']:,} vector-query pairs (64-dim,
numpy matmul per Arrow batch via mapInPandas, query batch broadcast;
tools/scaling_bench_knn.py; identical checksum at both levels).

| parallelism | wall (s) | pairs/sec |
|---|---|---|
| local[{n_low}]  | {low['wall_sec']} | {low['pairs_per_sec']:,} |
| local[{n_high}] | {high['wall_sec']} | {high['pairs_per_sec']:,} |

Speedup: **{result['speedup']}x** of {n_high // n_low}x ideal ->
scaling efficiency **{result['scaling_efficiency']}**.
"""
    with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
        fh.write(md)


if __name__ == "__main__":
    main()
