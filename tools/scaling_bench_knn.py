"""Compute-bound scaling probe: the kNN distance-kernel superstep.

The PageRank superstep is memory-bandwidth-bound on one box (BENCH.md);
this probe measures the OTHER class of superstep the engine runs — the
NN-descent candidate-scoring pass (Arrow-batched numpy L2 kernel,
operators/knn_graph._score_pairs) — which does real FLOPs per byte and
should track the hardware's CPU ceiling.

Usage: python tools/scaling_bench_knn.py [n_vecs] [k] [n_low] [n_high]
Appends results to BENCH.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from kgraph_framework_spark.session import get_spark
from kgraph_framework_spark.operators.knn_graph import random_init, _score_pairs

cores = int(sys.argv[1]); n_vecs = int(sys.argv[2]); k = int(sys.argv[3])
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

pairs = random_init(emb, k=k).select(
    F.col("src").alias("a"), F.col("dst").alias("b")
).persist()
n_pairs = pairs.count()
# warmup (JIT + Arrow spin-up)
_score_pairs(pairs.limit(10000), emb).count()
t0 = time.monotonic()
total = _score_pairs(pairs, emb).agg(F.sum("dist")).first()[0]
wall = time.monotonic() - t0
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


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    n_low = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_high = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    low = run_level(n_low, n_vecs, k)
    high = run_level(n_high, n_vecs, k)
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

NN-descent candidate scoring over {low['n_pairs']:,} pairs of 64-dim
vectors (Arrow-batched numpy L2; tools/scaling_bench_knn.py; identical
checksum at both levels).

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
