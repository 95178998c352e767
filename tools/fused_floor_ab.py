"""A/B of auto_n_blocks' 4x-parallelism floor on the FUSED descent.

The floor was measured on the blocked loop (BENCH.md n_blocks A/B: up
to 1.6x at 500k x 128-d) but auto_n_blocks is shared, so the fused
loop's block count moved 32 -> 128 unmeasured — ADVICE r4 flags that
small fused corpora now run 4x more tiny applyInPandas groups (fixed
per-group overhead). This measures exactly that: interleaved fresh-JVM
runs of the fused loop at n_blocks=32 (old core-count floor) vs 128
(4x floor) on auto-fused-regime corpora (matrix < 16 MB), fixed round
count, identical output checksum asserted (outputs are B-independent
by construction).

Usage: python tools/fused_floor_ab.py [n_vecs] [rounds]
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
sys.path.insert(0, {tools!r})
from pyspark.sql import functions as F
from kgraph_framework_spark.session import get_spark
from kgraph_framework_spark.operators.knn_graph import broadcast_matrix
from kgraph_framework_spark.operators.nnd_fused import (
    nn_descent_fused, topk_per_src,
)
from knn_midscale_bench import synth_vectors_hier

B = int(sys.argv[1]); n_vecs = int(sys.argv[2]); rounds = int(sys.argv[3])
k = 10
spark = get_spark(f"fused-floor-{{B}}", cores=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
emb = synth_vectors_hier(spark, n_vecs, 64, dim=64).persist()
emb.count()
bc = broadcast_matrix(emb, min_vecs=1)
t0 = time.monotonic()
pool, metrics = nn_descent_fused(
    spark, emb, bc, k=k, l=3 * k, s=(3 * k) // 2, max_iters=rounds,
    min_update_rate=0.0, seed=42, n_blocks=B,
)
graph = topk_per_src(pool.select("src", "dst", "dist"), k, B).persist()
n_edges = graph.count()
wall = time.monotonic() - t0
term = F.pmod(
    F.pmod(F.col("src"), F.lit(1 << 31)) * F.lit(31)
    + F.pmod(F.col("dst"), F.lit(1 << 31)),
    F.lit(1 << 61),
)
row = graph.agg(F.sum(term.cast("decimal(38,0)")).alias("x")).first()
print(json.dumps({{
    "n_blocks": B, "n_vecs": n_vecs, "rounds": len(metrics),
    "wall_sec": round(wall, 2),
    "round_walls": [m["wall_sec"] for m in metrics],
    "rounds_wall_sec": round(sum(m["wall_sec"] for m in metrics), 2),
    "n_edges": n_edges, "checksum": str(row["x"]),
}}))
spark.stop()
"""


def run(n_blocks: int, n_vecs: int, rounds: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c",
         WORKER.format(repo=REPO, tools=os.path.join(REPO, "tools")),
         str(n_blocks), str(n_vecs), str(rounds)],
        capture_output=True, text=True, check=True, timeout=1800,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    results = []
    for B in (32, 128, 32, 128):
        r = run(B, n_vecs, rounds)
        print(json.dumps(r), flush=True)
        results.append(r)
    checks = {r["checksum"] for r in results}
    assert len(checks) == 1, f"graph checksums diverge: {checks}"
    print(json.dumps({
        "n_vecs": n_vecs,
        "b32_rounds_wall": [
            r["rounds_wall_sec"] for r in results if r["n_blocks"] == 32
        ],
        "b128_rounds_wall": [
            r["rounds_wall_sec"] for r in results if r["n_blocks"] == 128
        ],
        "checksum_identical": True,
    }))


if __name__ == "__main__":
    main()
