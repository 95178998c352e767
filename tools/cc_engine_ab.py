"""Same-window A/B of the CC engines (join vs CSC-block) at large edge
counts — the measurement behind the components crossover note.

Interleaved fresh-JVM runs (join, csr, join, csr) on the identical
deterministic 25M-edge corpus; fixed plain hash-min rounds (num_iters,
no pointer jumping) so both engines do the same label algebra; the
order-insensitive label checksum is asserted identical across every run.

Usage: python tools/cc_engine_ab.py [n_convs] [rounds]
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
from kgraph_framework_spark.session import get_spark
from kgraph_framework_spark.sources.transcripts import synthesize_transcripts
from kgraph_framework_spark.operators.edges import union_graph

engine = sys.argv[1]; n_convs = int(sys.argv[2]); rounds = int(sys.argv[3])
spark = get_spark(f"cc-ab-{{engine}}", cores=32, shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
t = synthesize_transcripts(spark, n_convs=n_convs, seed=42)
edges = union_graph(t).persist()
n_edges = edges.count()
t0 = time.monotonic()
if engine == "csr":
    from kgraph_framework_spark.plans.components import connected_components_csr
    res = connected_components_csr(spark, edges, num_iters=rounds, n_parts=32)
else:
    from kgraph_framework_spark.plans.components import connected_components
    res = connected_components(spark, edges, num_iters=rounds)
wall = time.monotonic() - t0
from pyspark.sql import functions as F
term = F.pmod(
    F.pmod(F.col("vertex"), F.lit(1 << 31)) * F.pmod(F.col("label"), F.lit(1 << 31)),
    F.lit(1 << 61),
)
row = res.state.agg(
    F.count(F.lit(1)).alias("n"),
    F.sum(term.cast("decimal(38,0)")).alias("x"),
    F.count_distinct(F.col("label")).alias("d"),
).first()
step_secs = [m.seconds for m in res.metrics]
steady = step_secs[1:] if len(step_secs) > 2 else step_secs
print(json.dumps({{
    "engine": engine, "n_edges": n_edges, "rounds": rounds,
    "wall_sec": round(wall, 2),
    "step_secs": [round(s, 2) for s in step_secs],
    "sec_per_superstep": round(sum(steady) / len(steady), 3),
    "checksum": f"{{row['n']}}:{{row['x']}}:{{row['d']}}",
}}))
spark.stop()
"""


def run(engine: str, n_convs: int, rounds: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=REPO),
         engine, str(n_convs), str(rounds)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    results = []
    for engine in ("join", "csr", "join", "csr"):
        r = run(engine, n_convs, rounds)
        print(json.dumps(r), flush=True)
        results.append(r)
    checks = {r["checksum"] for r in results}
    assert len(checks) == 1, f"label checksums diverge: {checks}"
    print(json.dumps({
        "n_edges": results[0]["n_edges"],
        "join_sec_per_superstep": [
            r["sec_per_superstep"] for r in results if r["engine"] == "join"
        ],
        "csr_sec_per_superstep": [
            r["sec_per_superstep"] for r in results if r["engine"] == "csr"
        ],
        "checksum_identical": True,
    }))


if __name__ == "__main__":
    main()
