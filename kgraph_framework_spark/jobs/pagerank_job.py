"""spark-submit entry point: transcripts → edge table → PageRank.

The cluster launch path the north rule mandates::

    spark-submit --py-files kgraph_framework_spark.zip \\
        kgraph_framework_spark/jobs/pagerank_job.py \\
        --events /data/sf0.1 --output /out/scores \\
        --checkpoint-dir /ckpt/pr --tol 1e-6 --hub-threshold 100000

On a cluster the session comes from spark-submit's conf (master, executor
counts — the N vs 4N sizing lives entirely in submit flags); standalone
runs fall back to the local session factory. Reference analog: the CLI
build-and-evaluate drivers (/root/reference/tests/*.cpp) — argv params in,
metrics out.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--events", required=True,
                    help="directory containing events.parquet (or an events table path)")
    ap.add_argument("--output", required=True, help="parquet output for (vertex, score)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iters", type=int, default=50)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--hub-threshold", type=int, default=None)
    ap.add_argument(
        "--engine", choices=("auto", "csr", "join"), default="auto",
        help="superstep strategy: csr = Arrow gather-scatter over CSR "
        "blocks (~35%% faster steady-state at 25M edges, BENCH.md), "
        "join = relational scatter (supports --hub-threshold), auto = "
        "cost-based pick by edge count (cluster-scale inputs get csr)",
    )
    args = ap.parse_args(argv)
    if args.hub_threshold is not None and args.engine != "join":
        # the CSR engine's block-local pre-aggregation is structural
        # salting, so --hub-threshold only applies to the join engine;
        # an operator's explicit skew mitigation must not vanish silently
        ap.error(
            "--hub-threshold requires --engine join (csr/auto pre-aggregate "
            "hubs structurally; pass --engine join to force the salted path)"
        )

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("kgraph-pagerank").getOrCreate()
    from kgraph_framework_spark.operators.edges import union_graph
    from kgraph_framework_spark.plans.pagerank import pagerank
    from kgraph_framework_spark.session import tune_session
    from kgraph_framework_spark.sources.transcripts import transcripts_from_events

    tune_session(spark)
    t0 = time.monotonic()
    transcripts = transcripts_from_events(spark, args.events)
    edges = union_graph(transcripts).persist()
    n_edges = edges.count()
    if args.engine == "auto":
        from kgraph_framework_spark.plans.pagerank import pagerank_auto

        res = pagerank_auto(
            spark, edges, n_edges=n_edges,
            damping=args.damping, tol=args.tol, max_iters=args.max_iters,
            checkpoint_dir=args.checkpoint_dir, partitions=args.partitions,
        )
    elif args.engine == "csr":
        from kgraph_framework_spark.operators.csr import pagerank_csr

        res = pagerank_csr(
            spark, edges,
            damping=args.damping, tol=args.tol, max_iters=args.max_iters,
            checkpoint_dir=args.checkpoint_dir, n_parts=args.partitions,
        )
    else:
        res = pagerank(
            spark, edges,
            damping=args.damping, tol=args.tol, max_iters=args.max_iters,
            checkpoint_dir=args.checkpoint_dir, partitions=args.partitions,
            hub_threshold=args.hub_threshold,
        )
    res.state.write.mode("overwrite").parquet(args.output)
    wall = time.monotonic() - t0
    step_secs = [m.seconds for m in res.metrics]
    per_step = sum(step_secs) / max(len(step_secs), 1)
    print(json.dumps({
        "n_edges": n_edges,
        "supersteps": res.supersteps,
        "converged": res.converged,
        "wall_sec": round(wall, 2),
        "sec_per_superstep": round(per_step, 3),
        "edges_per_sec_per_superstep": round(n_edges / per_step) if per_step else None,
        "output": args.output,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
