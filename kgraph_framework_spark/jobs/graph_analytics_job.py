"""spark-submit entry point: full analytics sweep over the transcript graph.

Runs the edge derivation plus any subset of {pagerank, components,
labelprop, triangles} and writes each result + a run-metrics JSON line.

    spark-submit --py-files kgraph_framework_spark.zip \\
        kgraph_framework_spark/jobs/graph_analytics_job.py \\
        --events /data/sf0.1 --output-dir /out --algos pagerank,components
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--events", required=True)
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--algos", default="pagerank,components,labelprop,triangles")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--lp-rounds", type=int, default=5)
    args = ap.parse_args(argv)
    algos = set(args.algos.split(","))

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("kgraph-analytics").getOrCreate()
    from kgraph_framework_spark.operators.edges import tool_cousage_edges, union_graph
    from kgraph_framework_spark.plans.components import connected_components
    from kgraph_framework_spark.plans.labelprop import label_propagation
    from kgraph_framework_spark.plans.pagerank import pagerank
    from kgraph_framework_spark.plans.triangles import triangles_per_vertex
    from kgraph_framework_spark.session import tune_session
    from kgraph_framework_spark.sources.transcripts import transcripts_from_events

    tune_session(spark)
    transcripts = transcripts_from_events(spark, args.events)
    edges = union_graph(transcripts).persist()
    metrics: dict = {"n_edges": edges.count()}

    def ckpt(name: str) -> str | None:
        return f"{args.checkpoint_dir}/{name}" if args.checkpoint_dir else None

    if "pagerank" in algos:
        t0 = time.monotonic()
        res = pagerank(spark, edges, tol=1e-6, max_iters=50,
                       checkpoint_dir=ckpt("pagerank"))
        res.state.write.mode("overwrite").parquet(f"{args.output_dir}/pagerank")
        metrics["pagerank"] = {
            "supersteps": res.supersteps, "converged": res.converged,
            "wall_sec": round(time.monotonic() - t0, 2),
        }
    if "components" in algos:
        t0 = time.monotonic()
        res = connected_components(spark, edges, max_iters=60,
                                   checkpoint_dir=ckpt("components"))
        res.state.write.mode("overwrite").parquet(f"{args.output_dir}/components")
        metrics["components"] = {
            "supersteps": res.supersteps, "converged": res.converged,
            "wall_sec": round(time.monotonic() - t0, 2),
        }
    if "labelprop" in algos:
        t0 = time.monotonic()
        res = label_propagation(spark, edges, num_iters=args.lp_rounds,
                                checkpoint_dir=ckpt("labelprop"))
        res.state.write.mode("overwrite").parquet(f"{args.output_dir}/labelprop")
        metrics["labelprop"] = {"rounds": args.lp_rounds,
                                "wall_sec": round(time.monotonic() - t0, 2)}
    if "triangles" in algos:
        t0 = time.monotonic()
        tri = triangles_per_vertex(tool_cousage_edges(transcripts))
        tri.write.mode("overwrite").parquet(f"{args.output_dir}/triangles")
        metrics["triangles"] = {"wall_sec": round(time.monotonic() - t0, 2)}

    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
