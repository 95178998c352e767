"""PageRank as DataFrame supersteps.

Semantics (shared EXACTLY with the DuckDB oracle and the numpy reference in
kgraph_framework_spark/oracle.py):

    score_0(v)   = 1 / N
    score_t+1(v) = (1-d)/N + d * ( Σ_{(u,v) ∈ E} score_t(u) · w(u,v)/wsum(u)
                                   + dangling_mass_t / N )

where wsum(u) = Σ outgoing weight of u and dangling_mass = Σ score over
vertices with no out-edges. Convergence: max |Δscore| < tol.

Scale design (10^12 edges):
* the edge table is normalized ONCE (weight / out-degree folded into a
  ``wnorm`` column), hash-repartitioned by src_vertex and cached — every
  superstep's join then reuses that exchange instead of reshuffling the
  big side per iteration;
* the per-superstep aggregation is groupBy(dst).sum — Spark performs
  map-side partial aggregation, the analog of per-partition combiners;
* plan lineage is truncated per superstep (localCheckpoint) via the pregel
  runner, and parquet checkpoints + lineage manifest make the loop
  resumable mid-iteration (north rule).

Reference analog: the iterate-score-until-recall>0.99 loop of NN-descent
(/root/reference/src/index_graph.cpp:139-190) with per-iteration telemetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgraph_framework_spark.plans.pregel import PregelResult, run_supersteps


#: measured crossover on local[32]: the CSR gather-scatter superstep
#: carries ~0.6 s of fixed Arrow/cogroup overhead but 35% lower
#: per-edge cost — join path wins below ~1M edges (sf0.1: join 1.06
#: s/step vs CSR 1.70 at 126k edges), CSR wins above (25M edges:
#: 5.3 vs 8.1 s/step, BENCH.md). At cluster scale CSR is always right.
CSR_CROSSOVER_EDGES = 1_000_000


def pagerank_auto(
    spark: SparkSession,
    edges: DataFrame,
    n_edges: int | None = None,
    partitions: int | None = None,
    **kw,
):
    """Cost-based physical choice between the two PageRank engines.

    Identical semantics either way (scores allclose 1e-12); the choice
    is purely physical, like Catalyst picking broadcast vs sort-merge.
    Pass ``n_edges`` if already known to avoid a count job.
    """
    if n_edges is None:
        n_edges = edges.count()
    if n_edges >= CSR_CROSSOVER_EDGES:
        from kgraph_framework_spark.operators.csr import pagerank_csr

        return pagerank_csr(spark, edges, n_parts=partitions, **kw)
    return pagerank(spark, edges, partitions=partitions, **kw)


def _prepare(spark: SparkSession, edges: DataFrame, partitions: int | None):
    e = edges.select(
        F.col("src_vertex").alias("src"),
        F.col("dst_vertex").alias("dst"),
        F.col("weight").cast("double").alias("w"),
    )
    wsum = e.groupBy("src").agg(F.sum("w").alias("wsum"))
    enorm = e.join(wsum, "src").select(
        "src", "dst", (F.col("w") / F.col("wsum")).alias("wnorm")
    )
    # pre-partition AND pre-sort the big (edge) side on the join key so
    # every superstep's sort-merge join reuses this layout (InMemoryScan
    # preserves outputPartitioning/Ordering): no per-superstep exchange or
    # sort of the edges — only the (smaller) ranks side shuffles.
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    enorm = (
        enorm.repartition(partitions, "src").sortWithinPartitions("src").persist()
    )

    vertices = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .repartition(partitions, "vertex")
        .sortWithinPartitions("vertex")
        .persist()
    )

    # vertices with no outgoing edge contribute "dangling mass"
    dangling = vertices.join(
        wsum.select(F.col("src").alias("vertex")), "vertex", "left_anti"
    ).persist()
    return enorm, vertices, dangling


def pagerank(
    spark: SparkSession,
    edges: DataFrame,
    damping: float = 0.85,
    max_iters: int = 50,
    tol: float | None = 1e-6,
    num_iters: int | None = None,
    checkpoint_dir: str | None = None,
    partitions: int | None = None,
    resume: bool = True,
    hub_threshold: int | None = None,
) -> PregelResult:
    """Run PageRank; returns PregelResult whose state is (vertex, score).

    ``num_iters`` forces an exact superstep count (oracle-comparison mode,
    no convergence action); otherwise iterate until max|Δ| < tol.

    ``hub_threshold`` enables explicit skew handling: source vertices with
    out-degree above it are HUBS — their score rows are broadcast and
    their (huge) edge slices join map-side, so no shuffle partition ever
    receives a hub's full adjacency (the north-star "broadcast of
    high-degree frontiers"; AQE skew-join splitting covers the residual).
    The hub-side partial contributions re-aggregate in the same
    groupBy(dst) — structurally the salting split-merge (the hub's rows
    are spread across ALL map partitions = maximal salt). Results are
    IDENTICAL to the plain path (physical change only, up to float
    summation order).
    """
    enorm, vertices, dangling = _prepare(spark, edges, partitions)
    hub_enorm = None
    if hub_threshold is not None:
        deg = enorm.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        hub_ids = deg.where(F.col("deg") > hub_threshold).select("src").persist()
        hub_enorm = enorm.join(F.broadcast(hub_ids), "src", "left_semi").persist()
        enorm = enorm.join(F.broadcast(hub_ids), "src", "left_anti").persist()
    n = vertices.count()
    has_dangling = dangling.limit(1).count() > 0
    iters = num_iters if num_iters is not None else max_iters
    check = num_iters is None and tol is not None

    ranks0 = vertices.withColumn("score", F.lit(1.0 / n))

    def step(ranks: DataFrame, i: int):
        """One superstep, fully lazy (no driver actions).

        The dangling mass is folded into the plan as a 1-row aggregate
        cross-joined in (Spark broadcasts it), and the previous score is
        carried as a ``prev`` column so the convergence delta is a narrow
        aggregate over the materialized state in ``post`` — together this
        keeps the runner at ONE job per superstep instead of three.
        """
        scatter = enorm.join(
            ranks.select(F.col("vertex").alias("src"), "score"), "src"
        )
        if hub_enorm is not None:
            hub_ranks = ranks.select(F.col("vertex").alias("src"), "score").join(
                F.broadcast(hub_ids.select("src")), "src", "left_semi"
            )
            scatter = scatter.unionByName(
                hub_enorm.join(F.broadcast(hub_ranks), "src")
            )
        contribs = (
            scatter.groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum(F.col("score") * F.col("wnorm")).alias("contrib"))
        )
        new = vertices.join(contribs, "vertex", "left")
        if has_dangling:
            dm_df = (
                ranks.join(dangling, "vertex", "left_semi")
                .agg(F.coalesce(F.sum("score"), F.lit(0.0)).alias("_dm"))
            )
            new = new.crossJoin(dm_df)
        else:
            new = new.withColumn("_dm", F.lit(0.0))
        score = (
            F.lit((1.0 - damping) / n)
            + F.lit(damping)
            * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("_dm") / n)
        ).alias("score")
        if check:
            # prev feeds only the convergence delta; fixed-round mode
            # (oracle/bench/scaling) never reads it — skip the join
            new = new.join(
                ranks.select("vertex", F.col("score").alias("prev")), "vertex"
            )
            new = new.select("vertex", score, "prev")
        else:
            new = new.select("vertex", score)
        return new, {"n_vertices": n}

    def post(state: DataFrame, info: dict) -> dict:
        if check:
            delta = state.agg(F.max(F.abs(F.col("score") - F.col("prev")))).first()[0]
            info["max_delta"] = float(delta)
        return info

    def converged(info: dict) -> bool:
        if num_iters is not None:
            return False
        return tol is not None and info.get("max_delta", 1.0) < tol

    result = run_supersteps(
        spark, ranks0, step, iters, converged_fn=converged,
        checkpoint_dir=checkpoint_dir, resume=resume,
        post_fn=post if check else None,
    )
    result.state = result.state.select("vertex", "score")
    enorm.unpersist()
    vertices.unpersist()
    dangling.unpersist()
    if hub_enorm is not None:
        hub_enorm.unpersist()
        hub_ids.unpersist()
    return result
