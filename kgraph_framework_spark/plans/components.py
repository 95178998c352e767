"""Connected components via synchronous hash-min label exchange.

Semantics (shared with the DuckDB oracle and the union-find reference in
oracle.py): labels start as the vertex id; each superstep every vertex takes
the min of its own label and its neighbors' labels (edges treated as
undirected — callers pass a symmetrized edge table or set symmetrize=True).
Converges in O(diameter) rounds; convergence = zero label changes.

Scale notes: identical join/groupBy shape to PageRank — the symmetrized
edge table is repartitioned by src and cached once; each superstep is one
co-partitioned join + one min-aggregation with map-side combine. For
pathological long-chain graphs the large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond") halves
rounds; planned as a follow-up optimization — transcript affiliation
graphs are shallow (tools/roles are hubs), so hash-min converges in a
handful of rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgraph_framework_spark.plans.pregel import PregelResult, run_supersteps


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    max_iters: int = 50,
    num_iters: int | None = None,
    symmetrize: bool = True,
    checkpoint_dir: str | None = None,
    partitions: int | None = None,
    resume: bool = True,
    accelerate: bool | None = None,
) -> PregelResult:
    """Hash-min CC; result state is (vertex, label), label = min vertex id.

    ``num_iters`` runs exactly that many synchronous rounds without the
    convergence action (oracle-comparison mode, plain hash-min so the
    unrolled SQL twin matches round for round).

    ``accelerate`` (default: on unless ``num_iters`` is set) adds a
    pointer-jumping shortcut after each exchange — label(v) <-
    label(label(v)) — so convergence is O(log diameter) rounds instead of
    O(diameter). Transcript reply chains are long paths (a 300-turn
    conversation is a 300-vertex path), which plain hash-min walks one
    hop per round; with the shortcut the label graph halves each round.
    The converged fixpoint is identical either way (min reachable id).
    """
    e = edges.select(
        F.col("src_vertex").alias("src"), F.col("dst_vertex").alias("dst")
    )
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    e = e.distinct()
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # pre-partition + pre-sort the edge side once; every superstep's SMJ
    # then reuses the layout (same rationale as plans/pagerank.py)
    e = e.repartition(partitions, "src").sortWithinPartitions("src").persist()

    vertices = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .repartition(partitions, "vertex")
        .sortWithinPartitions("vertex")
        .persist()
    )
    labels0 = vertices.withColumn("label", F.col("vertex"))
    iters = num_iters if num_iters is not None else max_iters
    check = num_iters is None
    if accelerate is None:
        accelerate = num_iters is None

    def step(labels: DataFrame, i: int):
        nbr_min = (
            e.join(labels.select(F.col("vertex").alias("src"), "label"), "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new = labels.select("vertex", "label").join(nbr_min, "vertex", "left").select(
            "vertex",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        if accelerate:
            # pointer jumping: follow the label one hop in label space.
            # labels are always ids of live vertices, so the self-join is
            # total; distances in label space halve every application.
            hop = new.select(
                F.col("vertex").alias("label"), F.col("label").alias("label2")
            )
            new = new.join(hop, "label", "left").select(
                "vertex",
                F.least(
                    F.col("label"), F.coalesce(F.col("label2"), F.col("label"))
                ).alias("label"),
            )
        new = new.join(
            labels.select("vertex", F.col("label").alias("prev")), "vertex"
        )
        return new, {}

    def post(state: DataFrame, info: dict) -> dict:
        changed = state.where(F.col("label") != F.col("prev")).count()
        info["changed"] = int(changed)
        return info

    result = run_supersteps(
        spark,
        labels0,
        step,
        iters,
        converged_fn=(lambda info: info.get("changed", 1) == 0) if check else None,
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        post_fn=post if check else None,
    )
    result.state = result.state.select("vertex", "label")
    e.unpersist()
    vertices.unpersist()
    return result
