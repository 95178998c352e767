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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgraph_framework_spark.plans.pregel import PregelResult, run_supersteps


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", Alg. 3): every node links its LARGER
    neighbors to its minimum neighborhood member."""
    sym = (
        e.select("u", "v")
        .unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round (Alg. 4): orient large→small, link every node's
    smaller-or-equal neighbors (and itself) to the neighborhood min."""
    orient = (
        e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = orient.groupBy("u").agg(F.min("v").alias("mv"))
    nb = orient.join(mins, "u")
    return (
        nb.where(F.col("v") != F.col("mv"))
        .select(F.col("v").alias("u"), F.col("mv").alias("v"))
        .unionByName(mins.select(F.col("u"), F.col("mv").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components_star(
    spark: SparkSession,
    edges: DataFrame,
    max_iters: int = 50,
    checkpoint_dir: str | None = None,
    resume: bool = True,
) -> PregelResult:
    """CC via alternating large-star/small-star edge rewriting.

    Alternative to hash-min label exchange (PAPERS.md:
    CC-in-logarithmic-rounds): the STATE is the shrinking edge set, not
    a label vector — each superstep rewrites edges toward component
    minima and provably converges in O(log n) rounds even on long
    paths, where plain hash-min needs O(diameter) and pointer-jumping
    hash-min O(log diameter) with a heavier per-round self-join.
    Convergence = the edge multiset reaches a fixpoint (order-free
    checksum). Labels at the fixpoint: every vertex points at its
    component's minimum id (star edges), roots label themselves —
    identical output to :func:`connected_components`.
    """
    e0 = (
        edges.select(
            F.col("src_vertex").alias("u"), F.col("dst_vertex").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    vertices = (
        edges.select(F.col("src_vertex").alias("vertex"))
        .unionByName(edges.select(F.col("dst_vertex").alias("vertex")))
        .distinct()
        .persist()
    )

    prev_chk: list = [None]

    def step(e: DataFrame, i: int):
        return _small_star(_large_star(e)), {}

    def post(state: DataFrame, info: dict) -> dict:
        row = state.agg(
            F.count(F.lit(1)).alias("n"),
            # reduce operands below 2^31 BEFORE multiplying: vertex ids
            # are 63-bit hashes and ANSI mode faults on long overflow
            # decimal accumulator: the 2^61-bounded terms overflow a
            # LONG sum under ANSI mode on big edge sets
            F.sum(
                F.pmod(
                    F.pmod(F.col("u"), F.lit(1 << 31)) * F.lit(1_099_511_627)
                    + F.pmod(F.col("v"), F.lit(1 << 31)),
                    F.lit(1 << 61),
                ).cast("decimal(38,0)")
            ).alias("h"),
        ).first()
        chk = (row["n"], row["h"])
        info["changed"] = chk != prev_chk[0]
        prev_chk[0] = chk
        return info

    result = run_supersteps(
        spark,
        e0,
        step,
        max_iters,
        converged_fn=lambda info: not info.get("changed", True),
        checkpoint_dir=checkpoint_dir,
        resume=resume,
        post_fn=post,
    )
    star = result.state.select(
        F.greatest("u", "v").alias("child"), F.least("u", "v").alias("root")
    )
    lbl = star.groupBy("child").agg(F.min("root").alias("l"))
    labels = (
        vertices.join(lbl, vertices.vertex == lbl.child, "left")
        .select(
            "vertex", F.coalesce(F.col("l"), F.col("vertex")).alias("label")
        )
    )
    result.state = labels
    vertices.unpersist()
    return result


def connected_components_csr(
    spark: SparkSession,
    edges: DataFrame,
    max_iters: int = 50,
    num_iters: int | None = None,
    symmetrize: bool = True,
    checkpoint_dir: str | None = None,
    n_parts: int | None = None,
    resume: bool = True,
    accelerate: bool | None = None,
) -> PregelResult:
    """Hash-min CC over packed CSC blocks — same semantics and output as
    :func:`connected_components` (labels EXACTLY equal; integer min has
    no float-order ambiguity), with the per-superstep neighbor-min
    running inside Arrow-batched numpy instead of a row join.

    The symmetrized edge set is packed ONCE (operators/csr.py
    build_csc_blocks, dst-grouped, src dictionary-coded, partitioned by
    pmod(src)); each superstep cogroups the static blocks with the label
    vector partitioned the same way, gathers src labels with one exact
    ``searchsorted``, segment-mins per destination with
    ``minimum.reduceat`` over the build-time offsets, and emits each
    block-distinct dst once — the same pre-aggregated shuffle bound as
    pagerank_csr (distinct dsts per block, not edges). ``accelerate``
    adds the same pointer-jumping shortcut as the join engine.
    """
    from kgraph_framework_spark.operators.csr import build_csc_blocks, part_col

    e = edges.select(
        F.col("src_vertex").alias("src"), F.col("dst_vertex").alias("dst")
    )
    if symmetrize:
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    # persist the symmetrized-distinct edge set: both the CSC pack and
    # the vertex derivation consume it (without this the 50M-row
    # symmetrize+distinct runs twice)
    e = e.distinct().persist()
    if n_parts is None:
        # data-sized block count (operators/csr.auto_n_parts) — bounds
        # per-block arrays at any corpus size; also materializes the
        # persisted edge set before the pack
        from kgraph_framework_spark.operators.csr import auto_n_parts

        n_parts = auto_n_parts(spark, e.count())
    csc = build_csc_blocks(
        e.select(
            F.col("src").alias("src_vertex"), F.col("dst").alias("dst_vertex")
        ),
        n_parts,
    ).persist()

    vertices = (
        e.select(F.col("src").alias("vertex"))
        .unionByName(e.select(F.col("dst").alias("vertex")))
        .distinct()
        .repartition(n_parts, "vertex")
        .persist()
    )
    labels0 = vertices.withColumn("label", F.col("vertex"))
    iters = num_iters if num_iters is not None else max_iters
    check = num_iters is None
    if accelerate is None:
        accelerate = num_iters is None

    def scatter_min(key, blocks: pd.DataFrame, labels: pd.DataFrame) -> pd.DataFrame:
        if blocks.empty or labels.empty:
            return pd.DataFrame({"vertex": [], "partial": []}).astype(
                {"vertex": "int64", "partial": "int64"}
            )
        lv = labels["vertex"].to_numpy(np.int64)
        ll = labels["label"].to_numpy(np.int64)
        o = np.argsort(lv, kind="stable")
        lv, ll = lv[o], ll[o]
        outs = []
        for _, row in blocks.iterrows():
            src_uniq = np.asarray(row["src_uniq"], dtype=np.int64)
            codes = np.asarray(row["src_codes"], dtype=np.int64)
            dst_ids = np.asarray(row["dst_ids"], dtype=np.int64)
            indptr = np.asarray(row["dst_indptr"], dtype=np.int64)
            # exact gather: every src in the block is a vertex in this
            # co-partitioned label slice (same pmod on both sides)
            svals = ll[np.searchsorted(lv, src_uniq)]
            mins = np.minimum.reduceat(svals[codes], indptr[:-1])
            outs.append(pd.DataFrame({"vertex": dst_ids, "partial": mins}))
        return pd.concat(outs, ignore_index=True)

    def step(labels: DataFrame, i: int):
        lp = labels.select(
            "vertex", "label", part_col(F.col("vertex"), n_parts).alias("part_id")
        )
        partials = (
            csc.groupBy("part_id")
            .cogroup(lp.groupBy("part_id"))
            .applyInPandas(scatter_min, schema="vertex long, partial long")
        )
        nbr_min = partials.groupBy("vertex").agg(F.min("partial").alias("nbr_label"))
        new = labels.select("vertex", "label").join(nbr_min, "vertex", "left").select(
            "vertex",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        if accelerate:
            hop = new.select(
                F.col("vertex").alias("label"), F.col("label").alias("label2")
            )
            new = new.join(hop, "label", "left").select(
                "vertex",
                F.least(
                    F.col("label"), F.coalesce(F.col("label2"), F.col("label"))
                ).alias("label"),
            )
        if check:
            # prev is only read by the convergence count — fixed-round
            # (oracle/bench) mode skips the join entirely
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
    csc.unpersist()
    vertices.unpersist()
    e.unpersist()
    return result


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
        if check:
            # prev feeds only the convergence count; fixed-round mode
            # (oracle/bench) never reads it — skip the join
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
