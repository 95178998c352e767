"""Randomized KD-tree forest initializer for kNN-graph construction.

Reference: IndexKDtree::Build (/root/reference/src/index_kdtree.cpp:341-507)
— the one reference entry point (the `kdtree` driver,
tests/kdtree_buildall_and_evaluate.cpp:53-121) without a round-1 analog.
The reference's stages map to Spark as follows:

* BFS mean/variance splits (meanSplit :20-70, selectDivision :108-133,
  planeSplit :72-107, BFS loop :401-433) -> iterative refinement of a
  ``(tree_id, node)`` path column: one DataFrame round per tree level.
  Split statistics come from a per-node SAMPLE (the reference samples
  SAMPLE_NUM=100 rows, :29) gathered by a deterministic hash filter —
  the grouped-pandas ``decide`` kernel only ever sees samples, never
  whole nodes, so the stage scales to arbitrary node sizes.
* DFS leaf build (DFSbuild :135-165, leaf when <= TNS=10 :140-147) ->
  the same loop; a node at or under ``leaf_size`` stops splitting.
* mergeSubGraphs leaf all-pairs (:243-305) -> groupBy(tree_id, leaf)
  self-join (J3).
* mergeSubGraphs cross-leaf routed join (:222-241,307-335; SearchToLeaf
  :209-219) -> every point routes down its ``route_levels`` nearest
  ancestor-sibling subtrees to the leaf it would land in (J4); the
  (tiny) split table is broadcast and the walk is a vectorized
  per-level gather. The reference routes only smaller-sibling into
  larger; we route symmetrically and dedupe — same candidate coverage,
  simpler dataflow.
* random pad of underfull rows to K (:473-503) -> knn_search.pad_to_k.

Determinism: the reference seeds its tree RNG (seed=1998, :349); here
every random choice (split-dim pick among the top-5 variance dims,
:122-126) derives from a portable integer hash of (tree_id, node, seed),
so builds are bit-reproducible across cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgraph_framework_spark.operators.knn_graph import (
    _hash_order,
    _score_pairs,
    broadcast_matrix,
)
from kgraph_framework_spark.plans.pregel import release_state, truncate_state

SPLIT_SCHEMA = (
    "tree_id int, node long, mode string, div_dim int, div_val double"
)
SAMPLE_TARGET = 100  # reference SAMPLE_NUM (index_kdtree.h:82-89)
TOP_DIMS = 5  # reference RAND_DIM pool (index_kdtree.cpp:122-126)


def _int_hash(*vals: int) -> int:
    """Portable integer mix (same constants as knn_graph._hash_order)."""
    h = 146959810393
    for v in vals:
        h = ((h % (1 << 31)) * 1_099_511_627 + (int(v) % (1 << 31))) % (1 << 61)
    return h


def _decide(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """Split decision for one node from its SAMPLE rows.

    meanSplit (/root/reference/src/index_kdtree.cpp:20-70): per-dim mean
    and variance over the sample (A5), split dim drawn from the top-5
    variance dims (selectDivision :108-133), cutval = mean. Fallbacks:
    a cut that sends (almost) everything one way uses the sample MEDIAN
    instead (the reference's balanced-split index correction, :56-67 —
    T4); a fully degenerate dim (all values equal) splits by id-hash
    parity (the reference escapes after 10 stuck repeats,
    src/index_lsh.cpp:654-659 uses the same trick for CLSH).
    """
    tree_id, node, seed = int(key[0]), int(key[1]), int(key[2])
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mean = x.mean(axis=0)
    var = x.var(axis=0)
    order = np.argsort(-var, kind="stable")[:TOP_DIMS]
    pick = _int_hash(tree_id, node, seed) % len(order)
    div_dim = int(order[pick])
    col = x[:, div_dim]
    div_val = float(mean[div_dim])
    frac = float((col <= div_val).mean())
    mode = "cut"
    if frac < 0.05 or frac > 0.95:
        div_val = float(np.median(col))
        frac = float((col <= div_val).mean())
        if frac < 0.05 or frac > 0.95:
            mode = "hash"  # degenerate dim: split by id parity
    return pd.DataFrame(
        {
            "tree_id": [tree_id],
            "node": [node],
            "mode": [mode],
            "div_dim": [div_dim],
            "div_val": [div_val],
        }
    )


def build_kdtree_forest(
    spark: SparkSession,
    emb: DataFrame,
    n_trees: int = 4,
    leaf_size: int = 16,
    seed: int = 1998,
    max_depth: int = 24,
    n: int | None = None,
    max_leaves_per_tree: int = 1 << 15,
) -> tuple[DataFrame, list[dict]]:
    """BFS-split the corpus into per-tree leaves.

    Returns (leaves, splits): leaves = (vec_id, tree_id, node) with one
    row per (vector, tree); splits = driver-side list of split records
    (the broadcastable tree structure, metadata only, no vectors).

    DRIVER-MEMORY BOUND: ``leaf_size`` grows with the corpus so each
    tree has at most ``max_leaves_per_tree`` leaves — the forest is a
    COARSE partitioner at scale (the reference's mLevel spirit: trees
    stop at a fixed level and leaves become work units,
    /root/reference/src/index_kdtree.cpp:196-207). The split table is
    therefore O(n_trees * max_leaves_per_tree) regardless of N; at
    10^9 vectors the default caps the table at ~32k nodes/tree while
    leaves (~30k vectors) still flow through the leaf self-join as
    grouped Arrow batches.
    """
    if n is None:
        n = emb.count()
    leaf_size = max(leaf_size, -(-n // max_leaves_per_tree))
    state = emb.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(*[F.lit(t) for t in range(n_trees)])
        ).alias("tree_id"),
    ).withColumn("node", F.lit(1).cast("long"))
    state = truncate_state(spark, state)

    all_splits: list[dict] = []
    done_leaves = []
    for depth in range(max_depth):
        sizes = state.groupBy("tree_id", "node").agg(
            F.count(F.lit(1)).alias("nsz")
        )
        leaf_nodes = sizes.where(F.col("nsz") <= leaf_size)
        split_nodes = sizes.where(F.col("nsz") > leaf_size)

        # snapshot the finished-leaf slice NOW: it must not depend on
        # ``state`` after release_state frees state's checkpoint blocks
        newly_done = truncate_state(
            spark,
            state.join(
                F.broadcast(leaf_nodes.select("tree_id", "node")),
                ["tree_id", "node"],
                "left_semi",
            ).select("vec_id", "tree_id", "node"),
        )
        done_leaves.append(newly_done)

        active = state.join(
            F.broadcast(split_nodes.select("tree_id", "node", "nsz")),
            ["tree_id", "node"],
        )
        if active.limit(1).count() == 0:
            state = None
            break

        # deterministic ~SAMPLE_TARGET-row sample per node, no window:
        # keep rows whose hash lands under 4*target/size (clamped to 1)
        sample = active.where(
            F.pmod(_hash_order(F.col("vec_id"), F.col("node"), F.lit(seed)),
                   F.lit(1_000_000))
            < F.least(
                F.lit(1_000_000),
                (F.lit(4 * SAMPLE_TARGET * 1_000_000) / F.col("nsz")).cast("long"),
            )
        ).withColumn("skey", F.lit(seed))
        decisions = sample.groupBy("tree_id", "node", "skey").applyInPandas(
            lambda key, pdf: _decide(key, pdf), schema=SPLIT_SCHEMA
        )
        rows = decisions.collect()
        if not rows:
            # pathological: every sample filter missed (tiny nodes) —
            # force-leaf the remainder
            done_leaves.append(active.select("vec_id", "tree_id", "node"))
            state = None
            break
        all_splits.extend(r.asDict() for r in rows)

        dec = spark.createDataFrame(rows, SPLIT_SCHEMA)
        nxt = active.join(F.broadcast(dec), ["tree_id", "node"]).select(
            "vec_id",
            "embedding",
            "tree_id",
            (
                F.col("node") * 2
                + F.when(
                    F.col("mode") == "hash",
                    F.pmod(_hash_order(F.col("vec_id"), F.lit(seed)), F.lit(2)),
                ).otherwise(
                    (
                        F.element_at(
                            F.col("embedding").cast("array<double>"),
                            F.col("div_dim") + 1,
                        )
                        <= F.col("div_val")
                    ).cast("long")
                )
            ).alias("node"),
        )
        new_state = truncate_state(spark, nxt)
        release_state(state)
        state = new_state

    if state is not None:  # depth cap hit: remaining nodes become leaves
        done_leaves.append(state.select("vec_id", "tree_id", "node"))

    leaves = done_leaves[0]
    for d in done_leaves[1:]:
        leaves = leaves.unionByName(d)
    out = truncate_state(spark, leaves)
    for d in done_leaves:  # per-round snapshots now superseded
        release_state(d)
    release_state(state)
    return out, all_splits


def _route_to_leaf(
    leaves: DataFrame,
    splits: list[dict],
    seed: int,
    route_levels: int,
) -> DataFrame:
    """Cross-leaf candidate routing (J4): each point descends the
    subtree rooted at each of its ``route_levels`` nearest ancestor
    siblings to the leaf it would land in (SearchToLeaf,
    /root/reference/src/index_kdtree.cpp:209-219). The split table is
    broadcast; the walk is a per-level vectorized gather."""
    starts = None
    for lvl in range(1, route_levels + 1):
        s = leaves.where(
            F.col("node") >= F.lit(1 << lvl)  # ancestor at that level exists
        ).select(
            "vec_id",
            "embedding",
            "tree_id",
            F.shiftright(F.col("node"), lvl - 1).bitwiseXOR(F.lit(1)).alias("cur"),
        )
        starts = s if starts is None else starts.unionByName(s)
    if starts is None:
        return leaves.sparkSession.createDataFrame(
            [], "vec_id long, tree_id int, node long"
        )

    by_tree: dict[int, dict[str, pd.Series]] = {}
    for rec in splits:
        t = by_tree.setdefault(
            rec["tree_id"], {"dim": {}, "val": {}, "mode": {}}
        )
        t["dim"][rec["node"]] = rec["div_dim"]
        t["val"][rec["node"]] = rec["div_val"]
        t["mode"][rec["node"]] = 1 if rec["mode"] == "hash" else 0
    packed = {
        t: (
            pd.Series(d["dim"]),
            pd.Series(d["val"]),
            pd.Series(d["mode"]),
        )
        for t, d in by_tree.items()
    }
    max_hops = max(
        (max(d["dim"].keys()).bit_length() for d in by_tree.values()),
        default=2,
    ) + 2
    # bounded by max_leaves_per_tree (see build_kdtree_forest), so a
    # broadcast — not a per-task closure — carries the whole forest
    bc_packed = leaves.sparkSession.sparkContext.broadcast(packed)

    def walk(it):
        from kgraph_framework_spark.operators.nnd_fused import _hash_np

        packed = bc_packed.value
        for pdf in it:
            if pdf.empty:
                continue
            out_frames = []
            for tree_id, grp in pdf.groupby("tree_id"):
                cur = grp["cur"].to_numpy(np.int64).copy()
                if tree_id not in packed:
                    out_frames.append(
                        pd.DataFrame(
                            {"vec_id": grp["vec_id"], "tree_id": tree_id,
                             "node": cur}
                        )
                    )
                    continue
                dim_s, val_s, mode_s = packed[tree_id]
                x = np.stack(grp["embedding"].to_numpy()).astype(np.float64)
                ids = grp["vec_id"].to_numpy(np.int64)
                for _ in range(max_hops):
                    dims = dim_s.reindex(cur).to_numpy()
                    internal = ~np.isnan(dims)
                    if not internal.any():
                        break
                    d = np.where(internal, dims, 0).astype(np.int64)
                    v = np.where(
                        internal, val_s.reindex(cur).to_numpy(), 0.0
                    )
                    hmode = np.where(
                        internal, mode_s.reindex(cur).to_numpy(), 0
                    ).astype(bool)
                    go_left = x[np.arange(len(cur)), d] <= v
                    hside = _hash_np(ids, seed) % 2
                    side = np.where(hmode, hside, go_left.astype(np.int64))
                    cur = np.where(internal, cur * 2 + side, cur)
                out_frames.append(
                    pd.DataFrame(
                        {"vec_id": ids, "tree_id": tree_id, "node": cur}
                    )
                )
            if out_frames:
                yield pd.concat(out_frames, ignore_index=True)

    return starts.mapInPandas(walk, schema="vec_id long, tree_id int, node long")


def kdtree_init(
    spark: SparkSession,
    emb: DataFrame,
    k: int,
    n_trees: int = 4,
    leaf_size: int = 16,
    route_levels: int = 2,
    seed: int = 1998,
) -> DataFrame:
    """KD-forest candidate init: (src, dst, dist, is_new) top-k pools.

    Leaf all-pairs (J3) ∪ routed cross-leaf pairs (J4), scored exactly,
    per-vertex top-k, random-padded to k (F6) — the full
    IndexKDtree::Build candidate pipeline. Feed to
    ``nn_descent(init=...)`` for the reference's kdtree driver lifecycle
    (tests/kdtree_buildall_and_evaluate.cpp:53-121).
    """
    from kgraph_framework_spark.operators.knn_search import pad_to_k

    e = emb.select("vec_id", "embedding").persist()
    bc = broadcast_matrix(e)
    leaves, splits = build_kdtree_forest(
        spark, e, n_trees=n_trees, leaf_size=leaf_size, seed=seed
    )
    leaves = leaves.persist()

    members = leaves.select("tree_id", "node", F.col("vec_id").alias("b"))
    lhs = leaves.select("tree_id", "node", F.col("vec_id").alias("a"))
    leaf_pairs = (
        lhs.join(members, ["tree_id", "node"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
    )

    leaf_emb = leaves.join(e, "vec_id").select(
        "vec_id", "embedding", "tree_id", "node"
    )
    routed = _route_to_leaf(leaf_emb, splits, seed, route_levels)
    routed_pairs = (
        routed.join(members, ["tree_id", "node"])
        .where(F.col("vec_id") != F.col("b"))
        .select(
            F.least(F.col("vec_id"), F.col("b")).alias("a"),
            F.greatest(F.col("vec_id"), F.col("b")).alias("b"),
        )
    )
    from kgraph_framework_spark.operators.nnd_fused import (
        score_sym_topk,
        topk_per_src,
    )

    scored = None
    if bc is not None:
        # keep the leaf join's locality (co-leaf pairs share srcs within
        # a batch) and let score_sym_topk's map-side top-k compress the
        # pair set before the shuffle; cross-tree duplicates score to
        # identical values and collapse in the global top-k
        pairs = leaf_pairs.unionByName(routed_pairs)
        sym = score_sym_topk(pairs, bc, k)
    else:
        pairs = leaf_pairs.unionByName(routed_pairs).distinct()
        scored = truncate_state(spark, _score_pairs(pairs, e, bc))
        sym = scored.unionByName(
            scored.select(F.col("b").alias("a"), F.col("a").alias("b"), "dist")
        ).select(F.col("a").alias("src"), F.col("b").alias("dst"), "dist")

    # materialize pre-pad: pad_to_k + the descent's init scoring would
    # otherwise re-execute the leaf/routed joins per reference
    pre = truncate_state(
        spark, topk_per_src(sym, k).withColumn("is_new", F.lit(True))
    )
    release_state(scored)
    pool = truncate_state(spark, pad_to_k(pre, e, k, seed=seed + 7, bc=bc))
    release_state(pre)
    leaves.unpersist()
    e.unpersist()
    return pool
