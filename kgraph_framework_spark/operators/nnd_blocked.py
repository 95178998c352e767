"""Blocked NN-descent: the fused kernels beyond the broadcast cap.

Reference behavior to match: the NN-descent kernel has ONE shape at any
corpus size that fits RAM (/root/reference/src/index_graph.cpp:139-190)
— there is no algorithmic cliff between "small" and "large" N. Round 3's
fused path (operators/nnd_fused.py) reproduced its throughput but only
while the whole float32 matrix fits a driver broadcast
(knn_graph.SCORE_BROADCAST_BYTES); above the cap the engine fell back to
the round-2 join loop, measured 3-4x slower. This module removes that
cliff: the SAME three-kernel superstep (sample -> pairgen -> merge) runs
with the corpus matrix partitioned into G hash blocks

    emb_blocks(g: int, ids: array<long> sorted, mat: binary float32, dim)

and the in-kernel scoring replaced by a TWO-STAGE COGROUP GATHER (the
CSR cogroup pattern, operators/csr.py):

  pairgen' : same candidate generation (reverse reservoir cap, new x new
             + new x old local join, canonical dedupe, exclusion) but
             emits UNSCORED canonical pairs keyed by g = blk(lo).
  gather-1 : cogroup(pairs by g, emb_blocks by g) — dedupe the group's
             pairs, bucket them by g2 = blk(hi), and emit ONE packed row
             per (g, g2) cell: the pair id arrays plus the UNIQUE lo
             vectors gathered from block g (each distinct lo vector
             ships once per cell, not once per pair).
  gather-2 : cogroup(cells by g2, emb_blocks by g) — gather hi vectors
             from block g2, score all pairs with the same chunked
             einsum, emit symmetric insert candidates pre-capped at L
             per target (map-side combine), keyed by merge block.

Sample and merge kernels are imported unchanged from nnd_fused; the
sampling hashes and the scoring arithmetic are identical, so the blocked
build is BIT-IDENTICAL to the fused build round for round (asserted in
tests/test_nnd_blocked.py).

Scale accounting per superstep (N vertices, sample S, pool L, dim d):
candidate volume is the same N*O(S^2); the pair shuffle into gather-1
carries 16-byte id pairs; the cell packs into gather-2 carry each
distinct touched vector AT MOST once per (g, g2) cell — bounded above by
min(pairs, touched-rows x G) x 4d bytes, always <= the per-pair vector
carry of a join-based gather and typically far smaller because a
vertex's S^2 candidate fan-in concentrates in few cells. The emb_blocks
side re-shuffles the matrix once per gather (2 x matrix bytes per
round), independent of pair count. Nothing is ever broadcast, collected,
or required to fit on one node: per-task memory is bounded by the cell
pack size (tunable via EMB_BLOCK_BYTES) and per-merge-block pool rows
(nnd_fused.auto_n_blocks).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgraph_framework_spark.operators.nnd_fused import (
    CAND_SCHEMA,
    MERGE_SCHEMA,
    SAMPLE_SCHEMA,
    _blk_np,
    _canonical_pairs,
    _empty,
    _merge_kernel,
    _pack2,
    _ranks,
    _sample_kernel,
    _unpack2,
    auto_n_blocks,
    blk_col,
    collect_exclusion,
    l2_gathered,
)
from kgraph_framework_spark.plans.pregel import (
    reclaim_shuffles,
    release_state,
    truncate_state,
)

EMB_BLOCK_SCHEMA = "g int, ids array<long>, mat binary, dim int"
PACK_SCHEMA = (
    "g2 int, lo array<long>, hi array<long>, u_ids array<long>, "
    "u_mat binary, dim int"
)
PAIR_SCHEMA = "g int, lo long, hi long"

#: target bytes per embedding block. Small enough that a (g, g2) cell's
#: pack plus two blocks fit comfortably in one task's memory; the block
#: count G = max(parallelism, matrix_bytes / EMB_BLOCK_BYTES) grows with
#: the corpus, so per-task memory stays bounded at any N.
EMB_BLOCK_BYTES = 64 << 20

_PACK_COLS = {
    "g2": "int32", "lo": "object", "hi": "object", "u_ids": "object",
    "u_mat": "object", "dim": "int32",
}
_PAIR_COLS = {"g": "int32", "lo": "int64", "hi": "int64"}
_CAND_COLS = {"blk": "int32", "src": "int64", "dst": "int64",
              "dist": "float64", "clear": "bool"}


def build_emb_blocks(emb: DataFrame, g_blocks: int) -> DataFrame:
    """Pack the vector table into one row per hash block: (sorted ids,
    contiguous float32 matrix bytes). The distributed analog of the
    reference's in-RAM `data_` matrix (include/index/index.h:57-60) —
    sharded, not replicated."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return _empty({"g": "int32", "ids": "object", "mat": "object",
                           "dim": "int32"})
        ids = pdf["vec_id"].to_numpy(np.int64)
        X = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
        o = np.argsort(ids, kind="stable")
        ids, X = ids[o], np.ascontiguousarray(X[o])
        return pd.DataFrame(
            {"g": [int(pdf["g"].iloc[0])], "ids": [ids],
             "mat": [X.tobytes()], "dim": [int(X.shape[1])]}
        )

    return (
        emb.select(
            blk_col(F.col("vec_id"), g_blocks).alias("g"),
            "vec_id",
            "embedding",
        )
        .groupBy("g")
        .applyInPandas(pack, EMB_BLOCK_SCHEMA)
    )


def n_emb_blocks(
    parallelism: int, n: int, dim: int, block_bytes: int = EMB_BLOCK_BYTES
) -> int:
    return int(max(parallelism, -(-(n * dim * 4) // block_bytes)))


def _pairgen_unscored_kernel(s: int, seed: int, g_blocks: int, excl_bc):
    """Stage 2a: candidate generation only — canonical (lo, hi) pairs
    keyed by the gather block of lo. Scoring happens in the two gather
    stages; the flag-clear rows are derived outside the kernel by
    filtering the sample output (same rows the fused kernel emits)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return _empty(_PAIR_COLS)
        lo, hi = _canonical_pairs(
            pdf["key"].to_numpy(np.int64),
            pdf["nbr"].to_numpy(np.int64),
            pdf["is_new"].to_numpy(bool),
            pdf["fwd"].to_numpy(bool),
            s, seed, excl_bc,
        )
        return pd.DataFrame(
            {"g": _blk_np(lo, g_blocks), "lo": lo, "hi": hi}
        )

    return fn


def _gather1_kernel(g_blocks: int):
    """Stage 2b: join pairs with their lo-side embedding block; emit one
    packed row per destination block g2 = blk(hi) carrying the pair id
    arrays and the gathered UNIQUE lo vectors."""

    def fn(pairs_pdf: pd.DataFrame, emb_pdf: pd.DataFrame) -> pd.DataFrame:
        if pairs_pdf.empty or emb_pdf.empty:
            return _empty(_PACK_COLS)
        ids = np.asarray(emb_pdf["ids"].iloc[0], np.int64)
        dim = int(emb_pdf["dim"].iloc[0])
        X = np.frombuffer(emb_pdf["mat"].iloc[0], np.float32).reshape(-1, dim)

        lo = pairs_pdf["lo"].to_numpy(np.int64)
        hi = pairs_pdf["hi"].to_numpy(np.int64)
        # cross-merge-block duplicates of the same canonical pair land in
        # the same g (keyed by lo) — collapse them before shipping vectors
        pk = np.unique(_pack2(lo, hi))
        lo, hi = _unpack2(pk)

        g2 = _blk_np(hi, g_blocks)
        o = np.argsort(g2, kind="stable")
        lo, hi, g2 = lo[o], hi[o], g2[o]
        starts = np.flatnonzero(np.r_[True, g2[1:] != g2[:-1]])
        bounds = np.append(starts, g2.size)
        rows: dict[str, list] = {c: [] for c in _PACK_COLS}
        for i in range(starts.size):  # <= G cells, not per-pair
            a, b = bounds[i], bounds[i + 1]
            l_, h_ = lo[a:b], hi[a:b]
            u = np.unique(l_)
            U = np.ascontiguousarray(X[np.searchsorted(ids, u)])
            rows["g2"].append(int(g2[a]))
            rows["lo"].append(l_)
            rows["hi"].append(h_)
            rows["u_ids"].append(u)
            rows["u_mat"].append(U.tobytes())
            rows["dim"].append(dim)
        return pd.DataFrame(rows)

    return fn


def _score_cells(packs_pdf: pd.DataFrame, emb_pdf: pd.DataFrame):
    """Score every pair in the group's cells: gather hi vectors from the
    co-grouped embedding block, lo vectors from the shipped packs.
    Returns (lo, hi, dist) concatenated over cells, or None."""
    ids2 = np.asarray(emb_pdf["ids"].iloc[0], np.int64)
    dim = int(emb_pdf["dim"].iloc[0])
    X2 = np.frombuffer(emb_pdf["mat"].iloc[0], np.float32).reshape(-1, dim)
    los, his, dists = [], [], []
    for row in packs_pdf.itertuples(index=False):  # <= G cells
        lo = np.asarray(row.lo, np.int64)
        hi = np.asarray(row.hi, np.int64)
        u_ids = np.asarray(row.u_ids, np.int64)
        U = np.frombuffer(row.u_mat, np.float32).reshape(-1, dim)
        d = l2_gathered(U, u_ids, lo, X2, ids2, hi)
        los.append(lo)
        his.append(hi)
        dists.append(d)
    if not los:
        return None
    return np.concatenate(los), np.concatenate(his), np.concatenate(dists)


def _gather2_kernel(l: int, n_blocks: int):
    """Stage 2c: score cells against the hi-side block, emit symmetric
    insert candidates pre-capped at L per target (the same map-side
    combine as the fused pairgen tail), keyed by merge block."""

    def fn(packs_pdf: pd.DataFrame, emb_pdf: pd.DataFrame) -> pd.DataFrame:
        if packs_pdf.empty or emb_pdf.empty:
            return _empty(_CAND_COLS)
        scored = _score_cells(packs_pdf, emb_pdf)
        if scored is None:
            return _empty(_CAND_COLS)
        lo, hi, dists = scored
        t = np.concatenate([lo, hi])
        tn = np.concatenate([hi, lo])
        td = np.concatenate([dists, dists])
        o2 = np.lexsort((tn, td, t))
        t, tn, td = t[o2], tn[o2], td[o2]
        kp = _ranks(np.r_[True, t[1:] != t[:-1]]) < l
        t, tn, td = t[kp], tn[kp], td[kp]
        return pd.DataFrame(
            {"blk": _blk_np(t, n_blocks), "src": t, "dst": tn, "dist": td,
             "clear": np.zeros(t.size, bool)}
        )

    return fn


def _gather2_directed_kernel():
    """Directed variant for init-pool scoring: emit (a, b, dist) as-is."""

    def fn(packs_pdf: pd.DataFrame, emb_pdf: pd.DataFrame) -> pd.DataFrame:
        if packs_pdf.empty or emb_pdf.empty:
            return _empty({"a": "int64", "b": "int64", "dist": "float64"})
        scored = _score_cells(packs_pdf, emb_pdf)
        if scored is None:
            return _empty({"a": "int64", "b": "int64", "dist": "float64"})
        lo, hi, dists = scored
        return pd.DataFrame({"a": lo, "b": hi, "dist": dists})

    return fn


def score_pairs_blocked(
    pairs: DataFrame, emb_blocks: DataFrame, g_blocks: int
) -> DataFrame:
    """Exact squared-L2 for directed (a, b) pairs via the two-stage
    cogroup gather — no broadcast, no embedding join. Distances are
    bit-identical to knn_graph._score_pairs (same float32 storage,
    float64 arithmetic). Duplicate (a, b) rows collapse to one."""
    keyed = pairs.select(
        blk_col(F.col("a"), g_blocks).alias("g"),
        F.col("a").alias("lo"),
        F.col("b").alias("hi"),
    )
    packs = (
        keyed.groupBy("g")
        .cogroup(emb_blocks.groupBy("g"))
        .applyInPandas(_gather1_kernel(g_blocks), PACK_SCHEMA)
    )
    return (
        packs.groupBy("g2")
        .cogroup(emb_blocks.groupBy("g"))
        .applyInPandas(
            _gather2_directed_kernel(), "a long, b long, dist double"
        )
    )


def nn_descent_blocked(
    spark: SparkSession,
    emb: DataFrame,
    k: int,
    l: int,
    s: int,
    max_iters: int,
    min_update_rate: float,
    seed: int,
    init: DataFrame | None = None,
    exclude_pairs: DataFrame | None = None,
    n_blocks: int | None = None,
    g_blocks: int | None = None,
    block_bytes: int = EMB_BLOCK_BYTES,
) -> tuple[DataFrame, list[dict]]:
    """Blocked superstep loop — same contract as nnd_fused.nn_descent_fused
    but with NO broadcast-matrix requirement. Returns (pool, metrics);
    the caller applies the final top-K cut."""
    from kgraph_framework_spark.operators.knn_graph import random_init

    row = emb.select(
        F.count(F.lit(1)).alias("n"), F.min(F.size("embedding")).alias("d")
    ).first()
    n, dim = int(row["n"] or 0), int(row["d"] or 0)
    dp = spark.sparkContext.defaultParallelism
    B = n_blocks or auto_n_blocks(dp, n, l)
    G = g_blocks or n_emb_blocks(dp, n, dim, block_bytes)

    emb_blocks = build_emb_blocks(emb, G).persist()
    emb_blocks.count()
    excl_bc = None
    if exclude_pairs is not None:
        excl_bc = collect_exclusion(exclude_pairs, spark)

    pool = init if init is not None else random_init(emb, k, seed)
    scored = score_pairs_blocked(
        pool.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        emb_blocks,
        G,
    )
    pool = scored.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "dist",
        F.lit(True).alias("is_new"),
    )
    pool = truncate_state(spark, pool)

    metrics: list[dict] = []
    n_edges_target = None
    for it in range(max_iters):
        t_round = time.monotonic()
        pool_b = pool.select(
            blk_col(F.col("src"), B).alias("blk"), "src", "dst", "dist",
            "is_new",
        )
        samples = (
            pool_b.groupBy("blk")
            .applyInPandas(_sample_kernel(s, seed + 3 * it + 1, B),
                           SAMPLE_SCHEMA)
            .persist()
        )
        # the flag-clear rows the fused pairgen emits inline: sampled-new
        # FORWARD entries (src/index_graph.cpp:88-111)
        clears = samples.where(F.col("fwd") & F.col("is_new")).select(
            blk_col(F.col("key"), B).alias("blk"),
            F.col("key").alias("src"),
            F.col("nbr").alias("dst"),
            F.lit(0.0).alias("dist"),
            F.lit(True).alias("clear"),
        )
        upairs = samples.groupBy("blk").applyInPandas(
            _pairgen_unscored_kernel(s, seed + 3 * it + 2, G, excl_bc),
            PAIR_SCHEMA,
        )
        packs = (
            upairs.groupBy("g")
            .cogroup(emb_blocks.groupBy("g"))
            .applyInPandas(_gather1_kernel(G), PACK_SCHEMA)
        )
        scored_cands = (
            packs.groupBy("g2")
            .cogroup(emb_blocks.groupBy("g"))
            .applyInPandas(_gather2_kernel(l, B), CAND_SCHEMA)
        )
        cands = scored_cands.unionByName(clears)
        merged = (
            pool_b.groupBy("blk")
            .cogroup(cands.groupBy("blk"))
            .applyInPandas(
                lambda kp, cp: _merge_kernel(l)(kp, cp), MERGE_SCHEMA
            )
        )
        new_pool = truncate_state(spark, merged)
        fresh = new_pool.where(F.col("fresh")).count()
        samples.unpersist()
        release_state(pool)
        # a blocked round at 1M vecs writes ~30 GB of shuffle; force the
        # superseded round's files off disk before the next one starts
        reclaim_shuffles(spark, n)
        if n_edges_target is None:
            n_edges_target = new_pool.count()
        rate = fresh / max(n_edges_target, 1)
        metrics.append(
            {"superstep": it, "new_entries": int(fresh),
             "update_rate": rate,
             "wall_sec": round(time.monotonic() - t_round, 2)}
        )
        pool = new_pool.select("src", "dst", "dist", "is_new")
        if rate < min_update_rate:
            break

    if excl_bc is not None:
        excl_bc.unpersist()
    emb_blocks.unpersist()
    return pool, metrics
