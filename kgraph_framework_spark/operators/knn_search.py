"""kNN-graph query layer: batched greedy search, LSH init, incremental add.

Completes the reference's index lifecycle on Spark:

* :func:`greedy_search` — IndexGraph::Search
  (/root/reference/src/index_graph.cpp:349-399): best-first expansion of
  a bounded candidate pool over the prebuilt kNN graph. The Spark form is
  BATCHED beam search: every query expands its whole unexpanded top-L
  beam per superstep (one co-partitioned join against the adjacency
  table) instead of one node at a time — same fixpoint (no unexpanded
  node in the top-L beam), executor-friendly.

* :func:`lsh_init` — the RP-LSH initializer (IndexLSH::Build,
  /root/reference/src/index_lsh.cpp:391-467): random-hyperplane codes
  bucket the vectors; within-bucket all-pairs scored and kept top-K.
  Feed the result to ``nn_descent(init=...)`` for the reference's
  lsh+nndescent pipeline (tests/rplsh_buildall_and_evaluate.cpp).

* :func:`graph_add` — incremental insert (GraphAdd,
  /root/reference/src/index_graph.cpp:443-480): new points greedy-search
  the existing graph for their neighborhoods, edges are inserted
  SYMMETRICALLY (new->found and found->new), and affected vertices
  re-top-K — the micro-batch append path (SURVEY.md §2.10).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kgraph_framework_spark.operators.knn_graph import (
    _hash_order,
    _score_pairs,
    broadcast_matrix,
    id_index,
    id_stats,
)
from kgraph_framework_spark.plans.pregel import release_state, truncate_state


def greedy_search(
    spark: SparkSession,
    graph: DataFrame,
    emb: DataFrame,
    query_emb: DataFrame,
    k: int = 10,
    l: int | None = None,
    n_seeds: int | None = None,
    max_hops: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Batched greedy kNN search over a prebuilt graph.

    graph: (src, dst[, dist]) adjacency; emb: (vec_id, embedding);
    query_emb: (query_id, q_emb). Returns (query_id, rank, vec_id,
    dist) — top-k by squared L2 among visited vertices.
    """
    if l is None:
        l = max(k + 5, int(1.5 * k))
    if n_seeds is None:
        n_seeds = l
    n, contiguous = id_stats(emb)
    adj = graph.select("src", "dst").persist()
    qe = query_emb.select("query_id", F.col("q_emb").alias("embedding")).persist()

    # seeds: deterministic pseudo-random ids per query (reference seeds
    # the pool with L random points, :352-360); synthesized slots map
    # through a dense index when ids are gapped/non-zero-based
    seeds = (
        qe.select("query_id")
        .select(
            "query_id",
            F.explode(F.sequence(F.lit(0), F.lit(n_seeds - 1))).alias("slot"),
        )
        .select(
            "query_id",
            F.pmod(
                _hash_order(F.col("query_id") * n_seeds + F.col("slot"), F.lit(seed)),
                F.lit(n),
            ).alias("ridx"),
        )
    )
    if contiguous:
        seeds = seeds.withColumnRenamed("ridx", "vec_id").distinct()
    else:
        seeds = (
            seeds.join(id_index(emb), "ridx").drop("ridx").distinct()
        )

    def score(cands: DataFrame) -> DataFrame:
        """(query_id, vec_id) -> + dist (squared L2 to the query)."""
        pairs = cands.select(
            F.col("query_id").alias("a"), F.col("vec_id").alias("b")
        )
        ea = qe.select(F.col("query_id").alias("a"), F.col("embedding").alias("ea"))
        eb = emb.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
        scored = pairs.join(ea, "a").join(eb, "b")
        from pyspark.sql.functions import pandas_udf
        import pandas as pd

        @pandas_udf("double")
        def l2sq(xa, xb):
            a = np.stack(xa.to_numpy()).astype(np.float64)
            b = np.stack(xb.to_numpy()).astype(np.float64)
            d = a - b
            return pd.Series(np.einsum("ij,ij->i", d, d))

        return scored.select(
            F.col("a").alias("query_id"),
            F.col("b").alias("vec_id"),
            l2sq(F.col("ea"), F.col("eb")).alias("dist"),
        )

    pool = score(seeds).withColumn("expanded", F.lit(False))
    pool = truncate_state(spark, pool)

    for _hop in range(max_hops):
        wl = Window.partitionBy("query_id").orderBy("dist", "vec_id")
        beam = pool.withColumn("rn", F.row_number().over(wl)).where(F.col("rn") <= l)
        frontier = beam.where(~F.col("expanded")).select("query_id", "vec_id")
        n_frontier = frontier.limit(1).count()
        if n_frontier == 0:
            break
        neigh = (
            frontier.join(adj, frontier.vec_id == adj.src)
            .select("query_id", F.col("dst").alias("vec_id"))
            .distinct()
            .join(pool.select("query_id", "vec_id"), ["query_id", "vec_id"], "left_anti")
        )
        newly = score(neigh).withColumn("expanded", F.lit(False))
        expanded_now = frontier.withColumn("was_exp", F.lit(True))
        merged = (
            pool.join(expanded_now, ["query_id", "vec_id"], "left")
            .select(
                "query_id", "vec_id", "dist",
                (F.col("expanded") | F.col("was_exp").isNotNull()).alias("expanded"),
            )
            .unionByName(newly)
        )
        # keep a bounded working set: top-L plus expansion flags
        wk = Window.partitionBy("query_id").orderBy("dist", "vec_id")
        merged = (
            merged.withColumn("rn", F.row_number().over(wk))
            .where(F.col("rn") <= 4 * l)
            .drop("rn")
        )
        new_pool = truncate_state(spark, merged)
        release_state(pool)
        pool = new_pool

    wk = Window.partitionBy("query_id").orderBy("dist", "vec_id")
    out = (
        pool.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "vec_id", "dist")
    )
    adj.unpersist()
    qe.unpersist()
    return out


def clsh_buckets(
    emb: DataFrame,
    bits: int,
    n_tables: int,
    seed: int,
    max_bucket: int,
    extra_bits: int = 12,
) -> DataFrame:
    """Recursive LSH bucket assignment — (vec_id, table_id, bucket).

    The reference's CLSH (/root/reference/src/index_lsh.cpp:616-697)
    splits any bucket above the size cap with a FRESH hyperplane and
    recurses (extendHashFamily :604-613). Spark form: every vector gets
    a full ``bits + extra_bits``-bit code in ONE vectorized pass, and
    the recursion becomes iterative PREFIX refinement on the aggregate:
    a bucket at depth d is the code's leading ``bits + d`` bits; buckets
    still over the cap descend one level (one more bit of their existing
    code). No vector is ever dropped (the old behavior skipped oversized
    buckets wholesale), and stuck buckets (all-identical codes) settle
    at the depth floor after ``extra_bits`` rounds, mirroring the
    reference's 10-repeat escape hatch (:654-659).

    Bucket key packs (depth, prefix) so buckets from different depths
    never collide: bucket = (prefix << 5) | depth_used.
    """
    from kgraph_framework_spark.operators.similarity import lsh_code_udf

    total_bits = bits + extra_bits
    tagged = None
    for t in range(n_tables):
        code = lsh_code_udf(total_bits, seed=seed + 1000 * t)
        b = emb.select(
            "vec_id",
            F.lit(t).alias("table_id"),
            code(F.col("embedding").cast("array<double>")).alias("code"),
        )
        tagged = b if tagged is None else tagged.unionByName(b)
    # materialize once: ``tagged`` is referenced by both the settle-depth
    # aggregate and the final join — without this the Gaussian-projection
    # matmul re-runs per reference (measured 3x at 20k vecs)
    tagged = truncate_state(emb.sparkSession, tagged)

    # NOTE: lsh_code_udf packs bit j of plane j at weight 2^j, so the
    # "leading" bits of the conceptual prefix are the LOW bits of the
    # packed code: prefix at depth d = code & ((1 << (bits+d)) - 1).
    #
    # Single-pass settle-depth computation (no per-depth iteration —
    # an iterative split loop doubles the logical-plan DAG per level):
    # explode every code into its (depth, prefix) chain once, count
    # bucket sizes per (table, depth, prefix), and settle each vector at
    # its SHALLOWEST under-cap depth. Bucket sizes shrink monotonically
    # with depth, so min(depth | size <= cap) IS the recursion's stop
    # level; vectors whose whole chain is over-cap (degenerate identical
    # codes) settle at the depth floor — the reference's stuck-repeat
    # escape (:654-659). Cost: 2 shuffles regardless of depth.
    ex = tagged.select(
        "vec_id",
        "table_id",
        "code",
        F.explode(F.sequence(F.lit(0), F.lit(extra_bits))).alias("d"),
    ).withColumn(
        "prefix",
        F.col("code").bitwiseAND(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {bits} + d) - 1")
        ),
    )
    sizes = ex.groupBy("table_id", "d", "prefix").agg(
        F.count(F.lit(1)).alias("bn")
    )
    small = sizes.where(F.col("bn") <= max_bucket).select(
        "table_id", "d", "prefix"
    )
    mind = (
        ex.join(small, ["table_id", "d", "prefix"], "left_semi")
        .groupBy("vec_id", "table_id", "code")
        .agg(F.min("d").alias("d"))
    )
    return (
        tagged.join(mind, ["vec_id", "table_id", "code"], "left")
        .withColumn("d", F.coalesce(F.col("d"), F.lit(extra_bits)))
        .withColumn(
            "prefix",
            F.col("code").bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), {bits} + d) - 1")
            ),
        )
        .select(
            "vec_id",
            "table_id",
            (F.shiftleft(F.col("prefix"), 5) + F.col("d")).alias("bucket"),
        )
    )


def bucket_pairs(
    buckets: DataFrame,
    max_bucket: int | None = None,
    distinct: bool = True,
) -> DataFrame:
    """Canonical (a < b) co-bucketed pairs from a bucket table.

    This is both the init's candidate set and the refinement-phase
    exclusion set (the reference's inSameBucket skip,
    /root/reference/include/index/index_graph.h:39-44).
    ``max_bucket`` guards against quadratic blowup if the caller passes
    un-split buckets. ``distinct=False`` keeps cross-table duplicates
    AND the bucket-join's partition locality — the score_sym_topk init
    path wants that locality for its map-side top-k and dedupes in the
    final global top-k instead (one less shuffle of the full pair set).
    """
    b = buckets
    if max_bucket is not None:
        sizes = b.groupBy("table_id", "bucket").agg(F.count(F.lit(1)).alias("bn"))
        b = b.join(
            sizes.where(F.col("bn") <= max_bucket).select("table_id", "bucket"),
            ["table_id", "bucket"],
        )
    lhs = b.select("table_id", "bucket", F.col("vec_id").alias("a"))
    rhs = b.select("table_id", "bucket", F.col("vec_id").alias("b"))
    out = (
        lhs.join(rhs, ["table_id", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    return out.distinct() if distinct else out


def pad_to_k(
    pool: DataFrame, emb: DataFrame, k: int, seed: int = 4242, bc=None
) -> DataFrame:
    """Pad vertices with < k pool entries up to k with scored random ids.

    Reference analog: the random pad of underfull rows after KD-tree /
    LSH init (/root/reference/src/index_kdtree.cpp:482-499,
    src/index_lsh.cpp:271-274). Deterministic (seeded hash slots); only
    the underfull vertices generate candidates, so the pad is O(deficit).
    """
    from kgraph_framework_spark.operators.knn_graph import random_init

    degs = pool.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    under = degs.where(F.col("deg") < k).select("src")
    verts = emb.select(F.col("vec_id").alias("src"))
    missing = verts.join(degs, "src", "left_anti").select("src")
    need = under.unionByName(missing)
    # 2k random candidates per underfull vertex (collisions with the
    # existing pool are deduped by the groupBy below)
    rand = random_init(emb, k=2 * k, seed=seed).join(need, "src", "left_semi")
    scored = _score_pairs(
        rand.select(F.col("src").alias("a"), F.col("dst").alias("b")), emb, bc
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"), "dist")
    merged = (
        pool.select("src", "dst", "dist")
        .unionByName(scored)
        .groupBy("src", "dst")
        .agg(F.min("dist").alias("dist"))
    )
    w = Window.partitionBy("src").orderBy("dist", "dst")
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("src", "dst", "dist", F.lit(True).alias("is_new"))
    )


def lsh_init(
    emb: DataFrame,
    k: int,
    bits: int | None = None,
    n_tables: int = 4,
    seed: int = 42,
    max_bucket: int = 200,
    n: int | None = None,
    return_buckets: bool = False,
    bc=None,
):
    """RP-LSH candidate init: within-bucket all-pairs, top-K per vertex.

    ``n_tables`` independent hyperplane sets (the reference's numTable,
    rplsh driver -t flag). Oversized buckets are recursively SPLIT with
    extra hyperplane bits (CLSH, src/index_lsh.cpp:616-697) — no vertex
    is dropped — and vertices still under k candidates after the bucket
    joins are padded with scored random ids (src/index_lsh.cpp:271-274).
    Output matches random_init's schema (src, dst, dist, is_new); with
    ``return_buckets`` also returns the (vec_id, table_id, bucket)
    assignment so refinement can skip already-compared co-bucketed pairs
    (SetInBuckets handoff, tests/rplsh_buildall_and_evaluate.cpp:112-115).
    """
    from kgraph_framework_spark.operators.similarity import adaptive_bits

    if bits is None:
        if n is None:
            n = emb.count()
        bits = adaptive_bits(n, target_bucket=64)
    if bc is None:
        bc = broadcast_matrix(emb)
    spark = emb.sparkSession
    buckets = truncate_state(spark, clsh_buckets(emb, bits, n_tables, seed, max_bucket))
    # guard the self-join against buckets that settled at the depth floor
    # still above the cap (duplicate/near-identical vectors give identical
    # codes across ALL hyperplanes — the reference escapes via its
    # 10-repeat rehash, src/index_lsh.cpp:654-659); skipped vertices are
    # covered by pad_to_k below
    from kgraph_framework_spark.operators.nnd_fused import (
        score_sym_topk,
        topk_per_src,
    )

    scored = None
    if bc is not None:
        # fast path: score in place + map-side per-src top-k riding the
        # bucket join's locality (no distinct shuffle of the pair set)
        pairs = bucket_pairs(buckets, max_bucket=4 * max_bucket, distinct=False)
        sym = score_sym_topk(pairs, bc, k)
    else:
        pairs = bucket_pairs(buckets, max_bucket=4 * max_bucket)
        scored = truncate_state(spark, _score_pairs(pairs, emb, bc))
        sym = scored.unionByName(
            scored.select(F.col("b").alias("a"), F.col("a").alias("b"), "dist")
        ).select(F.col("a").alias("src"), F.col("b").alias("dst"), "dist")

    # materialize the pre-pad pool: pad_to_k references it three times and
    # the descent's init-scoring pass once more — without this the whole
    # bucket-join DAG re-executes per reference (the 20k-vec bench spent
    # 177 s in lsh_init, ~5x the one-shot cost)
    pre = truncate_state(
        spark, topk_per_src(sym, k).withColumn("is_new", F.lit(True))
    )
    release_state(scored)
    pool = truncate_state(spark, pad_to_k(pre, emb, k, seed=seed + 7, bc=bc))
    release_state(pre)
    if return_buckets:
        return pool, buckets
    release_state(buckets)
    return pool


def graph_add(
    spark: SparkSession,
    graph: DataFrame,
    emb: DataFrame,
    new_emb: DataFrame,
    k: int = 10,
    return_delta: bool = False,
    **search_kw,
) -> DataFrame:
    """Insert a batch of new vectors into an existing kNN graph.

    Each new point greedy-searches the current graph for its top-k
    neighborhood; edges are added in BOTH directions and every affected
    vertex re-top-Ks its pool (the lock-based parallel_graph_insert
    becomes an associative groupBy re-aggregation — deterministic).
    Returns the merged graph (src, dst, dist) over emb ∪ new_emb.

    INCREMENTAL: only vertices touched by the insert re-top-K — the new
    ids plus the found endpoints receiving reverse edges (the reference
    locks and edits exactly those adjacency rows,
    /root/reference/src/index_graph.cpp:432-441 parallel_graph_insert).
    The untouched remainder of the graph passes through untouched, so
    per-batch shuffle volume scales with batch_size * k, not corpus
    size. Semantics identical to a full re-top-K: an untouched vertex's
    pool is already its top-k and re-ranking it is the identity.

    ``return_delta=True`` returns ONLY the re-top-K'd pools of the
    touched vertices (the full new pool per touched src) instead of the
    whole merged graph — the streaming maintainer appends these as a
    delta-log generation so the per-batch WRITE is O(touched * k) too.
    """
    queries = new_emb.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    found = greedy_search(spark, graph, emb, queries, k=k, **search_kw)
    fwd = found.select(
        F.col("query_id").alias("src"), F.col("vec_id").alias("dst"), "dist"
    )
    rev = fwd.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "dist"
    )
    # touched = inserted ids ∪ vertices gaining a reverse edge: a small
    # set (<= batch * (k+1)) -> broadcast semi/anti joins, no full shuffle
    touched = (
        fwd.select("src").unionByName(rev.select("src")).distinct()
    )
    affected = (
        graph.select("src", "dst", "dist")
        .join(F.broadcast(touched), "src", "left_semi")
        .unionByName(fwd)
        .unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.min("dist").alias("dist"))
    )
    w = Window.partitionBy("src").orderBy("dist", "dst")
    retopped = (
        affected.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("src", "dst", "dist")
    )
    if return_delta:
        return retopped
    untouched = graph.select("src", "dst", "dist").join(
        F.broadcast(touched), "src", "left_anti"
    )
    return untouched.unionByName(retopped)
