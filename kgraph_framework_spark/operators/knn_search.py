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


def lsh_init(
    emb: DataFrame,
    k: int,
    bits: int | None = None,
    n_tables: int = 4,
    seed: int = 42,
    max_bucket: int = 200,
) -> DataFrame:
    """RP-LSH candidate init: within-bucket all-pairs, top-K per vertex.

    ``n_tables`` independent hyperplane sets (the reference's numTable,
    rplsh driver -t flag); buckets larger than ``max_bucket`` are skipped
    (degenerate buckets — the reference recurses instead, CLSH
    :616-697; skipping keeps the init O(N * max_bucket)).
    Output matches random_init's schema: (src, dst, dist, is_new).
    """
    from kgraph_framework_spark.operators.similarity import (
        _bucket_col,
        _hyperplanes,
        adaptive_bits,
    )

    n = emb.count()
    if bits is None:
        bits = adaptive_bits(n, target_bucket=64)
    e2 = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("ed"))
    buckets = None
    dim = len(emb.select("embedding").first()[0])
    for t in range(n_tables):
        planes = _hyperplanes(dim, bits, seed=seed + 1000 * t)
        b = e2.select(
            "vec_id",
            F.lit(t).alias("table_id"),
            _bucket_col(F.col("ed"), planes).alias("code"),
        )
        buckets = b if buckets is None else buckets.unionByName(b)
    sizes = buckets.groupBy("table_id", "code").agg(F.count(F.lit(1)).alias("bn"))
    ok = buckets.join(
        sizes.where(F.col("bn") <= max_bucket).select("table_id", "code"),
        ["table_id", "code"],
    )
    a = ok.select("table_id", "code", F.col("vec_id").alias("a"))
    b = ok.select("table_id", "code", F.col("vec_id").alias("b"))
    pairs = (
        a.join(b, ["table_id", "code"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    scored = _score_pairs(pairs, emb)
    sym = scored.unionByName(
        scored.select(F.col("b").alias("a"), F.col("a").alias("b"), "dist")
    ).select(F.col("a").alias("src"), F.col("b").alias("dst"), "dist")
    w = Window.partitionBy("src").orderBy("dist", "dst")
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("src", "dst", "dist", F.lit(True).alias("is_new"))
    )


def graph_add(
    spark: SparkSession,
    graph: DataFrame,
    emb: DataFrame,
    new_emb: DataFrame,
    k: int = 10,
    **search_kw,
) -> DataFrame:
    """Insert a batch of new vectors into an existing kNN graph.

    Each new point greedy-searches the current graph for its top-k
    neighborhood; edges are added in BOTH directions and every affected
    vertex re-top-Ks its pool (the lock-based parallel_graph_insert
    becomes an associative groupBy re-aggregation — deterministic).
    Returns the merged graph (src, dst, dist) over emb ∪ new_emb.
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
    merged = (
        graph.select("src", "dst", "dist")
        .unionByName(fwd)
        .unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.min("dist").alias("dist"))
    )
    w = Window.partitionBy("src").orderBy("dist", "dst")
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("src", "dst", "dist")
    )
