"""Streaming kNN-graph maintenance: micro-batch inserts + refresh.

Reference: GraphAdd (/root/reference/src/index_graph.cpp:443-480) — new
points greedy-search the locked graph for their neighborhoods and edges
insert symmetrically. The reference runs it as a one-shot batch append;
here it becomes a Structured Streaming ``foreachBatch`` loop: every
micro-batch of new embeddings is inserted via :func:`knn_search.graph_add`
(seeded greedy search over the CURRENT graph, symmetric top-K
re-aggregation), the corpus and graph tables advance atomically
(write-new-then-swap), and an optional periodic full NN-descent refresh
re-optimizes the whole graph from the maintained pools (the reference's
split build-then-refine lifecycle, README.md:54-58).

Streaming checkpointing makes ingestion resumable: a killed maintainer
restarts from the last committed micro-batch without re-inserting.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMB_SCHEMA = "vec_id long, embedding array<float>"


def _swap_in(df: DataFrame, final_path: str) -> None:
    """Materialize ``df`` beside ``final_path`` then atomically swap.

    The new state may derive FROM the parquet at final_path, so writing
    in place would read-overwrite-corrupt; write-new-then-rename is the
    poor man's snapshot commit (an Iceberg table would replace this).
    """
    tmp = final_path + ".next"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(final_path):
        shutil.rmtree(final_path)
    os.rename(tmp, final_path)


def apply_embedding_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    work_dir: str,
    k: int = 10,
    refresh: bool = False,
    **add_kw,
) -> None:
    """Insert one batch of embeddings into the maintained graph state.

    work_dir holds two parquet tables: ``corpus`` (all ingested vectors)
    and ``graph`` (src, dst, dist). First batch bootstraps with a full
    NN-descent build; later batches run graph_add; ``refresh`` runs a
    full NN-descent pass seeded from the maintained graph (pools stay
    warm — few rounds to converge).
    """
    from kgraph_framework_spark.operators.knn_graph import nn_descent
    from kgraph_framework_spark.operators.knn_search import graph_add

    new = batch_df.select("vec_id", "embedding")
    corpus_path = os.path.join(work_dir, "corpus")
    graph_path = os.path.join(work_dir, "graph")
    os.makedirs(work_dir, exist_ok=True)

    if not os.path.exists(corpus_path):
        graph, _ = nn_descent(spark, new, k=k, max_iters=4)
        _swap_in(graph, graph_path)
        new.write.mode("overwrite").parquet(corpus_path)
        return

    corpus = spark.read.parquet(corpus_path)
    graph = spark.read.parquet(graph_path)
    # idempotence under streaming retries: drop already-ingested ids
    new = new.join(
        corpus.select("vec_id"), "vec_id", "left_anti"
    )
    if new.limit(1).count() == 0:
        return
    merged = graph_add(spark, graph, corpus, new, k=k, **add_kw)
    full = corpus.unionByName(new)
    if refresh:
        init = merged.select(
            "src", "dst", "dist", F.lit(True).alias("is_new")
        )
        merged, _ = nn_descent(spark, full, k=k, max_iters=2, init=init)
    _swap_in(merged, graph_path)
    new.write.mode("append").parquet(corpus_path)


def maintain_knn_graph(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    refresh_every: int = 0,
    await_termination: bool = True,
):
    """Streaming maintainer: embedding parquet dir -> live kNN graph.

    ``refresh_every`` > 0 runs the full-descent refresh on every Nth
    micro-batch. ``availableNow`` drains the backlog then stops (drop
    the trigger for continuous ingestion).
    """
    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        refresh = bool(refresh_every) and (batch_id + 1) % refresh_every == 0
        apply_embedding_batch(
            spark, batch_df, work_dir, k=k, refresh=refresh
        )

    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
