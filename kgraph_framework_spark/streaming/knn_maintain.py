"""Streaming kNN-graph maintenance: micro-batch inserts + refresh.

Reference: GraphAdd (/root/reference/src/index_graph.cpp:443-480) — new
points greedy-search the locked graph for their neighborhoods, edges
insert symmetrically, and ONLY the touched adjacency rows are edited
(parallel_graph_insert :432-441). The reference runs it as a one-shot
batch append; here it becomes a Structured Streaming ``foreachBatch``
loop with a DELTA-LOG graph layout so both the shuffle AND the write per
micro-batch are O(touched * k), never O(corpus):

  work_dir/
    corpus/                 all ingested vectors (append-only parquet)
    graph/base/             generation-0 pools (full build / compaction)
    graph/delta-<gen>/      full new pools for vertices touched by one
                            batch — vertex-level LAST GENERATION WINS
    ledger/batch-<id>       atomic commit marker per micro-batch

Reading the graph unions base + deltas and keeps, per vertex, the rows
of the highest generation that contains it (an Iceberg table with
row-level replace would subsume base/delta/ledger — this is the
poor-man's equivalent on plain parquet). ``refresh_every`` batches, a
full NN-descent pass seeded from the maintained pools re-optimizes the
graph and COMPACTS the log back to a single base.

Exactly-once under streaming retries: the ledger marker is renamed into
place only after the delta dir and the corpus append are durable, and
every step before it is idempotent — the delta dir is replaced
atomically (write-then-rename), the corpus append dedupes against
already-present ids, and a replayed batch whose marker exists is
skipped outright. A crash between delta commit and corpus append
replays the batch: the re-run re-computes the delta from the current
corpus (ids are deduped off the CORPUS, the table committed closest to
the ledger, per round-2 advice) and overwrites the same delta dir.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMB_SCHEMA = "vec_id long, embedding array<float>"

#: fold the delta log into a new base once this many generations exist,
#: INDEPENDENT of the refresh cadence — in a long-lived stream with
#: refresh_every=0 the log (and read_graph's union + max(gen) shuffle)
#: would otherwise grow without bound with batch count. Pure log
#: compaction: the folded base is exactly read_graph's output, no
#: descent pass, so the graph is unchanged (tests/test_streaming.py).
COMPACT_AFTER_DELTAS = 8

_DELTA_RE = re.compile(r"^delta-(\d{8})$")


def _graph_dir(work_dir: str) -> str:
    return os.path.join(work_dir, "graph")


def _list_deltas(graph_dir: str) -> list[tuple[int, str]]:
    if not os.path.isdir(graph_dir):
        return []
    out = []
    for name in os.listdir(graph_dir):
        m = _DELTA_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(graph_dir, name)))
    return sorted(out)


def _atomic_dir(df: DataFrame, final_path: str) -> None:
    """Write df to <final>.tmp then rename into place (replace-if-exists)."""
    tmp = final_path + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    if os.path.exists(final_path):
        shutil.rmtree(final_path)
    os.rename(tmp, final_path)


def read_graph(spark: SparkSession, work_dir: str) -> DataFrame | None:
    """Current graph = base ∪ deltas, per-vertex last generation wins."""
    gdir = _graph_dir(work_dir)
    base = os.path.join(gdir, "base")
    if not os.path.exists(base):
        # recover a crash between the two compaction renames
        old = base + ".old"
        if os.path.exists(old):
            os.rename(old, base)
        else:
            return None
    df = spark.read.parquet(base).withColumn("gen", F.lit(0))
    for gen, path in _list_deltas(gdir):
        df = df.unionByName(
            spark.read.parquet(path).withColumn("gen", F.lit(gen))
        )
    wins = df.groupBy("src").agg(F.max("gen").alias("gen"))
    return df.join(wins, ["src", "gen"]).select("src", "dst", "dist")


def _commit_base(spark: SparkSession, graph: DataFrame, work_dir: str) -> None:
    """Swap in a new base and drop superseded deltas (compaction)."""
    gdir = _graph_dir(work_dir)
    base = os.path.join(gdir, "base")
    nxt = base + ".next"
    graph.write.mode("overwrite").parquet(nxt)
    deltas = _list_deltas(gdir)
    if os.path.exists(base):
        old = base + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(base, old)
        os.rename(nxt, base)
        shutil.rmtree(old)
    else:
        os.rename(nxt, base)
    for _, path in deltas:  # folded into the new base
        shutil.rmtree(path)


def _ledger_path(work_dir: str, batch_id: int) -> str:
    return os.path.join(work_dir, "ledger", f"batch-{batch_id:08d}")


def _ledger_commit(work_dir: str, batch_id: int) -> None:
    os.makedirs(os.path.join(work_dir, "ledger"), exist_ok=True)
    tmp = _ledger_path(work_dir, batch_id) + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("committed\n")
    os.rename(tmp, _ledger_path(work_dir, batch_id))


def apply_embedding_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    work_dir: str,
    k: int = 10,
    refresh: bool = False,
    batch_id: int | None = None,
    compact_after: int = COMPACT_AFTER_DELTAS,
    **add_kw,
) -> None:
    """Insert one batch of embeddings into the maintained graph state.

    First batch bootstraps with a full NN-descent build; later batches
    run the incremental graph_add and append ONLY the touched-vertex
    pools as a new delta generation; ``refresh`` runs a full NN-descent
    pass seeded from the maintained graph and compacts the delta log.
    Independent of the refresh cadence, once ``compact_after`` delta
    generations accumulate the log is folded into a new base (graph
    content unchanged) so read_graph stays bounded in a long stream.
    """
    from kgraph_framework_spark.operators.knn_graph import nn_descent
    from kgraph_framework_spark.operators.knn_search import graph_add

    if batch_id is not None and os.path.exists(_ledger_path(work_dir, batch_id)):
        return  # replayed batch, already fully committed

    new = batch_df.select("vec_id", "embedding")
    corpus_path = os.path.join(work_dir, "corpus")
    os.makedirs(_graph_dir(work_dir), exist_ok=True)

    if not os.path.exists(corpus_path):
        graph, _ = nn_descent(spark, new, k=k, max_iters=4)
        _commit_base(spark, graph, work_dir)
        _atomic_dir(new, corpus_path)
        if batch_id is not None:
            _ledger_commit(work_dir, batch_id)
        return

    corpus = spark.read.parquet(corpus_path)
    graph = read_graph(spark, work_dir)
    # idempotence of pre-ledger replays: drop already-ingested ids
    new = new.join(corpus.select("vec_id"), "vec_id", "left_anti")
    if new.limit(1).count() > 0:
        gen = (_list_deltas(_graph_dir(work_dir))[-1][0] + 1
               if _list_deltas(_graph_dir(work_dir)) else 1)
        if refresh:
            merged = graph_add(spark, graph, corpus, new, k=k, **add_kw)
            full = corpus.unionByName(new)
            init = merged.select(
                "src", "dst", "dist", F.lit(True).alias("is_new")
            )
            refreshed, _ = nn_descent(spark, full, k=k, max_iters=2, init=init)
            _commit_base(spark, refreshed, work_dir)
        else:
            delta = graph_add(
                spark, graph, corpus, new, k=k, return_delta=True, **add_kw
            )
            _atomic_dir(
                delta, os.path.join(_graph_dir(work_dir), f"delta-{gen:08d}")
            )
            if compact_after and len(
                _list_deltas(_graph_dir(work_dir))
            ) >= compact_after:
                _commit_base(spark, read_graph(spark, work_dir), work_dir)
        new.write.mode("append").parquet(corpus_path)
    if batch_id is not None:
        _ledger_commit(work_dir, batch_id)


def maintain_knn_graph(
    spark: SparkSession,
    input_dir: str,
    work_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    refresh_every: int = 0,
    compact_after: int = COMPACT_AFTER_DELTAS,
    await_termination: bool = True,
):
    """Streaming maintainer: embedding parquet dir -> live kNN graph.

    ``refresh_every`` > 0 runs the full-descent refresh + delta-log
    compaction on every Nth micro-batch; ``compact_after`` bounds the
    delta log regardless. ``availableNow`` drains the backlog then
    stops (drop the trigger for continuous ingestion).
    """
    stream = (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        refresh = bool(refresh_every) and (batch_id + 1) % refresh_every == 0
        apply_embedding_batch(
            spark, batch_df, work_dir, k=k, refresh=refresh,
            batch_id=batch_id, compact_after=compact_after,
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
