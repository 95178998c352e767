"""Streaming ingestion equals batch derivation, including cross-batch
stateful handoff detection and restart resumability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgraph_framework_spark.operators.edges import union_graph
from kgraph_framework_spark.sources.transcripts import synthesize_transcripts
from kgraph_framework_spark.streaming.ingest import edges_view, ingest_edges


@pytest.fixture(scope="module")
def corpus(spark):
    return synthesize_transcripts(spark, n_convs=30, seed=42).persist()


def _write_split(corpus, tmp, split_turn: int):
    """Two parquet files splitting conversations MID-STREAM so handoff
    transitions straddle the micro-batch boundary."""
    inp = str(tmp / "in")
    corpus.where(F.col("turn_idx") < split_turn).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{inp}/part=a")
    corpus.where(F.col("turn_idx") >= split_turn).coalesce(1).write.mode(
        "append"
    ).parquet(f"{inp}/part=b")
    return inp


def _canon(df):
    return sorted(
        (r["src_vertex"], r["dst_vertex"], r["edge_type"], r["weight"])
        for r in df.collect()
    )


class TestStreamingIngest:
    def test_stream_equals_batch(self, spark, corpus, tmp_path):
        inp = _write_split(corpus, tmp_path, split_turn=5)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        ingest_edges(spark, inp, out, ckpt)
        got = _canon(edges_view(spark, out))
        exp = _canon(union_graph(corpus))
        assert got == exp

    def test_restart_is_idempotent(self, spark, corpus, tmp_path):
        inp = _write_split(corpus, tmp_path, split_turn=5)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        ingest_edges(spark, inp, out, ckpt)
        # re-run with the same checkpoint: no new batches -> no new rows
        before = _canon(edges_view(spark, out))
        ingest_edges(spark, inp, out, ckpt)
        after = _canon(edges_view(spark, out))
        assert before == after

    def test_new_files_are_incremental(self, spark, corpus, tmp_path):
        inp = str(tmp_path / "in")
        first = corpus.where(F.col("conv_id") < "conv000000000015")
        second = corpus.where(F.col("conv_id") >= "conv000000000015")
        first.coalesce(1).write.mode("overwrite").parquet(f"{inp}/part=a")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        ingest_edges(spark, inp, out, ckpt)
        second.coalesce(1).write.mode("append").parquet(f"{inp}/part=b")
        ingest_edges(spark, inp, out, ckpt)
        got = _canon(edges_view(spark, out))
        exp = _canon(union_graph(corpus))
        assert got == exp


class TestKnnMaintenance:
    """Streaming kNN-graph maintenance (GraphAdd as foreachBatch)."""

    def _split_embeddings(self, spark, tmp, n_parts=3):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        emb = emb.select("vec_id", "embedding")
        inp = str(tmp / "emb_in")
        for i in range(n_parts):
            emb.where(F.col("vec_id") % n_parts == i).coalesce(1).write.mode(
                "append"
            ).parquet(f"{inp}/part={i}")
        return inp, emb.persist()

    def test_maintained_graph_tracks_full_rebuild(self, spark, tmp_path):
        from kgraph_framework_spark.operators.knn_graph import (
            graph_recall,
            knn_bruteforce_l2,
        )
        from kgraph_framework_spark.streaming.knn_maintain import (
            maintain_knn_graph,
            read_graph,
        )

        inp, emb = self._split_embeddings(spark, tmp_path)
        work = str(tmp_path / "knn_work")
        maintain_knn_graph(
            spark, inp, work, str(tmp_path / "knn_ckpt"), k=10,
            refresh_every=3,
        )
        corpus = spark.read.parquet(f"{work}/corpus")
        assert corpus.count() == emb.count()
        graph = read_graph(spark, work)
        n = emb.count()
        degs = graph.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
        assert degs.count() == n
        assert degs.agg(F.max("c")).first()[0] <= 10
        truth = knn_bruteforce_l2(emb, k=10)
        rec = graph_recall(graph.select("src", "dst"), truth)
        # incremental insert + one refresh pass tracks the full build
        assert rec >= 0.8, f"maintained-graph recall {rec:.3f}"
        emb.unpersist()

    def test_restart_resumes_without_reinsert(self, spark, tmp_path):
        from kgraph_framework_spark.streaming.knn_maintain import (
            maintain_knn_graph,
        )

        inp, emb = self._split_embeddings(spark, tmp_path)
        work = str(tmp_path / "knn_work2")
        ckpt = str(tmp_path / "knn_ckpt2")
        maintain_knn_graph(spark, inp, work, ckpt, k=10)
        n1 = spark.read.parquet(f"{work}/corpus").count()
        # re-run with same checkpoint: no new files -> state unchanged
        maintain_knn_graph(spark, inp, work, ckpt, k=10)
        assert spark.read.parquet(f"{work}/corpus").count() == n1
        emb.unpersist()

    def test_delta_write_scales_with_batch_not_corpus(self, spark, tmp_path):
        """A micro-batch's delta holds only touched-vertex pools: its
        vertex count is bounded by batch * (k+1), independent of corpus
        size (the incremental parallel_graph_insert contract)."""
        from kgraph_framework_spark.streaming.knn_maintain import (
            apply_embedding_batch,
            read_graph,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding").persist()
        k = 10
        base = emb.where(F.col("vec_id") >= 5)
        batch = emb.where(F.col("vec_id") < 5)
        work = str(tmp_path / "knn_delta")
        apply_embedding_batch(spark, base, work, k=k, batch_id=0)
        apply_embedding_batch(spark, batch, work, k=k, batch_id=1)
        n_batch = batch.count()
        n_corpus = emb.count()
        delta = spark.read.parquet(f"{work}/graph/delta-00000001")
        touched = delta.select("src").distinct().count()
        assert touched <= n_batch * (k + 1), (
            f"{touched} touched vertices for a {n_batch}-row batch"
        )
        assert touched < n_corpus  # untouched corpus rows NOT rewritten
        # and the merged read view covers every vertex exactly-top-k
        g = read_graph(spark, work)
        assert g.select("src").distinct().count() == n_corpus
        assert g.groupBy("src").count().agg(F.max("count")).first()[0] <= k
        emb.unpersist()

    def test_size_triggered_compaction_bounds_delta_log(self, spark, tmp_path):
        """With refresh disabled, the delta log must still stay bounded:
        after 2x the compaction threshold of micro-batches there are at
        most `threshold` generations on disk and the folded graph is
        identical to the unbounded-log graph (r3 advice: read_graph's
        union grows with batch count otherwise)."""
        from kgraph_framework_spark.streaming.knn_maintain import (
            _list_deltas,
            apply_embedding_batch,
            read_graph,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding").persist()
        threshold = 3
        n_batches = 2 * threshold
        work_c = str(tmp_path / "knn_compact")
        work_u = str(tmp_path / "knn_unbounded")
        base = emb.where(F.col("vec_id") >= n_batches)
        for work, compact in ((work_c, threshold), (work_u, 0)):
            apply_embedding_batch(
                spark, base, work, k=10, batch_id=0, compact_after=compact
            )
            for i in range(n_batches):
                batch = emb.where(F.col("vec_id") == i)
                apply_embedding_batch(
                    spark, batch, work, k=10, batch_id=i + 1,
                    compact_after=compact,
                )
        assert len(_list_deltas(f"{work_u}/graph")) == n_batches
        assert len(_list_deltas(f"{work_c}/graph")) < threshold
        got = sorted(
            (r["src"], r["dst"], r["dist"])
            for r in read_graph(spark, work_c).collect()
        )
        want = sorted(
            (r["src"], r["dst"], r["dist"])
            for r in read_graph(spark, work_u).collect()
        )
        assert got == want  # compaction is a pure log fold
        emb.unpersist()

    def test_replayed_batch_is_skipped_by_ledger(self, spark, tmp_path):
        from kgraph_framework_spark.streaming.knn_maintain import (
            apply_embedding_batch,
            read_graph,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).select("vec_id", "embedding").persist()
        base = emb.where(F.col("vec_id") >= 5)
        batch = emb.where(F.col("vec_id") < 5)
        work = str(tmp_path / "knn_replay")
        apply_embedding_batch(spark, base, work, k=10, batch_id=0)
        apply_embedding_batch(spark, batch, work, k=10, batch_id=1)
        before = sorted(
            (r["src"], r["dst"]) for r in read_graph(spark, work).collect()
        )
        # foreachBatch replay of a committed batch: exact no-op
        apply_embedding_batch(spark, batch, work, k=10, batch_id=1)
        after = sorted(
            (r["src"], r["dst"]) for r in read_graph(spark, work).collect()
        )
        assert before == after
        emb.unpersist()
