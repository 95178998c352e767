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
