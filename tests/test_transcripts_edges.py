"""Transcript sources + edge derivations: determinism, invariants, parity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kgraph_framework_spark.operators.edges import (
    TURN_STRIDE,
    handoff_edges,
    reply_edges,
    tool_edges,
    union_graph,
)
from kgraph_framework_spark.sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    synthesize_transcripts,
    transcripts_from_events,
)


@pytest.fixture(scope="module")
def synth(spark):
    return synthesize_transcripts(spark, n_convs=80, seed=42).persist()


class TestSynthesizer:
    def test_schema(self, synth):
        assert [f.name for f in synth.schema.fields] == [
            "conv_id", "turn_idx", "role", "text", "tool", "ts",
        ]
        kinds = {f.name: f.dataType.simpleString() for f in synth.schema.fields}
        assert kinds["turn_idx"] == "int"
        assert kinds["ts"] == "timestamp"

    def test_deterministic(self, spark, synth):
        again = synthesize_transcripts(spark, n_convs=80, seed=42)
        assert synth.exceptAll(again).count() == 0
        assert again.exceptAll(synth).count() == 0

    def test_turn_idx_dense_per_conv(self, synth):
        agg = synth.groupBy("conv_id").agg(
            F.min("turn_idx").alias("mn"),
            F.max("turn_idx").alias("mx"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("turn_idx").alias("nd"),
        )
        bad = agg.where(
            (F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1) | (F.col("n") != F.col("nd"))
        )
        assert bad.count() == 0

    def test_text_equality_invariant_under_stable_ordering(self, spark, synth):
        """Per-turn text equality under stable (conv_id, turn_idx) ordering
        survives a round of transformations (input_hint invariant)."""
        shuffled = synth.repartition(16).sortWithinPartitions("tool")
        a = synth.orderBy("conv_id", "turn_idx").select("text").collect()
        b = shuffled.orderBy("conv_id", "turn_idx").select("text").collect()
        assert a == b

    def test_size_skew(self, synth):
        sizes = [r["n"] for r in synth.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()]
        assert min(sizes) >= 2 and max(sizes) > 50  # power-law-ish spread


class TestEventsParity:
    """The Spark derivation equals the DuckDB derivation row for row."""

    def test_transcripts_match_duckdb(self, spark, sf_tiny):
        t = transcripts_from_events(spark, sf_tiny)
        got = sorted(
            (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], str(r["ts"]))
            for r in t.collect()
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM '{sf_tiny}/events.parquet'"
        )
        exp = sorted(
            (r[0], r[1], r[2], r[3], r[4], str(r[5]))
            for r in con.sql(TRANSCRIPTS_FROM_EVENTS_SQL).fetchall()
        )
        assert got == exp


class TestEdges:
    def test_reply_edges_shuffle_free_and_correct(self, spark, synth):
        e = reply_edges(synth)
        # no Exchange in the physical plan: narrow scan+project+filter only
        plan = e._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        n_turns = synth.count()
        n_convs = synth.select("conv_id").distinct().count()
        assert e.count() == n_turns - n_convs
        # spot-check one conversation
        row = synth.orderBy("conv_id", "turn_idx").first()
        conv_num = int(row["conv_id"][4:])
        first = (
            e.where(F.col("dst_vertex") == conv_num * TURN_STRIDE + 1).collect()
        )
        assert len(first) == 1
        assert first[0]["src_vertex"] == conv_num * TURN_STRIDE

    def test_tool_edges_bipartite(self, synth):
        e = tool_edges(synth).persist()
        rows = e.collect()
        assert all(r["src_vertex"] < 0 and (-r["src_vertex"]) % 4 == 2 for r in rows)
        assert all(r["dst_vertex"] < 0 and (-r["dst_vertex"]) % 4 == 3 for r in rows)
        total_uses = synth.where(F.col("tool").isNotNull()).count()
        assert sum(r["weight"] for r in rows) == total_uses

    def test_handoff_edges(self, synth):
        rows = handoff_edges(synth).collect()
        assert all(r["src_vertex"] != r["dst_vertex"] for r in rows)
        assert all((-r["src_vertex"]) % 4 == 1 for r in rows)
        assert len(rows) > 0

    def test_union_graph_types(self, synth):
        g = union_graph(synth)
        kinds = {r["edge_type"] for r in g.select("edge_type").distinct().collect()}
        assert kinds == {"reply", "tool", "handoff"}
