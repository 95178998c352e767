"""Physical-plan assertions: the optimizations SURVEY.md promises are
actually in the executed plans (pushdown/pruning/broadcast/no-exchange).

These guard the SCALE properties: a regression that, say, reads all
document columns for token_stats or re-shuffles the reply derivation
would still pass the value-correctness gates but be wrong at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_TINY = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestScanPruning:
    def test_token_stats_prunes_to_two_columns(self, spark):
        from kgraph_framework_spark.operators.textstats import token_stats

        # another test may have persisted this parquet in full — Spark
        # would then (correctly) substitute the cached relation and no
        # scan pruning could apply; clear to observe the cold plan
        spark.catalog.clearCache()
        docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
        plan = plan_of(token_stats(docs))
        # parquet scan must read only doc_id + text (not lang/source/n_chars)
        assert "ReadSchema" in plan
        read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
        assert "doc_id" in read_schema and "text" in read_schema
        assert "lang" not in read_schema and "source" not in read_schema

    def test_filter_pushdown_on_embeddings(self, spark):
        emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
        plan = plan_of(emb.where(F.col("vec_id") < 8).select("vec_id"))
        assert "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,8)]" in plan


class TestShuffleShape:
    def test_reply_edges_no_exchange(self, spark):
        from kgraph_framework_spark.operators.edges import reply_edges
        from kgraph_framework_spark.sources.transcripts import (
            synthesize_transcripts,
        )

        t = synthesize_transcripts(spark, n_convs=10)
        assert "Exchange" not in plan_of(reply_edges(t))

    def test_tool_edges_single_aggregation_no_join(self, spark):
        from kgraph_framework_spark.operators.edges import tool_edges
        from kgraph_framework_spark.sources.transcripts import (
            synthesize_transcripts,
        )

        t = synthesize_transcripts(spark, n_convs=10)
        plan = plan_of(tool_edges(t))
        # hash ids removed the dictionary join entirely
        assert "Join" not in plan
        assert plan.count("Exchange") == 1  # the one groupBy shuffle

    def test_whole_stage_codegen_covers_edge_derivation(self, spark):
        from kgraph_framework_spark.operators.edges import tool_edges
        from kgraph_framework_spark.sources.transcripts import (
            synthesize_transcripts,
        )

        t = synthesize_transcripts(spark, n_convs=10)
        df = tool_edges(t)
        df.collect()  # AQE reveals codegen spans only in the final plan
        # "*(n)" prefixes mark WholeStageCodegen stages in the tree string
        assert "*(1)" in plan_of(df)


class TestBroadcasts:
    def test_cosine_topk_broadcasts_queries(self, spark):
        from kgraph_framework_spark.operators.similarity import (
            cosine_topk,
            queries_from_corpus,
        )

        emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
        plan = plan_of(cosine_topk(emb, queries_from_corpus(emb, 4), k=3))
        assert "Broadcast" in plan


class TestLshPlanShape:
    def test_code_plan_flat_in_bits(self, spark):
        """LSH codes are ONE vectorized-UDF node: plan size must not grow
        with the code length (the expression-tree form was O(bits×dim)
        literal nodes — a Catalyst compile blowup at realistic dims)."""
        from kgraph_framework_spark.operators.similarity import (
            ann_lsh_topk,
            queries_from_corpus,
        )

        emb = spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
        q = queries_from_corpus(emb, 4)
        small = plan_of(ann_lsh_topk(emb, q, k=3, bits=4, multiprobe=False))
        big = plan_of(ann_lsh_topk(emb, q, k=3, bits=24, multiprobe=False))
        assert len(big) < 1.3 * len(small), (len(small), len(big))
        # and the code column is computed by an Arrow-batched UDF
        assert "ArrowEvalPython" in big
