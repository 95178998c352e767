"""Query registry — the engine's public query surface.

Each entry maps a name to (a) a Spark callable ``(spark, sf_dir) ->
DataFrame`` built from the engine's operators, and (b) an equivalent
DuckDB SQL oracle (``None`` for genuinely non-SQL-expressible ops, which
the verification driver checks rows-only). Column names are aliased
identically on both sides — the comparator sorts columns by name before
hashing.

The iterative graph queries run a FIXED superstep count so the SQL twin
can unroll the loop (see sql_oracle.py); the converged variants (driven by
a convergence action, not a round count) are exercised by the pytest
oracle suite instead (tests/test_algorithms.py vs numpy/union-find).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgraph_framework_spark import sql_oracle
from kgraph_framework_spark.operators.edges import (
    handoff_edges,
    reply_edges,
    tool_cousage_edges,
    tool_edges,
    union_graph,
)
from kgraph_framework_spark.plans.components import connected_components
from kgraph_framework_spark.plans.labelprop import label_propagation
from kgraph_framework_spark.plans.pagerank import pagerank
from kgraph_framework_spark.plans.triangles import triangles_per_vertex
from kgraph_framework_spark.session import tune_session
from kgraph_framework_spark.sources.transcripts import transcripts_from_events

PAGERANK_ITERS = 5
CC_ROUNDS = 4
LP_ROUNDS = 2

EDGE_COLS = ["src_vertex", "dst_vertex", "weight", "edge_type"]


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return transcripts_from_events(spark, sf_dir)


def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _transcripts(spark, sf_dir)
    return t.select(
        "conv_id", "turn_idx", "role", "text", "tool",
        # parquet ts is TIMESTAMP_NTZ; session tz is pinned to UTC, so the
        # cast is a wall-clock identity and epoch-micros match DuckDB's.
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )


def q_reply_edges(spark, sf_dir):
    return reply_edges(_transcripts(spark, sf_dir)).select(*EDGE_COLS)


def q_tool_edges(spark, sf_dir):
    return tool_edges(_transcripts(spark, sf_dir)).select(*EDGE_COLS)


def q_handoff_edges(spark, sf_dir):
    return handoff_edges(_transcripts(spark, sf_dir)).select(*EDGE_COLS)


def q_union_edges(spark, sf_dir):
    return union_graph(_transcripts(spark, sf_dir)).select(*EDGE_COLS)


def q_degrees(spark, sf_dir):
    e = union_graph(_transcripts(spark, sf_dir))
    verts = (
        e.select(F.col("src_vertex").alias("vertex"))
        .unionByName(e.select(F.col("dst_vertex").alias("vertex")))
        .distinct()
    )
    outd = e.groupBy(F.col("src_vertex").alias("vertex")).agg(
        F.count(F.lit(1)).alias("o_cnt"), F.sum("weight").alias("o_w")
    )
    ind = e.groupBy(F.col("dst_vertex").alias("vertex")).agg(
        F.count(F.lit(1)).alias("i_cnt"), F.sum("weight").alias("i_w")
    )
    return (
        verts.join(outd, "vertex", "left")
        .join(ind, "vertex", "left")
        .select(
            "vertex",
            F.coalesce(F.col("o_cnt"), F.lit(0)).cast("long").alias("out_deg"),
            F.coalesce(F.col("i_cnt"), F.lit(0)).cast("long").alias("in_deg"),
            F.coalesce(F.col("o_w"), F.lit(0.0)).cast("double").alias("out_w"),
            F.coalesce(F.col("i_w"), F.lit(0.0)).cast("double").alias("in_w"),
        )
    )


def q_pagerank(spark, sf_dir):
    edges = union_graph(_transcripts(spark, sf_dir))
    res = pagerank(spark, edges, num_iters=PAGERANK_ITERS)
    n = res.metrics[-1].detail["n_vertices"]
    return res.state.select(
        "vertex",
        F.floor(F.col("score") * F.lit(float(n)) * F.lit(1_000_000.0) + F.lit(0.5))
        .cast("long")
        .alias("score_ppm"),
    )


def q_components(spark, sf_dir):
    edges = union_graph(_transcripts(spark, sf_dir))
    res = connected_components(spark, edges, num_iters=CC_ROUNDS, symmetrize=True)
    return res.state.select("vertex", "label")


def q_labelprop(spark, sf_dir):
    edges = union_graph(_transcripts(spark, sf_dir))
    res = label_propagation(spark, edges, num_iters=LP_ROUNDS, symmetrize=True)
    return res.state.select("vertex", "label")


def q_tool_cousage(spark, sf_dir):
    return tool_cousage_edges(_transcripts(spark, sf_dir)).select(
        "src_vertex", "dst_vertex", "weight"
    )


def q_triangles(spark, sf_dir):
    e = tool_cousage_edges(_transcripts(spark, sf_dir))
    return triangles_per_vertex(e).select(
        "vertex", F.col("triangles").cast("long").alias("triangles")
    )


#: name -> (spark callable, duckdb oracle SQL or None)
REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {
    "transcripts": (q_transcripts, sql_oracle.transcripts_sql()),
    "reply_edges": (q_reply_edges, sql_oracle.edges_sql("reply_edges")),
    "tool_edges": (q_tool_edges, sql_oracle.edges_sql("tool_edges")),
    "handoff_edges": (q_handoff_edges, sql_oracle.edges_sql("handoff_edges")),
    "union_edges": (q_union_edges, sql_oracle.edges_sql("union_edges")),
    "degrees": (q_degrees, sql_oracle.degrees_sql()),
    "pagerank_5iter": (q_pagerank, sql_oracle.pagerank_sql(PAGERANK_ITERS)),
    "components_4round": (q_components, sql_oracle.cc_sql(CC_ROUNDS)),
    "labelprop_2round": (q_labelprop, sql_oracle.labelprop_sql(LP_ROUNDS)),
    "tool_cousage": (q_tool_cousage, sql_oracle.tool_cousage_sql()),
    "triangles_tools": (q_triangles, sql_oracle.triangles_sql()),
}
