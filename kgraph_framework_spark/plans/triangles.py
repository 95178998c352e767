"""Triangle counting via degree-oriented edge joins.

Each undirected edge is oriented from the (degree, id)-smaller endpoint to
the larger; a triangle {a,b,c} is then counted exactly once as the wedge
(a→b, b→c) closed by (a→c). Degree orientation bounds every vertex's
out-degree by O(sqrt(m)) — THE skew defense: a hub vertex with 10^8
neighbors never becomes the wedge pivot (cf. the reference's work-stealing
`schedule(dynamic,100)` for skewed per-vertex cost,
/root/reference/src/index_graph.cpp:22 — ours is structural, not
scheduled). Counts are orientation-invariant, so the id-oriented DuckDB
oracle agrees exactly.

The wedge join and closure join are plain equi-joins — Catalyst picks
sort-merge/broadcast and AQE splits skewed partitions at runtime. A
sorted-adjacency-intersection variant inside an Arrow UDF (HERO-style,
see PAPERS.md) is the planned optimization for dense graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame) -> DataFrame:
    """Distinct undirected edges oriented small-(degree,id) → large."""
    und = (
        edges.select(
            F.least("src_vertex", "dst_vertex").alias("u"),
            F.greatest("src_vertex", "dst_vertex").alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("x"))
        .unionByName(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("x").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("x").alias("v"), F.col("deg").alias("dv"))
    e = und.join(du, "u").join(dv, "v")
    keep_uv = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return e.select(
        F.when(keep_uv, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(keep_uv, F.col("v")).otherwise(F.col("u")).alias("b"),
    )


def _triangle_rows(edges: DataFrame) -> DataFrame:
    """One row (a, b, c) per triangle (in oriented order)."""
    o = _oriented(edges).persist()
    e1 = o.select(F.col("a").alias("ta"), F.col("b").alias("tb"))
    e2 = o.select(F.col("a").alias("tb"), F.col("b").alias("tc"))
    e3 = o.select(F.col("a").alias("ta"), F.col("b").alias("tc"))
    wedges = e1.join(e2, "tb")
    tris = wedges.join(e3, ["ta", "tc"])
    return tris.select(
        F.col("ta").alias("a"), F.col("tb").alias("b"), F.col("tc").alias("c")
    )


def count_triangles(edges: DataFrame) -> int:
    """Exact global triangle count of the undirected simple graph."""
    return _triangle_rows(edges).count()


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(vertex, triangles) — number of triangles each vertex belongs to.

    Vertices in no triangle are omitted (join with the vertex set and
    coalesce(0) if a dense output is needed).
    """
    t = _triangle_rows(edges)
    allv = (
        t.select(F.col("a").alias("vertex"))
        .unionByName(t.select(F.col("b").alias("vertex")))
        .unionByName(t.select(F.col("c").alias("vertex")))
    )
    return allv.groupBy("vertex").agg(F.count(F.lit(1)).alias("triangles"))
