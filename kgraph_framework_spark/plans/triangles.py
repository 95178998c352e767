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

Two physical strategies, same exact counts:

* DEFAULT — sorted-adjacency intersection (HERO-style, PAPERS.md):
  oriented edges join their endpoints' sorted out-adjacency arrays once
  and an Arrow kernel intersects them; no wedge table is ever
  materialized (the wedge count is sum-of-squared-oriented-degrees —
  the dominant shuffle at dense/skewed graphs).
* wedge-join (``*_wedge`` variants) — plain equi-joins; kept for
  cross-checks and benchmarks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def _common_neighbors(edges_with_adj: DataFrame) -> DataFrame:
    """Arrow-batched sorted-array intersection per oriented edge.

    The HERO-style alternative to wedge materialization (SURVEY §2.11,
    PAPERS.md): instead of exploding every wedge (pivot row per
    2-path) and closing it with a second big join, each oriented edge
    (a,b) carries both endpoints' SORTED out-adjacency arrays and an
    Arrow kernel intersects them — every common neighbor c closes the
    triangle {a,b,c} exactly once (a→b, a→c, b→c by orientation
    transitivity). Shuffle volume: two adjacency joins; the wedge table
    (sum-of-squared-degrees rows) never exists.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def common(na, nb):
        """Batch-vectorized intersection: flatten BOTH ragged sides into
        (row, value, side) triples, one lexsort, and a value appearing
        under the same row from both sides is common. Per-row Python is
        gone — the batch costs one sort of total adjacency length, not
        an interpreter call per edge."""
        n = len(na)
        if n == 0:
            return pd.Series([], dtype=object)
        empty = np.empty(0, np.int64)
        xa = [np.asarray(x, np.int64) if x is not None else empty
              for x in na.to_numpy()]
        xb = [np.asarray(y, np.int64) if y is not None else empty
              for y in nb.to_numpy()]
        la = np.fromiter((x.size for x in xa), np.int64, n)
        lb = np.fromiter((y.size for y in xb), np.int64, n)
        vals = np.concatenate(xa + xb) if (la.sum() + lb.sum()) else empty
        rows = np.concatenate(
            [np.repeat(np.arange(n, dtype=np.int64), la),
             np.repeat(np.arange(n, dtype=np.int64), lb)]
        )
        o = np.lexsort((vals, rows))
        ro, vo = rows[o], vals[o]
        # each side is unique within itself, so a consecutive duplicate
        # of (row, value) means one hit from each side
        dup = (ro[1:] == ro[:-1]) & (vo[1:] == vo[:-1]) if ro.size else (
            np.zeros(0, bool)
        )
        hit_rows, hit_vals = ro[1:][dup], vo[1:][dup]
        counts = np.bincount(hit_rows, minlength=n)
        return pd.Series(np.split(hit_vals, np.cumsum(counts)[:-1]))

    return edges_with_adj.select(
        "a", "b", common(F.col("na"), F.col("nb")).alias("cs")
    )


def _edge_commons(edges: DataFrame) -> DataFrame:
    """(a, b, cs): every oriented edge with its common-neighbor list."""
    o = _oriented(edges)
    adj = o.groupBy(F.col("a").alias("v")).agg(
        F.sort_array(F.collect_list("b")).alias("nbrs")
    )
    with_adj = (
        o.join(adj.select(F.col("v").alias("a"), F.col("nbrs").alias("na")), "a")
        .join(
            adj.select(F.col("v").alias("b"), F.col("nbrs").alias("nb")),
            "b",
            "left",
        )
    )
    return _common_neighbors(with_adj)


def count_triangles(edges: DataFrame) -> int:
    """Exact global triangle count (sorted-adjacency intersection)."""
    row = (
        _edge_commons(edges)
        .agg(F.coalesce(F.sum(F.size("cs")), F.lit(0)).alias("t"))
        .first()
    )
    return int(row["t"])


def count_triangles_wedge(edges: DataFrame) -> int:
    """Exact count via the wedge-join path (kept for cross-checks/bench)."""
    return _triangle_rows(edges).count()


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(vertex, triangles) — number of triangles each vertex belongs to.

    Sorted-adjacency intersection path: per oriented edge (a,b) with
    common set C, credit |C| to a and b and 1 to every c ∈ C. Vertices
    in no triangle are omitted (join with the vertex set and coalesce(0)
    if a dense output is needed).
    """
    pe = _edge_commons(edges).where(F.size("cs") > 0)
    credits = (
        pe.select(F.col("a").alias("vertex"), F.size("cs").alias("t"))
        .unionByName(
            pe.select(F.col("b").alias("vertex"), F.size("cs").alias("t"))
        )
        .unionByName(
            pe.select(F.explode("cs").alias("vertex"), F.lit(1).alias("t"))
        )
    )
    return credits.groupBy("vertex").agg(
        F.sum("t").cast("long").alias("triangles")
    )


def triangles_per_vertex_wedge(edges: DataFrame) -> DataFrame:
    """Wedge-join formulation (kept for cross-checks and benching)."""
    t = _triangle_rows(edges)
    allv = (
        t.select(F.col("a").alias("vertex"))
        .unionByName(t.select(F.col("b").alias("vertex")))
        .unionByName(t.select(F.col("c").alias("vertex")))
    )
    return allv.groupBy("vertex").agg(F.count(F.lit(1)).alias("triangles"))
