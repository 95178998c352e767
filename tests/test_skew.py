"""Hub/skew handling: broadcast-frontier PageRank equals the plain path
on a power-law fixture, and the physical plan shows the broadcast."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgraph_framework_spark.plans.pagerank import pagerank


def _powerlaw_edges(spark, n_spokes: int = 400):
    """A hub (vertex 0) pointing at every spoke + a sparse ring among
    spokes + back-edges so the hub has both huge out- and in-degree."""
    spokes = spark.range(1, n_spokes + 1).select(F.col("id").alias("v"))
    hub_out = spokes.select(
        F.lit(0).alias("src_vertex"),
        F.col("v").alias("dst_vertex"),
        F.lit(1.0).alias("weight"),
    )
    back = spokes.where(F.col("v") % 3 == 0).select(
        F.col("v").alias("src_vertex"),
        F.lit(0).alias("dst_vertex"),
        F.lit(2.0).alias("weight"),
    )
    ring = spokes.select(
        F.col("v").alias("src_vertex"),
        (F.col("v") % n_spokes + 1).alias("dst_vertex"),
        F.lit(1.0).alias("weight"),
    )
    return hub_out.unionByName(back).unionByName(ring)


class TestHubHandling:
    def test_broadcast_path_matches_plain(self, spark):
        e = _powerlaw_edges(spark)
        plain = pagerank(spark, e, num_iters=6)
        hubbed = pagerank(spark, e, num_iters=6, hub_threshold=50)
        a = {r["vertex"]: r["score"] for r in plain.state.collect()}
        b = {r["vertex"]: r["score"] for r in hubbed.state.collect()}
        assert set(a) == set(b)
        for v in a:
            assert a[v] == pytest.approx(b[v], abs=1e-12)

    def test_no_hubs_below_threshold(self, spark):
        e = _powerlaw_edges(spark)
        # threshold above max degree -> hub slice empty, still correct
        res = pagerank(spark, e, num_iters=3, hub_threshold=10_000)
        assert res.state.count() == 401

    def test_converged_with_hubs(self, spark):
        e = _powerlaw_edges(spark)
        res = pagerank(spark, e, tol=1e-8, max_iters=100, hub_threshold=50)
        assert res.converged
        got = {r["vertex"]: r["score"] for r in res.state.collect()}
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
        # the hub out-scores every spoke
        assert got[0] == max(got.values())
