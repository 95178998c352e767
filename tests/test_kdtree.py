"""KD-tree forest initializer (reference E2 lifecycle,
tests/kdtree_buildall_and_evaluate.cpp:53-121): BFS mean/variance splits,
leaf + routed cross-leaf candidate joins, pad-to-K, NN-descent refine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgraph_framework_spark.operators.kdtree import (
    build_kdtree_forest,
    kdtree_init,
)
from kgraph_framework_spark.operators.knn_graph import (
    graph_recall,
    knn_bruteforce_l2,
    nn_descent,
    random_init,
)

SF_TINY = "/root/testdata/sf0.001"
K = 10


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF_TINY}/embeddings.parquet")
        .select("vec_id", "embedding")
        .persist()
    )


@pytest.fixture(scope="module")
def truth(spark, emb):
    return knn_bruteforce_l2(emb, k=K).persist()


class TestForestBuild:
    def test_partition_invariants(self, spark, emb):
        """Every tree is a PARTITION of the corpus into bounded leaves."""
        n = emb.count()
        leaves, splits = build_kdtree_forest(
            spark, emb, n_trees=3, leaf_size=16
        )
        per_tree = leaves.groupBy("tree_id").agg(
            F.count(F.lit(1)).alias("c"),
            F.countDistinct("vec_id").alias("d"),
        )
        for r in per_tree.collect():
            assert r["c"] == n and r["d"] == n  # total, no dup, no drop
        big = (
            leaves.groupBy("tree_id", "node")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 16)
            .count()
        )
        assert big == 0
        assert len(splits) > 0

    def test_deterministic(self, spark, emb):
        a, sa = build_kdtree_forest(spark, emb, n_trees=2, leaf_size=16)
        b, sb = build_kdtree_forest(spark, emb, n_trees=2, leaf_size=16)
        assert sorted(tuple(sorted(d.items())) for d in sa) == sorted(
            tuple(sorted(d.items())) for d in sb
        )
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb

    def test_trees_differ(self, spark, emb):
        """Different tree seeds choose different split dims (the forest's
        value comes from decorrelated partitions)."""
        _, splits = build_kdtree_forest(spark, emb, n_trees=2, leaf_size=16)
        roots = {s["tree_id"]: (s["div_dim"], s["div_val"])
                 for s in splits if s["node"] == 1}
        assert len(roots) == 2
        assert roots[0] != roots[1]


class TestKdtreeInit:
    def test_full_coverage_k_candidates(self, spark, emb):
        init = kdtree_init(spark, emb, k=K)
        degs = init.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
        assert degs.count() == emb.count()
        assert degs.where(F.col("c") != K).count() == 0
        assert init.where(F.col("src") == F.col("dst")).count() == 0

    def test_init_beats_random(self, spark, emb, truth):
        r_kd = graph_recall(kdtree_init(spark, emb, k=K).select("src", "dst"),
                            truth)
        r_rand = graph_recall(random_init(emb, k=K).select("src", "dst"), truth)
        assert r_kd > r_rand + 0.2, (r_kd, r_rand)

    def test_lifecycle_recall_floor(self, spark, emb, truth):
        """The reference driver's evaluate step: kdtree init + NN-descent
        must exceed 0.95 recall (README reports >0.9 on SIFT1M)."""
        init = kdtree_init(spark, emb, k=K)
        graph, _ = nn_descent(spark, emb, k=K, max_iters=4, init=init)
        rec = graph_recall(graph.select("src", "dst"), truth)
        assert rec >= 0.95, f"kdtree+nndescent recall {rec:.3f}"
