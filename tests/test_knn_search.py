"""Greedy search, LSH init, and incremental insert over the kNN graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgraph_framework_spark.operators.knn_graph import (
    graph_recall,
    knn_bruteforce_l2,
    nn_descent,
)
from kgraph_framework_spark.operators.knn_search import (
    graph_add,
    greedy_search,
    lsh_init,
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


@pytest.fixture(scope="module")
def built(spark, emb):
    graph, _ = nn_descent(spark, emb, k=K, max_iters=5)
    return graph.persist()


class TestGreedySearch:
    def test_recall_vs_bruteforce(self, spark, emb, built, truth):
        queries = emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
        found = greedy_search(spark, built, emb, queries, k=K)
        # truth for these queries INCLUDING self (query vector is in the
        # corpus, so its own id is its nearest neighbor at distance 0)
        t = truth.where(F.col("src") < 8).select(
            F.col("src").alias("query_id"), F.col("dst").alias("vec_id")
        )
        hits = found.join(t, ["query_id", "vec_id"], "left_semi").count()
        recall = hits / t.count()
        assert recall >= 0.8, f"greedy search recall {recall:.2f}"

    def test_output_shape(self, spark, emb, built):
        queries = emb.where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
        )
        out = greedy_search(spark, built, emb, queries, k=5).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append((r["rank"], r["dist"]))
        for qid, rows in by_q.items():
            rows.sort()
            assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
            dists = [r[1] for r in rows]
            assert dists == sorted(dists)
            # the query vector itself is rank 1 at distance 0
            assert rows[0][1] == pytest.approx(0.0, abs=1e-12)


class TestLshInit:
    def test_feeds_nndescent_and_beats_random_at_init(self, spark, emb, truth):
        init = lsh_init(emb, k=K)
        init_recall = graph_recall(init.select("src", "dst"), truth)
        # LSH buckets put genuinely-close vectors together: much better
        # starting recall than random (~K/N ≈ 0.02)
        assert init_recall >= 0.2, f"lsh init recall {init_recall:.2f}"
        graph, _ = nn_descent(spark, emb, k=K, max_iters=3, init=init)
        final = graph_recall(graph.select("src", "dst"), truth)
        assert final >= 0.85, f"lsh+nndescent recall {final:.2f}"

    def test_degree_bound(self, spark, emb):
        init = lsh_init(emb, k=K)
        assert init.groupBy("src").count().where(F.col("count") > K).count() == 0

    def test_full_coverage_padded_to_k(self, spark, emb):
        """CLSH split + random pad: EVERY vertex exits init with exactly
        k candidates (the old skip-big-buckets path silently dropped
        oversized-bucket vertices; underfull pools relied on luck)."""
        init = lsh_init(emb, k=K)
        n = emb.count()
        degs = init.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
        assert degs.count() == n
        assert degs.where(F.col("c") != K).count() == 0

    def test_clsh_splits_oversized_buckets(self, spark, emb):
        from kgraph_framework_spark.operators.knn_search import clsh_buckets

        cap = 20
        buckets = clsh_buckets(emb, bits=2, n_tables=2, seed=7, max_bucket=cap)
        # every vector keeps one bucket per table
        n = emb.count()
        per_table = buckets.groupBy("table_id").agg(F.count(F.lit(1)).alias("c"))
        assert all(r["c"] == n for r in per_table.collect())
        # bucket sizes respect the cap (up to degenerate identical codes)
        sizes = buckets.groupBy("table_id", "bucket").agg(
            F.count(F.lit(1)).alias("bn")
        )
        over = sizes.where(F.col("bn") > cap).count()
        assert over == 0, f"{over} buckets above cap"

    def test_bucket_exclusion_same_quality(self, spark, emb, truth):
        """Skipping init-compared pairs in refinement (inSameBucket)
        must not hurt recall — those distances are already in the pool."""
        from kgraph_framework_spark.operators.knn_search import bucket_pairs

        pool, buckets = lsh_init(emb, k=K, return_buckets=True)
        excl = bucket_pairs(buckets)
        g, _ = nn_descent(
            spark, emb, k=K, max_iters=3, init=pool, exclude_pairs=excl
        )
        rec = graph_recall(g.select("src", "dst"), truth)
        assert rec >= 0.85, f"recall with exclusion {rec:.2f}"


class TestGraphAdd:
    def test_incremental_matches_full_rebuild_quality(self, spark, emb):
        base = emb.where(F.col("vec_id") >= 20)
        newly = emb.where(F.col("vec_id") < 20)
        g0, _ = nn_descent(spark, base, k=K, max_iters=5)
        merged = graph_add(spark, g0, base, newly, k=K)
        truth_all = knn_bruteforce_l2(emb, k=K)
        # inserted vertices get sane neighborhoods: their top-K overlaps
        # the true top-K (greedy search is approximate => floor not 1.0)
        t_new = truth_all.where(F.col("src") < 20)
        hits = merged.join(t_new, ["src", "dst"], "left_semi").count()
        recall = hits / t_new.count()
        assert recall >= 0.5, f"insert recall {recall:.2f}"
        # graph invariants hold after merge
        assert merged.where(F.col("src") == F.col("dst")).count() == 0
        assert merged.groupBy("src").count().where(F.col("count") > K).count() == 0
