"""Fused NN-descent kernels: SQL/numpy lockstep + parity with join path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kgraph_framework_spark.operators.knn_graph import (
    _hash_order,
    graph_recall,
    knn_bruteforce_l2,
    nn_descent,
)
from kgraph_framework_spark.operators.nnd_fused import (
    _blk_np,
    _hash_np,
    blk_col,
    topk_per_src,
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


class TestHashLockstep:
    def test_numpy_matches_sql(self, spark):
        """_hash_np / _blk_np MUST agree with the SQL twins: the merge
        cogroup aligns pool blocks (SQL-assigned) with candidate blocks
        (numpy-assigned) by value."""
        ids = np.array([0, 1, 7, 12345, 999_999_937, (1 << 40) + 3], np.int64)
        df = spark.createDataFrame([(int(i),) for i in ids], "v long")
        got = df.select(
            _hash_order(F.col("v")).alias("h"),
            blk_col(F.col("v"), 32).alias("b"),
            "v",
        ).collect()
        by_v = {r["v"]: (r["h"], r["b"]) for r in got}
        h_np = _hash_np(ids)
        b_np = _blk_np(ids, 32)
        for i, v in enumerate(ids):
            assert by_v[int(v)] == (int(h_np[i]), int(b_np[i]))


class TestTopkPerSrc:
    def test_matches_window(self, spark):
        rows = [
            (int(s), int(d), float(((s * 7 + d * 13) % 29)))
            for s in range(40)
            for d in range(25)
            if s != d
        ]
        df = spark.createDataFrame(rows, "src long, dst long, dist double")
        w = Window.partitionBy("src").orderBy("dist", "dst")
        want = (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 5)
            .select("src", "dst", "dist")
            .orderBy("src", "dst")
            .collect()
        )
        got = topk_per_src(df, 5).orderBy("src", "dst").collect()
        assert got == want

    def test_dedupes_min_dist(self, spark):
        df = spark.createDataFrame(
            [(1, 2, 5.0), (1, 2, 3.0), (1, 3, 4.0)],
            "src long, dst long, dist double",
        )
        got = {(r["src"], r["dst"]): r["dist"]
               for r in topk_per_src(df, 5).collect()}
        assert got == {(1, 2): 3.0, (1, 3): 4.0}


class TestFusedVsJoin:
    def test_both_paths_reach_floor_and_converge(self, spark, emb):
        truth = knn_bruteforce_l2(emb, k=K).persist()
        gf, mf = nn_descent(spark, emb, k=K, max_iters=6)
        gj, mj = nn_descent(spark, emb, k=K, max_iters=6, mode="join")
        rf = graph_recall(gf.select("src", "dst"), truth)
        rj = graph_recall(gj.select("src", "dst"), truth)
        assert rf >= 0.9, f"fused recall {rf:.3f}"
        assert rj >= 0.9, f"join recall {rj:.3f}"
        # both converge (update rate decays)
        assert mf[-1]["update_rate"] < mf[0]["update_rate"]
        assert mj[-1]["update_rate"] < mj[0]["update_rate"]
        truth.unpersist()

    def test_fused_deterministic(self, spark, emb):
        a = nn_descent(spark, emb, k=K, max_iters=3)[0].orderBy(
            "src", "dst"
        ).collect()
        b = nn_descent(spark, emb, k=K, max_iters=3)[0].orderBy(
            "src", "dst"
        ).collect()
        assert a == b

    def test_fused_output_invariants(self, spark, emb):
        g, _ = nn_descent(spark, emb, k=K, max_iters=2)
        assert g.where(F.col("src") == F.col("dst")).count() == 0
        assert (
            g.groupBy("src").count().where(F.col("count") > K).count() == 0
        )
        # every vertex has a pool
        assert g.select("src").distinct().count() == emb.count()
