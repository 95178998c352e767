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


class TestRevPushGate:
    """Reverse-push gate (src/index_graph.cpp:90-103): a reverse sample
    is admitted only when its edge distance exceeds the receiver's
    round-start pool worst; unsaturated receivers (no finite tau) admit
    everything; forward rows are never touched."""

    def test_pool_tau_np_unit(self):
        from kgraph_framework_spark.operators.nnd_fused import _pool_tau_np

        src = np.array([1, 2, 1, 1, 2], np.int64)
        dist = np.array([9.0, 5.0, 1.0, 4.0, 2.0])
        ids, tau = _pool_tau_np(src, dist, 3)
        assert ids.tolist() == [1] and tau.tolist() == [9.0]
        ids2, tau2 = _pool_tau_np(src, dist, 2)
        assert ids2.tolist() == [1, 2] and tau2.tolist() == [9.0, 5.0]
        ids0, _ = _pool_tau_np(np.empty(0, np.int64), np.empty(0), 1)
        assert ids0.size == 0

    def test_split_tau_and_gate_unit(self):
        from kgraph_framework_spark.operators.nnd_fused import (
            TAU_NBR,
            _split_tau_and_gate,
        )

        # sentinel: vertex 5 has tau = 2.0; vertex 7 unsaturated (no row)
        key = np.array([5, 5, 5, 5, 7, 5], np.int64)
        nbr = np.array([9, 8, 7, 6, 5, TAU_NBR], np.int64)
        new = np.array([1, 1, 0, 1, 1, 0], bool)
        fwd = np.array([1, 0, 0, 0, 0, 0], bool)
        dist = np.array([1.0, 1.5, 2.5, 2.0, 0.1, 2.0])
        k2, n2, new2, f2 = _split_tau_and_gate(key, nbr, new, fwd, dist)
        got = set(zip(k2.tolist(), n2.tolist()))
        # fwd (5,9) kept; rev (5,8) d=1.5<=tau dropped; rev (5,7)
        # d=2.5>tau kept; rev (5,6) d=2.0==tau dropped (strict >);
        # rev (7,5) no tau -> kept; sentinel row removed
        assert got == {(5, 9), (5, 7), (7, 5)}
        assert TAU_NBR not in n2.tolist()

    def test_no_sentinels_identity(self):
        from kgraph_framework_spark.operators.nnd_fused import (
            _split_tau_and_gate,
        )

        key = np.array([1, 2], np.int64)
        nbr = np.array([2, 1], np.int64)
        new = np.array([1, 0], bool)
        fwd = np.array([0, 0], bool)
        dist = np.array([0.5, 0.5])
        k2, n2, new2, f2 = _split_tau_and_gate(key, nbr, new, fwd, dist)
        assert k2.tolist() == [1, 2] and n2.tolist() == [2, 1]

    def test_gate_on_paths_bit_identical(self, spark, emb):
        """The GATED loops must stay bit-identical across fused and
        blocked (the ungated default pair is covered by
        TestBlockedVsFused.test_bit_identical_graph)."""
        gf, mf = nn_descent(
            spark, emb, k=K, max_iters=2, rev_push_gate=True
        )
        gb, mb = nn_descent(
            spark, emb, k=K, max_iters=2, mode="blocked",
            rev_push_gate=True,
        )
        assert gf.orderBy("src", "dst").collect() == gb.orderBy(
            "src", "dst"
        ).collect()
        assert [m["new_entries"] for m in mf] == [
            m["new_entries"] for m in mb
        ]

    def test_precut_exact_vs_receiver_reservoir(self):
        """The sender-side reverse pre-cut (map-side combine of the
        receiver's top-S-by-hash reservoir) must leave the canonical
        pair output EXACTLY unchanged — global top-S is a subset of the
        union of per-sender-block top-S — while actually dropping rows
        for pool in-degree hubs."""
        from kgraph_framework_spark.operators.nnd_fused import (
            _canonical_pairs,
            _sample_np,
        )

        rng = np.random.default_rng(7)
        s, seed = 3, 1234
        # two sender blocks; every vertex's closest pool entry is hub
        # 999, so the hub draws 20 reverse rows per block (>> s)
        def block(lo_id):
            src = np.repeat(
                np.arange(lo_id, lo_id + 20, dtype=np.int64), 5
            )
            dst = rng.integers(100, 200, size=src.size).astype(np.int64)
            dist = rng.random(src.size) + 0.1
            new = rng.random(src.size) < 0.5
            dst[::5] = 999
            dist[::5] = 0.0
            return src, dst, new, dist

        blocks = [block(0), block(1000)]
        outs = {}
        for rev_seed in (None, seed):
            parts = [
                _sample_np(*b, s, rev_seed=rev_seed) for b in blocks
            ]
            outs[rev_seed] = tuple(
                np.concatenate([p[i] for p in parts]) for i in range(5)
            )
        # the pre-cut must bite on the hub's reverse fan-in
        assert outs[seed][0].size < outs[None][0].size
        # forward rows untouched
        for i in range(5):
            assert np.array_equal(
                outs[seed][i][outs[seed][3].astype(bool)],
                outs[None][i][outs[None][3].astype(bool)],
            )
        # receiver-side reservoir -> identical canonical pairs
        pairs = {
            rs: _canonical_pairs(o[0], o[1], o[2], o[3], s, seed, None)
            for rs, o in outs.items()
        }
        assert pairs[None][0].tolist() == pairs[seed][0].tolist()
        assert pairs[None][1].tolist() == pairs[seed][1].tolist()
        assert pairs[None][0].size > 0

    def test_gate_reaches_floor_and_shrinks_updates(self, spark, emb):
        """Gated descent holds the recall floor; once pools saturate the
        gate admits strictly fewer reverse arrivals, so the per-round
        fresh-insert counts must not EXCEED the ungated loop's."""
        truth = knn_bruteforce_l2(emb, k=K).persist()
        g_on, m_on = nn_descent(
            spark, emb, k=K, max_iters=6, rev_push_gate=True
        )
        g_off, m_off = nn_descent(
            spark, emb, k=K, max_iters=6, rev_push_gate=False
        )
        r_on = graph_recall(g_on.select("src", "dst"), truth)
        r_off = graph_recall(g_off.select("src", "dst"), truth)
        truth.unpersist()
        assert r_on >= 0.9, f"gated recall {r_on:.3f}"
        assert r_off >= 0.9, f"ungated recall {r_off:.3f}"
