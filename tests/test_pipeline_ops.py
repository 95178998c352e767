"""Training-data pipeline operators: dedup family, similarity, multimodal.

The value-level parity with DuckDB is covered by the driver gate (and
tools/check_correctness.py); these tests cover the SEMANTIC properties the
SQL twin can't express: dedup recall of the synthesized duplicates, ANN
recall vs the exact oracle, stub behavior of the multimodal decode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_TINY = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_TINY}/documents.parquet").persist()


@pytest.fixture(scope="module")
def corpus(spark, docs):
    from kgraph_framework_spark.operators.dedup import dup_corpus

    return dup_corpus(docs).persist()


class TestDedup:
    def test_exact_finds_all_synthesized_copies(self, docs, corpus):
        from kgraph_framework_spark.operators.dedup import (
            EXACT_DUP_MOD,
            exact_duplicates,
        )

        expected = docs.where(
            (F.col("doc_id") % EXACT_DUP_MOD == 0)
        ).count()
        groups = exact_duplicates(corpus).collect()
        # every synthesized copy produces one duplicate group of size 2
        # keyed by the original text (originals are unique in the corpus)
        assert len(groups) == expected
        assert all(g["n_copies"] == 2 for g in groups)
        assert all(g["keep_id"] < 100_000 for g in groups)

    def test_jaccard_finds_near_dups_with_high_sim(self, corpus):
        from kgraph_framework_spark.operators.dedup import (
            NEAR_DUP_MOD,
            ngram_jaccard_pairs,
        )

        pairs = {
            (p["doc_a"], p["doc_b"]): p["jaccard_ppm"]
            for p in ngram_jaccard_pairs(corpus).collect()
        }
        # every mutated doc long enough to clear the threshold
        # (J = (g-8)/g >= 0.5 needs g >= 16 grams, i.e. >= 18 tokens)
        # must pair with its own original. The driver corpus also contains
        # GENUINE near-dups (e.g. docs 174~99 at sf0.001) which rightly
        # appear too, so containment, not equality.
        expected = {
            r["doc_id"]
            for r in corpus.where(
                (F.col("doc_id") % NEAR_DUP_MOD == 0)
                & (F.col("doc_id") < 100_000)
                & (F.array_size(F.split(F.col("text"), " ")) >= 18)
            ).collect()
        }
        assert expected, "fixture too small: no eligible near-dup originals"
        for a in expected:
            assert pairs[(a, a + 200_000)] >= 500_000

    def test_minhash_estimates_track_exact_jaccard(self, corpus):
        from kgraph_framework_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        exact = {
            (p["doc_a"], p["doc_b"]): p["jaccard_ppm"] / 1e6
            for p in ngram_jaccard_pairs(corpus, threshold=0.5).collect()
        }
        est = {
            (p["doc_a"], p["doc_b"]): p["est_ppm"] / 1e6
            for p in minhash_lsh_pairs(corpus, threshold=0.5).collect()
        }
        # LSH recall of true high-sim pairs (J >= 0.8 is ~always caught
        # by 8 bands of 4 at sig threshold 0.5)
        high = {k for k, v in exact.items() if v >= 0.8}
        found = high & set(est)
        assert len(found) >= 0.9 * len(high)
        # estimates within 0.25 of exact for found pairs
        for k in found:
            assert abs(est[k] - exact[k]) < 0.25

    def test_simhash_block_join_equals_bruteforce(self, spark, corpus):
        from kgraph_framework_spark.operators.dedup import (
            SIMHASH_MAX_HAMMING,
            simhash_pairs,
            simhash_signatures,
        )

        got = {
            (p["doc_a"], p["doc_b"]): p["hamming"]
            for p in simhash_pairs(corpus).collect()
        }
        sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(corpus).collect()}
        ids = sorted(sigs)
        exp = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                h = bin(sigs[a] ^ sigs[b]).count("1")
                if h <= SIMHASH_MAX_HAMMING:
                    exp[(a, b)] = h
        assert got == exp


class TestEmbeddingCosineDedup:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(f"{SF_TINY}/embeddings.parquet").persist()

    @pytest.fixture(scope="class")
    def ecorpus(self, emb):
        from kgraph_framework_spark.operators.dedup import embcos_corpus

        return embcos_corpus(emb).persist()

    def test_exact_finds_planted_pairs(self, emb, ecorpus):
        from kgraph_framework_spark.operators.dedup import (
            EMB_EXACT_MOD,
            EMB_NEAR_MOD,
            embedding_cosine_pairs,
        )

        got = {
            (p["vec_a"], p["vec_b"]): p["sim_ppm"]
            for p in embedding_cosine_pairs(ecorpus).collect()
        }
        ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
        # every exact copy pairs with its original at sim = 1.0
        for v in ids:
            if v % EMB_EXACT_MOD == 0:
                assert got.get((v, v + 100_000)) == 1_000_000, v
        # every perturbed copy pairs with its original above the threshold
        # (factors in [0.88, 1.12] keep cosine ~0.9976)
        for v in ids:
            if v % EMB_NEAR_MOD == 0:
                assert got.get((v, v + 200_000, ), 0) >= 950_000, v
        # background pairs (max natural cosine ~0.51) never appear
        assert all(a >= 100_000 or b >= 100_000 for a, b in got)

    def test_perturbation_uses_original_vec_id(self, emb, ecorpus):
        """Regression: lateral-column-alias resolution once bound the
        factor's vec_id to the +200000 alias — factors must derive from
        the ORIGINAL id (what the DuckDB twin computes)."""
        import numpy as np

        from kgraph_framework_spark.operators.dedup import EMB_NEAR_MOD

        orig = {
            r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.collect()
        }
        v = sorted(k for k in orig if k % EMB_NEAR_MOD == 0)[1]
        got = np.array(
            ecorpus.where(F.col("vec_id") == v + 200_000).collect()[0]["e"]
        )
        exp = orig[v] * np.array(
            [1.0 + ((v * 31 + i * 7) % 13 - 6) / 50.0 for i in range(len(orig[v]))]
        )
        assert np.array_equal(got, exp)

    def test_lsh_pairs_match_exact_on_planted_corpus(self, ecorpus):
        from kgraph_framework_spark.operators.dedup import (
            embedding_cosine_lsh_pairs,
            embedding_cosine_pairs,
        )

        exact = {
            (p["vec_a"], p["vec_b"]): p["sim_ppm"]
            for p in embedding_cosine_pairs(ecorpus).collect()
        }
        lsh = {
            (p["vec_a"], p["vec_b"]): p["sim_ppm"]
            for p in embedding_cosine_lsh_pairs(ecorpus).collect()
        }
        # candidates are a subset (banding prunes), survivors re-ranked
        # exactly -> identical sim values; planted pairs miss a band with
        # prob ~5e-7 so full recall is expected at this size
        assert set(lsh) <= set(exact)
        recall = len(lsh) / len(exact)
        assert recall >= 0.95, recall
        assert all(exact[p] == s for p, s in lsh.items())

    def test_exact_guard_raises_beyond_cap(self, ecorpus):
        from kgraph_framework_spark.operators.dedup import embedding_cosine_pairs

        with pytest.raises(ValueError, match="exact O"):
            embedding_cosine_pairs(ecorpus, max_vecs=10)


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(f"{SF_TINY}/embeddings.parquet").persist()

    def test_bruteforce_matches_numpy(self, emb):
        import numpy as np

        from kgraph_framework_spark.operators.similarity import (
            cosine_topk,
            queries_from_corpus,
        )

        rows = emb.collect()
        vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
        got = cosine_topk(emb, queries_from_corpus(emb, 4), k=3).collect()
        for q in range(4):
            sims = {
                v: float(vecs[q] @ vv / (np.linalg.norm(vecs[q]) * np.linalg.norm(vv)))
                for v, vv in vecs.items()
                if v != q
            }
            exp = sorted(sims, key=lambda v: (-sims[v], v))[:3]
            mine = [r["neighbor_id"] for r in sorted(
                (r for r in got if r["query_id"] == q), key=lambda r: r["rank"]
            )]
            assert mine == exp

    def test_ann_recall_floor(self, emb):
        from kgraph_framework_spark.operators.similarity import (
            ann_lsh_topk,
            cosine_topk,
            queries_from_corpus,
        )

        q = queries_from_corpus(emb, 8)
        exact = cosine_topk(emb, q, k=5).collect()
        approx = ann_lsh_topk(emb, q, k=5).collect()
        exact_sets = {}
        for r in exact:
            exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        approx_sets = {}
        for r in approx:
            approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(
            len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets
        )
        total = sum(len(s) for s in exact_sets.values())
        recall = hits / total
        # random hyperplanes probe (1+bits)/2^bits of the space — a
        # coverage-bound floor, deterministic given the fixed seed
        assert recall >= 0.35, f"LSH ANN recall {recall:.2f} below floor"

    def test_ivf_recall_floor(self, emb):
        from kgraph_framework_spark.operators.similarity import (
            cosine_topk,
            ivf_topk,
            queries_from_corpus,
        )

        q = queries_from_corpus(emb, 8)
        exact = cosine_topk(emb, q, k=5).collect()
        approx = ivf_topk(emb, q, k=5).collect()
        exact_sets: dict = {}
        for r in exact:
            exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        approx_sets: dict = {}
        for r in approx:
            approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(
            len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets
        )
        recall = hits / sum(len(s) for s in exact_sets.values())
        # centroids align with the label clusters -> much better than LSH
        assert recall >= 0.6, f"IVF ANN recall {recall:.2f} below floor"


class TestMultimodal:
    def test_features_match_python(self, spark, docs):
        import hashlib

        from kgraph_framework_spark.operators.multimodal import (
            binary_corpus,
            extract_features,
        )

        feats = {r["doc_id"]: r for r in extract_features(binary_corpus(docs)).collect()}
        for r in docs.select("doc_id", "text").limit(20).collect():
            payload = r["text"].encode("utf-8")
            f = feats[r["doc_id"]]
            assert f["n_bytes"] == len(payload)
            assert f["head_md5"] == hashlib.md5(
                payload[:16].hex().upper().encode()
            ).hexdigest()
            assert f["byte_sum_16"] == sum(payload[:16])
            assert f["decoder"] == "bytes-v1"

    def test_oracle_agrees_on_non_ascii(self, spark):
        """The DuckDB twin must be BYTE-based: multi-byte UTF-8 text broke
        the old substr(text,1,16)/ascii() character-based oracle."""
        import duckdb

        from kgraph_framework_spark.operators.multimodal import (
            binary_corpus,
            extract_features,
        )
        from kgraph_framework_spark.sql_oracle_docs import multimodal_features_sql

        texts = [
            (0, "héllo wörld — ünïcode test body"),
            (1, "日本語のテキストです。マルチバイト。"),
            (2, "plain ascii only here"),
            (3, "emoji 🚀🔥 mixed with ascii"),
        ]
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_bytes"], r["head_md5"], r["byte_sum_16"])
            for r in extract_features(binary_corpus(docs)).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, '{t}')" for i, t in texts)
            + ") AS t(doc_id, text)"
        )
        for doc_id, nb, hm, bs, _dec in con.execute(
            multimodal_features_sql()
        ).fetchall():
            assert got[doc_id] == (nb, hm, bs), doc_id

    def test_byte_features_total_over_media_types(self, spark):
        """The built-in decoder is TOTAL: non-text media types get byte
        features too (the opaque-binary contract — nothing raises)."""
        from kgraph_framework_spark.operators.multimodal import (
            byte_features,
            extract_features,
        )

        png = b"\x89PNG\r\n\x1a\n" + bytes(range(64))
        df = spark.createDataFrame(
            [(7, bytearray(png), "image/png", len(png))],
            "doc_id long, payload binary, media_type string, n_bytes long",
        )
        row = extract_features(df).collect()[0]
        want = byte_features(png)
        assert row["n_bytes"] == want["n_bytes"]
        assert row["head_md5"] == want["head_md5"]
        assert row["byte_sum_16"] == want["byte_sum_16"]
        assert row["decoder"] == "bytes-v1"

    def test_decode_media_extension_point(self, spark):
        """decode_media supplies the Arrow plumbing for a deployment's
        own codec: a fake 'decoder' (deterministic, codec-free) sees
        batch-shaped pandas input and its schema round-trips."""
        import pandas as pd

        from kgraph_framework_spark.operators.multimodal import (
            binary_corpus,
            decode_media,
        )

        docs = spark.createDataFrame(
            [(i, f"payload body {i}") for i in range(10)],
            "doc_id long, text string",
        )

        def fake_decoder(pdf: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [len(p) % 7 for p in pdf["payload"]],
                }
            )

        out = decode_media(
            binary_corpus(docs), fake_decoder, "doc_id long, width int"
        )
        got = {r["doc_id"]: r["width"] for r in out.collect()}
        assert got == {
            i: len(f"payload body {i}".encode()) % 7 for i in range(10)
        }


class TestSkyline:
    def test_hand_checkable_frontier(self, spark):
        from kgraph_framework_spark.operators.skyline import skyline

        pts = spark.createDataFrame(
            [(0, 10, 10), (1, 5, 20), (2, 20, 5), (3, 4, 4), (4, 10, 10)],
            "id long, x long, y long",
        )
        got = {r["id"] for r in
               skyline(pts, maximize=["x", "y"], minimize=[]).collect()}
        # (4,4) dominated by everything; duplicates (0)/(4) both survive
        assert got == {0, 1, 2, 4}

    def test_two_phase_equals_bruteforce(self, spark):
        import numpy as np

        from kgraph_framework_spark.operators.skyline import skyline

        rng = np.random.default_rng(5)
        rows = [(i, int(a), int(b)) for i, (a, b) in
                enumerate(rng.integers(0, 50, size=(300, 2)))]
        df = spark.createDataFrame(rows, "id long, x long, y long").repartition(7)
        got = {r["id"] for r in
               skyline(df, maximize=["x"], minimize=["y"]).collect()}
        exp = {
            i for i, x, y in rows
            if not any(
                (x2 >= x and y2 <= y and (x2 > x or y2 < y))
                for _, x2, y2 in rows
            )
        }
        assert got == exp
