"""Embedding similarity search: brute-force cosine top-k + LSH-bucketed ANN.

Input: ``embeddings(vec_id: bigint, embedding: array<float>, label: int)``.
All arithmetic promotes to float64 BEFORE multiplying and accumulates
sequentially (``F.aggregate`` over the array) so the DuckDB twin
(``list_sum(list_transform(...))``) is bit-identical.

Scale design:
* brute force is the oracle/baseline: the query side is tiny and
  broadcast, so the plan is a single pass over the corpus per batch of
  queries — O(n_queries * N * d) FLOPs, embarrassingly parallel, no
  shuffle except the final per-query top-k.
* the LSH path buckets vectors by random-hyperplane sign bits
  (reference analog: RP-LSH init, /root/reference/src/index_lsh.cpp:
  512-546); queries probe their own bucket plus all buckets at Hamming
  distance 1 (multi-probe), turning the scan into a bucket-local join.
  Recall is tested against the brute-force oracle in pytest.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ANN_BITS = None  # adaptive: ~log2(N / ANN_TARGET_BUCKET)
ANN_TARGET_BUCKET = 32
ANN_SEED = 42


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(col):
    return col.cast("array<double>")


MAX_EXACT_QUERIES = 4096


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    max_queries: int = MAX_EXACT_QUERIES,
) -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id, sim_ppm).

    ``queries`` is (query_id, q_emb array<float>); broadcast against the
    corpus. Ties broken by neighbor_id asc; self-matches excluded.

    This is the EXACT oracle path: one full corpus scan per query
    batch, O(n_queries × N × d). The query side must stay broadcast-
    small — a large query set silently degrades into an all-pairs scan,
    so it is guarded (``max_queries``; raise it deliberately or batch
    the callers). Use the ANN paths for large query sets.
    """
    n_q = queries.limit(max_queries + 1).count()
    if n_q > max_queries:
        raise ValueError(
            f"cosine_topk is the exact broadcast oracle; got > "
            f"{max_queries} queries — batch them or use ann_lsh_topk/"
            f"ivf_topk for large query sets"
        )
    q = F.broadcast(
        queries.select(
            "query_id", _as_double(F.col("q_emb")).alias("qe")
        ).withColumn("qn", _dot(F.col("qe"), F.col("qe")))
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("ce"),
    ).withColumn("cn", _dot(F.col("ce"), F.col("ce")))
    sims = (
        c.crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qe"), F.col("ce"))
                / (F.sqrt(F.col("qn")) * F.sqrt(F.col("cn")))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.floor(F.col("sim") * 1_000_000 + 0.5).cast("long").alias("sim_ppm"),
        )
    )


def queries_from_corpus(emb: DataFrame, n_queries: int = 8) -> DataFrame:
    return emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )


def _hyperplanes(dim: int, bits: int, seed: int = ANN_SEED) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((bits, dim))


def adaptive_bits(n: int, target_bucket: int = ANN_TARGET_BUCKET) -> int:
    """Code length scaling with corpus size so buckets stay ~target_bucket.

    The IVF-nlist analog: more partitions as N grows keeps per-bucket scan
    cost flat while multiprobe (1 + bits probes) grows only
    logarithmically. Reference analog: the reference's bucket-size
    stopping rule ``tablelen_`` in CLSH
    (/root/reference/src/index_lsh.cpp:616-697) — it also splits until
    buckets fall under a size cap rather than using a fixed depth.
    """
    import math

    return max(2, int(math.log2(max(n / target_bucket, 2.0))))


_PLANE_CACHE: dict = {}


def _planes_cached(bits: int, dim: int, seed: int) -> np.ndarray:
    """Executor-side hyperplane cache: planes are a pure function of
    (bits, dim, seed), so every executor regenerates them identically —
    no broadcast needed, no driver-side dim probe."""
    key = (bits, dim, seed)
    if key not in _PLANE_CACHE:
        _PLANE_CACHE[key] = _hyperplanes(dim, bits, seed)
    return _PLANE_CACHE[key]


def lsh_code_udf(bits: int, seed: int = ANN_SEED):
    """Sign-bit LSH code of an embedding column as ONE numpy matmul per
    Arrow batch (projection + sign-packing, the reference's
    random_projection, /root/reference/src/index_lsh.cpp:521-546).

    Replaces the expression-tree form (zip_with against `dim` literal
    arrays per bit), whose plan size grew O(bits × dim) — at realistic
    dims (768+) and adaptive code lengths that meant 10^4-10^5 Catalyst
    nodes per projection. The UDF plan is a single node regardless of
    bits/dim (asserted in tests/test_plans.py), and the matmul runs
    BLAS-vectorized like ivf_topk's centroid assignment.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def code(embs):
        x = np.stack(embs.to_numpy()).astype(np.float64)
        planes = _planes_cached(bits, x.shape[1], seed)
        sign = (x @ planes.T) > 0  # (batch, bits)
        weights = np.left_shift(np.int64(1), np.arange(bits, dtype=np.int64))
        return pd.Series((sign.astype(np.int64) * weights).sum(axis=1))

    return code


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int | None = None,
    nprobe: int = 8,
    seed: int = ANN_SEED,
    n: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: KMeans coarse quantizer + nprobe lists.

    Two-stage cheap-then-exact ranking (reference analog: Hamming
    shortlist -> exact L2 re-rank, /root/reference/src/index_lsh.cpp:
    485-507, and the faiss-PQ coarse quantizer, src/index_pq.cpp:43-90):

    1. KMeans (pyspark.ml, fixed seed; at 100 TB: fit on a bounded
       sample) learns ``nlist`` centroids, broadcast to executors.
    2. an Arrow-vectorized pandas UDF assigns every vector to its
       nearest centroid (one numpy matmul per batch — no per-row Python).
    3. queries probe their ``nprobe`` nearest lists; exact cosine re-rank
       within the probed lists only.

    Output schema matches :func:`cosine_topk`.
    """
    import pandas as pd
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.functions import pandas_udf

    spark = emb.sparkSession
    if n is None:
        n = emb.count()
    if nlist is None:
        nlist = max(4, int(np.sqrt(n)))
    train = emb.select(array_to_vector(F.col("embedding")).alias("features"))
    if n > 100_000:
        train = train.sample(fraction=100_000 / n, seed=seed)
    model = KMeans(k=nlist, seed=seed, featuresCol="features").fit(train)
    centers = np.stack([np.asarray(c) for c in model.clusterCenters()])  # (nlist, d)
    bc = spark.sparkContext.broadcast(centers)

    @pandas_udf("int")
    def nearest_list(embs):
        x = np.stack(embs.to_numpy())  # (batch, d)
        c = bc.value
        # squared L2 via the FastL2 expansion (norm precompute analog of
        # /root/reference/include/commom/distance.h:230-323)
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        return pd.Series(d2.argmin(1).astype("int32"))

    @pandas_udf("array<int>")
    def probe_lists(embs):
        x = np.stack(embs.to_numpy())
        c = bc.value
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        order = np.argsort(d2, axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(order))

    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("ce"),
        nearest_list(F.col("embedding")).alias("list_id"),
    ).withColumn("cn", _dot(F.col("ce"), F.col("ce")))
    q = queries.select(
        "query_id",
        _as_double(F.col("q_emb")).alias("qe"),
        F.explode(probe_lists(F.col("q_emb"))).alias("list_id"),
    ).withColumn("qn", _dot(F.col("qe"), F.col("qe")))
    sims = (
        c.join(F.broadcast(q), "list_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qe"), F.col("ce"))
                / (F.sqrt(F.col("qn")) * F.sqrt(F.col("cn")))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.floor(F.col("sim") * 1_000_000 + 0.5).cast("long").alias("sim_ppm"),
        )
    )


def ann_lsh_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int | None = ANN_BITS,
    multiprobe: bool = True,
    n: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane buckets.

    Same output schema as :func:`cosine_topk`; recall < 1 by design
    (verified >= a fixed floor in pytest against the exact oracle).
    Queries probe their own bucket and (multiprobe) every bucket at
    Hamming distance 1 — 1+bits buckets out of 2^bits. ``bits=None``
    adapts the code length to the corpus size (``n`` skips the count
    job when the caller already knows it).
    """
    if bits is None:
        bits = adaptive_bits(emb.count() if n is None else n)
    code = lsh_code_udf(bits)
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("ce"),
    )
    c = c.withColumn("bucket", code(F.col("ce"))).withColumn(
        "cn", _dot(F.col("ce"), F.col("ce"))
    )
    q = queries.select("query_id", _as_double(F.col("q_emb")).alias("qe"))
    q = q.withColumn("qbucket", code(F.col("qe"))).withColumn(
        "qn", _dot(F.col("qe"), F.col("qe"))
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[F.col("qbucket").bitwiseXOR(F.lit(1 << j)) for j in range(bits)],
        )
    else:
        probes = F.array(F.col("qbucket"))
    q = q.select(
        "query_id", "qe", "qn", F.explode(probes).alias("bucket")
    )
    sims = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qe"), F.col("ce"))
                / (F.sqrt(F.col("qn")) * F.sqrt(F.col("cn")))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.floor(F.col("sim") * 1_000_000 + 0.5).cast("long").alias("sim_ppm"),
        )
    )
