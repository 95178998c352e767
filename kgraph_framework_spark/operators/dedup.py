"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Operates on a document corpus ``(doc_id: bigint, text: string)``. The
driver's synthetic ``documents`` table has no duplicates, so the canonical
query corpus (:func:`dup_corpus`) deterministically synthesizes exact
copies (doc_id % 7) and near-duplicate mutations (doc_id % 11, last 8
tokens dropped) — the derivation is mirrored in the DuckDB oracle SQL, so
both engines dedup the identical corpus.

Scale design (the whole point of these operators at 100 TB):
* exact dedup: hash-groupBy on md5(text) — map-side partial agg, one
  shuffle keyed by a uniform hash (no skew by construction).
* n-gram Jaccard: candidate pairs via an equi-join on shingle hash.
  At web scale the stop-shingle problem (a shingle shared by 10^6 docs
  creates 10^12 pairs) is handled by ``max_shingle_freq`` — drop
  shingles more frequent than the cap before pairing (the cap changes
  candidate RECALL only, never the Jaccard value of a surviving pair).
* MinHash+LSH: fixed-width signatures (32 mins) + banded bucketing
  (8 bands x 4 rows) turns all-pairs into per-bucket joins — the classic
  sub-quadratic path; bucket sizes are bounded by band-hash uniformity.
* SimHash: 48-bit signs of gram-hash sums; candidate pairs via the
  6x8-bit block join (pigeonhole: hamming <= 5 implies an exact match in
  at least one block), then exact Hamming filter. Sub-quadratic and
  skew-safe (block values are uniform).

All hashes are the portable md5 form (functions/hashing.py) so the DuckDB
twins produce bit-identical signatures.

Reference analog: the LSH-bucket candidate generation + same-bucket
dedup guard of /root/reference/src/index_lsh.cpp:391-467 and
include/index/index_lsh.h:140-146 — candidate pruning via hashing, then
exact scoring of survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgraph_framework_spark.functions.hashing import (
    minhash_coeffs,
    minhash_term,
    portable_hash64,
)

SHINGLE_K = 3
MINHASH_N = 32
LSH_BANDS = 8
LSH_ROWS = 4  # MINHASH_N / LSH_BANDS
MINHASH_EST_THRESHOLD = 0.5
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 48
SIMHASH_BLOCKS = 6  # 8 bits each; guarantees recall for hamming <= 5
SIMHASH_MAX_HAMMING = 5

EXACT_DUP_MOD = 7
NEAR_DUP_MOD = 11
NEAR_DUP_DROP = 8

# embedding-cosine near-dup family
EMB_EXACT_MOD = 9
EMB_NEAR_MOD = 5
COSINE_DUP_THRESHOLD = 0.95
MAX_EXACT_EMBCOS_VECS = 8192
EMBCOS_BANDS = 8
EMBCOS_BAND_BITS = 8
EMBCOS_SEED = 0xE3B


def dup_corpus(docs: DataFrame) -> DataFrame:
    """documents + deterministic exact copies and near-dup mutations."""
    base = docs.select("doc_id", "text")
    exact = (
        base.where(F.col("doc_id") % EXACT_DUP_MOD == 0)
        .select((F.col("doc_id") + 100_000).alias("doc_id"), "text")
    )
    toks = F.split(F.col("text"), " ")
    keep = F.greatest(F.array_size(toks) - NEAR_DUP_DROP, F.lit(1))
    near = (
        base.where(F.col("doc_id") % NEAR_DUP_MOD == 0)
        .select(
            (F.col("doc_id") + 200_000).alias("doc_id"),
            F.concat_ws(" ", F.slice(toks, 1, keep)).alias("text"),
        )
    )
    return base.unionByName(exact).unionByName(near)


def embcos_corpus(emb: DataFrame) -> DataFrame:
    """embeddings + deterministic exact copies and near-dup perturbations.

    The driver's synthetic ``embeddings`` table has no near-dup pairs
    (max off-diagonal cosine ~0.51), so — exactly like :func:`dup_corpus`
    for text — the canonical query corpus plants them: exact copies
    (vec_id % EMB_EXACT_MOD) and near-dups with a deterministic
    per-element multiplicative perturbation (vec_id % EMB_NEAR_MOD;
    factors in [0.88, 1.12] keep the planted pair at cosine ~0.9976,
    far above the ~0.51 background). The derivation is mirrored
    element-for-element in the DuckDB oracle SQL.

    Output: (vec_id: bigint, e: array<double>).
    """
    base = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    exact = (
        base.where(F.col("vec_id") % EMB_EXACT_MOD == 0)
        .select((F.col("vec_id") + 100_000).alias("vec_id"), "e")
    )
    # perturb FIRST (withColumn), then re-alias the id: putting both in
    # one select makes Spark's lateral-column-alias resolution bind the
    # factor's vec_id to the shifted alias, silently changing the factors
    near = (
        base.where(F.col("vec_id") % EMB_NEAR_MOD == 0)
        .withColumn(
            "e",
            F.transform(
                F.col("e"),
                lambda x, i: x
                * (
                    F.lit(1.0)
                    + ((F.col("vec_id") * 31 + i * 7) % 13 - 6) / F.lit(50.0)
                ),
            ),
        )
        .select((F.col("vec_id") + 200_000).alias("vec_id"), "e")
    )
    return base.unionByName(exact).unionByName(near)


def _emb_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _embcos_score(cand: DataFrame, corpus: DataFrame, threshold: float) -> DataFrame:
    """Exact cosine re-rank of (vec_a, vec_b) candidates against the
    corpus: keeps pairs with sim >= threshold, ppm-quantized."""
    na = corpus.select(
        F.col("vec_id").alias("vec_a"),
        F.col("e").alias("ea"),
        _emb_dot(F.col("e"), F.col("e")).alias("nna"),
    )
    nb = corpus.select(
        F.col("vec_id").alias("vec_b"),
        F.col("e").alias("eb"),
        _emb_dot(F.col("e"), F.col("e")).alias("nnb"),
    )
    sims = (
        cand.join(na, "vec_a")
        .join(nb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (
                _emb_dot(F.col("ea"), F.col("eb"))
                / (F.sqrt(F.col("nna")) * F.sqrt(F.col("nnb")))
            ).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
    return sims.select(
        "vec_a",
        "vec_b",
        F.floor(F.col("sim") * 1_000_000 + 0.5).cast("long").alias("sim_ppm"),
    )


def embedding_cosine_pairs(
    corpus: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    max_vecs: int = MAX_EXACT_EMBCOS_VECS,
) -> DataFrame:
    """EXACT embedding-cosine near-dup pairs: (vec_a, vec_b, sim_ppm),
    vec_a < vec_b, cosine >= threshold.

    This is the declared O(N^2) exact oracle (all-pairs scan), guarded by
    ``max_vecs`` like :func:`similarity.cosine_topk` — exact near-dup
    over arbitrary real vectors has no deterministic sub-quadratic
    blocking, so the 100-TB path is :func:`embedding_cosine_lsh_pairs`
    (sign-band LSH candidates + exact re-rank, recall-gated)."""
    n = corpus.limit(max_vecs + 1).count()
    if n > max_vecs:
        raise ValueError(
            f"embedding_cosine_pairs is the exact O(N^2) oracle; got > "
            f"{max_vecs} vectors — use embedding_cosine_lsh_pairs at scale"
        )
    ids = corpus.select("vec_id")
    cand = (
        ids.select(F.col("vec_id").alias("vec_a"))
        .crossJoin(ids.select(F.col("vec_id").alias("vec_b")))
        .where(F.col("vec_a") < F.col("vec_b"))
    )
    return _embcos_score(cand, corpus, threshold)


def embedding_cosine_lsh_pairs(
    corpus: DataFrame,
    threshold: float = COSINE_DUP_THRESHOLD,
    bands: int = EMBCOS_BANDS,
    band_bits: int = EMBCOS_BAND_BITS,
    seed: int = EMBCOS_SEED,
) -> DataFrame:
    """Sub-quadratic embedding near-dup: sign-band LSH candidates + exact
    cosine re-rank. Same output schema as :func:`embedding_cosine_pairs`;
    recall < 1 by design (gated vs the exact oracle in quality.py).

    Scale path: one ``bands*band_bits``-bit random-hyperplane code per
    vector (a single BLAS matmul per Arrow batch, similarity.lsh_code_udf),
    banded like MinHash-LSH — a pair is a candidate iff ALL ``band_bits``
    sign bits of at least one band agree, so candidate generation is
    ``bands`` equi-joins on uniform 8-bit-keyed buckets (no all-pairs, no
    skew: near-dup pairs at cosine ~0.998 miss a band with prob ~0.16,
    all 8 bands with prob ~5e-7). Reference analog: the banded bucket
    probe of /root/reference/src/index_lsh.cpp:391-467."""
    from kgraph_framework_spark.operators.similarity import lsh_code_udf

    code = lsh_code_udf(bands * band_bits, seed)
    coded = corpus.select("vec_id", code(F.col("e")).alias("code"))
    blocks = None
    mask = (1 << band_bits) - 1
    for ix in range(bands):
        blk = coded.select(
            "vec_id",
            F.lit(ix).alias("band_ix"),
            F.shiftrightunsigned(F.col("code"), ix * band_bits)
            .bitwiseAND(F.lit(mask))
            .alias("bval"),
        )
        blocks = blk if blocks is None else blocks.unionByName(blk)
    cand = (
        blocks.alias("a")
        .join(blocks.alias("b"), ["band_ix", "bval"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    return _embcos_score(cand, corpus, threshold)


def exact_duplicates(corpus: DataFrame) -> DataFrame:
    """Duplicate groups by full-text hash: (text_md5, n_copies, keep_id)."""
    return (
        corpus.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keep_id"),
        )
        .where(F.col("n_copies") > 1)
    )


def shingles(corpus: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """Distinct word k-gram shingles with portable hashes: (doc_id, gram, h)."""
    toks = F.split(F.col("text"), " ")
    n = F.array_size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return (
        corpus.where(n >= k)
        .select("doc_id", F.explode(grams).alias("gram"))
        .distinct()
        .withColumn("h", portable_hash64(F.col("gram")))
    )


def ngram_jaccard_pairs(
    corpus: DataFrame,
    k: int = SHINGLE_K,
    threshold: float = JACCARD_THRESHOLD,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard over shingle sets for candidate pairs sharing >= 1
    shingle: (doc_a, doc_b, jaccard_ppm), doc_a < doc_b.

    ``max_shingle_freq`` prunes stop-shingles before pairing (scale
    path; off by default so the oracle is parameter-free).
    """
    sh = shingles(corpus, k).select("doc_id", "h")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pair_side = sh
    if max_shingle_freq is not None:
        freq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
        pair_side = sh.join(
            freq.where(F.col("df") <= max_shingle_freq).select("h"), "h", "left_semi"
        )
    a = pair_side.select(F.col("doc_id").alias("doc_a"), "h")
    b = pair_side.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        a.join(b, "h")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    j = (
        inter.join(na, "doc_a").join(nb, "doc_b")
        .withColumn(
            "jac",
            F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
        )
        .where(F.col("jac") >= threshold)
    )
    return j.select(
        "doc_a", "doc_b",
        F.floor(F.col("jac") * 1_000_000 + 0.5).cast("long").alias("jaccard_ppm"),
    )


def minhash_signatures(corpus: DataFrame, n_hashes: int = MINHASH_N) -> DataFrame:
    """(doc_id, s0..s{n-1}) MinHash signature columns."""
    sh = shingles(corpus).select("doc_id", "h")
    aggs = [
        F.min(minhash_term(F.col("h"), a, b)).alias(f"s{i}")
        for i, (a, b) in enumerate(minhash_coeffs(n_hashes))
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_pairs(
    corpus: DataFrame,
    threshold: float = MINHASH_EST_THRESHOLD,
) -> DataFrame:
    """Banded-LSH candidate pairs with signature-estimated similarity:
    (doc_a, doc_b, est_ppm), doc_a < doc_b, est >= threshold."""
    sigs = minhash_signatures(corpus).persist()
    sig_cols = [f"s{i}" for i in range(MINHASH_N)]
    bands = None
    for bix in range(LSH_BANDS):
        cols = sig_cols[bix * LSH_ROWS:(bix + 1) * LSH_ROWS]
        band = sigs.select(
            "doc_id",
            F.lit(bix).alias("band_ix"),
            F.md5(F.concat_ws(",", *[F.col(c).cast("string") for c in cols])).alias("bkey"),
        )
        bands = band if bands is None else bands.unionByName(band)
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_ix", "bkey"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"), *[F.col(c).alias(f"a_{c}") for c in sig_cols]
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"), *[F.col(c).alias(f"b_{c}") for c in sig_cols]
    )
    matches = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0) for c in sig_cols
    )
    out = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("est", matches / F.lit(float(MINHASH_N)))
        .where(F.col("est") >= threshold)
        .select(
            "doc_a", "doc_b",
            F.floor(F.col("est") * 1_000_000 + 0.5).cast("long").alias("est_ppm"),
        )
    )
    return out


def simhash_signatures(corpus: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — sign bits of per-bit sums over shingle hashes."""
    sh = shingles(corpus).select("doc_id", "h")
    sums = sh.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{j}")
            for j in range(bits)
        ]
    )
    sim = sums.select(
        "doc_id",
        sum(
            F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
            for j in range(bits)
        ).cast("long").alias("simhash"),
    )
    return sim


def simhash_pairs(
    corpus: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
) -> DataFrame:
    """Near-dup pairs by SimHash: (doc_a, doc_b, hamming), doc_a < doc_b.

    Candidates via the block join (8-bit blocks; any pair with hamming
    <= SIMHASH_BLOCKS - 1 shares at least one exact block), then the
    exact popcount filter — identical output to the oracle's O(n^2) scan.
    """
    assert max_hamming < SIMHASH_BLOCKS
    sig = simhash_signatures(corpus).persist()
    blocks = None
    for ix in range(SIMHASH_BLOCKS):
        blk = sig.select(
            "doc_id",
            F.lit(ix).alias("block_ix"),
            F.shiftright(F.col("simhash"), ix * 8).bitwiseAND(F.lit(255)).alias("bval"),
        )
        blocks = blk if blocks is None else blocks.unionByName(blk)
    cand = (
        blocks.alias("a")
        .join(blocks.alias("b"), ["block_ix", "bval"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ha = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sim_a"))
    hb = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sim_b"))
    return (
        cand.join(ha, "doc_a").join(hb, "doc_b")
        .withColumn(
            "hamming",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).cast("long"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
