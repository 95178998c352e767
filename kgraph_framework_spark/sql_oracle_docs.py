"""DuckDB oracle-SQL builders for the training-data pipeline queries
(text stats, dedup family, similarity search, multimodal features).

Mirrors the Spark operators in operators/{textstats,dedup,similarity,
multimodal}.py column for column; all hashes use the portable md5 form
(functions/hashing.py) and all float ratios are ppm-quantized BIGINTs.
"""

from __future__ import annotations

from kgraph_framework_spark.functions.hashing import (
    minhash_coeffs,
    minhash_term_sql,
    portable_hash64_sql,
)
from kgraph_framework_spark.operators.dedup import (
    COSINE_DUP_THRESHOLD,
    EMB_EXACT_MOD,
    EMB_NEAR_MOD,
    EXACT_DUP_MOD,
    JACCARD_THRESHOLD,
    LSH_BANDS,
    LSH_ROWS,
    MINHASH_EST_THRESHOLD,
    MINHASH_N,
    NEAR_DUP_DROP,
    NEAR_DUP_MOD,
    SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
)
from kgraph_framework_spark.operators.textstats import (
    EN_STOPWORDS,
    FINGERPRINT_K,
    FINGERPRINT_W,
)

_STOPLIST = ", ".join(f"'{s}'" for s in EN_STOPWORDS)

TOKS_CTE = "toks AS (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents)"

CORPUS_CTE = f"""corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % {EXACT_DUP_MOD} = 0
  UNION ALL
  SELECT doc_id + 200000,
         array_to_string(list_slice(string_split(text, ' '), 1,
             greatest(len(string_split(text, ' ')) - {NEAR_DUP_DROP}, 1)), ' ')
  FROM documents WHERE doc_id % {NEAR_DUP_MOD} = 0
)"""

# distinct word 3-gram shingles of the dup corpus, with portable hashes
_G = portable_hash64_sql("gram")
SHINGLE_CTES = f"""{CORPUS_CTE},
ctoks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
grams AS (SELECT DISTINCT doc_id,
                 array_to_string(list_slice(tk, i, i + 2), ' ') AS gram
          FROM ctoks, unnest(generate_series(1, len(tk) - 2)) AS t(i)
          WHERE len(tk) >= 3),
gh AS (SELECT doc_id, {_G} AS h FROM grams)"""


def token_stats_sql() -> str:
    return f"""WITH {TOKS_CTE}
SELECT doc_id,
  CAST(len(text) AS BIGINT) AS n_chars_m,
  CAST(len(tk) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(string_split(regexp_replace(text, '([0-9])', ' \\1 ', 'g'), ' '),
       x -> x <> '')) AS BIGINT) AS n_tokens_bpe,
  CAST(floor(list_sum(list_transform(tk, x -> len(x)))::DOUBLE / len(tk)
       * 1000000 + 0.5) AS BIGINT) AS avg_token_len_ppm
FROM toks"""


def quality_scores_sql() -> str:
    return f"""WITH {TOKS_CTE},
feat AS (
  SELECT doc_id,
    len(list_filter(tk, x -> lower(x) IN ({_STOPLIST})))::DOUBLE / len(tk) AS stop_ratio,
    len(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / len(text) AS alpha_ratio,
    CASE WHEN len(tk) >= 10 AND len(tk) <= 1000 THEN 1.0 ELSE 0.5 END AS len_ok
  FROM toks)
SELECT doc_id,
  CAST(floor(stop_ratio * 1000000 + 0.5) AS BIGINT) AS stop_ratio_ppm,
  CAST(floor(alpha_ratio * 1000000 + 0.5) AS BIGINT) AS alpha_ratio_ppm,
  CAST(floor((0.4 * least(stop_ratio * 5.0, 1.0) + 0.4 * alpha_ratio + 0.2 * len_ok)
       * 1000000 + 0.5) AS BIGINT) AS quality_ppm
FROM feat"""


def language_id_sql() -> str:
    return f"""WITH {TOKS_CTE},
r AS (SELECT doc_id,
        len(list_filter(tk, x -> lower(x) IN ({_STOPLIST})))::DOUBLE / len(tk) AS ratio
      FROM toks)
SELECT doc_id,
  CAST(floor(ratio * 1000000 + 0.5) AS BIGINT) AS en_ratio_ppm,
  CASE WHEN ratio >= 0.04 THEN 'en' ELSE 'unknown' END AS lang_pred
FROM r"""


def fingerprints_sql(k: int = FINGERPRINT_K, w: int = FINGERPRINT_W) -> str:
    h = portable_hash64_sql(f"array_to_string(list_slice(tk, i, i + {k - 1}), ' ')")
    return f"""WITH ftoks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
fdocs AS (SELECT doc_id, tk, len(tk) AS n FROM ftoks WHERE len(tk) >= {k + w - 1}),
fgrams AS (SELECT doc_id, n - {k} + 1 AS n_grams, i - 1 AS pos, {h} AS h
           FROM fdocs, unnest(generate_series(1, n - {k - 1})) AS t(i)),
fw AS (SELECT doc_id, pos, n_grams,
              MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS fp
       FROM fgrams)
SELECT DISTINCT doc_id, fp FROM fw WHERE pos <= n_grams - {w}"""


def exact_dedup_sql() -> str:
    return f"""WITH {CORPUS_CTE}
SELECT md5(text) AS text_md5,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       MIN(doc_id) AS keep_id
FROM corpus GROUP BY 1 HAVING COUNT(*) > 1"""


def ngram_jaccard_sql(threshold: float = JACCARD_THRESHOLD) -> str:
    return f"""WITH {SHINGLE_CTES},
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM gh GROUP BY 1),
inter AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS ni
          FROM gh a JOIN gh b ON a.h = b.h AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
j AS (SELECT da, db, ni::DOUBLE / (na.n_sh + nb.n_sh - ni) AS jac
      FROM inter JOIN sizes na ON da = na.doc_id JOIN sizes nb ON db = nb.doc_id)
SELECT da AS doc_a, db AS doc_b,
       CAST(floor(jac * 1000000 + 0.5) AS BIGINT) AS jaccard_ppm
FROM j WHERE jac >= {threshold}"""


def minhash_lsh_sql(threshold: float = MINHASH_EST_THRESHOLD) -> str:
    coeffs = minhash_coeffs(MINHASH_N)
    mins = ",\n  ".join(
        f"MIN({minhash_term_sql('h', a, b)}) AS s{i}" for i, (a, b) in enumerate(coeffs)
    )
    band_selects = []
    for bix in range(LSH_BANDS):
        cols = [f"s{i}" for i in range(bix * LSH_ROWS, (bix + 1) * LSH_ROWS)]
        key = " || ',' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        band_selects.append(
            f"SELECT doc_id, {bix} AS band_ix, md5({key}) AS bkey FROM sigs"
        )
    bands = "\nUNION ALL ".join(band_selects)
    matches = " + ".join(
        f"(CASE WHEN sa.s{i} = sb.s{i} THEN 1 ELSE 0 END)" for i in range(MINHASH_N)
    )
    return f"""WITH {SHINGLE_CTES},
sigs AS (SELECT doc_id, {mins} FROM gh GROUP BY doc_id),
bands AS ({bands}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band_ix = b.band_ix AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
est AS (SELECT doc_a, doc_b, ({matches}) / {float(MINHASH_N)} AS est
        FROM cand JOIN sigs sa ON cand.doc_a = sa.doc_id
                  JOIN sigs sb ON cand.doc_b = sb.doc_id)
SELECT doc_a, doc_b, CAST(floor(est * 1000000 + 0.5) AS BIGINT) AS est_ppm
FROM est WHERE est >= {threshold}"""


def simhash_sql(max_hamming: int = SIMHASH_MAX_HAMMING) -> str:
    bitsums = ",\n  ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    weave = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    return f"""WITH {SHINGLE_CTES},
bitsums AS (SELECT doc_id, {bitsums} FROM gh GROUP BY doc_id),
sims AS (SELECT doc_id, CAST({weave} AS BIGINT) AS simhash FROM bitsums)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sims a JOIN sims b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"""


def embcos_sql(threshold: float = COSINE_DUP_THRESHOLD) -> str:
    """O(n^2) exact twin of dedup.embedding_cosine_pairs over
    dedup.embcos_corpus — corpus derivation mirrored element-for-element
    (DuckDB list indices are 1-based; Spark transform's index is 0-based,
    hence the (i-1) in the perturbation and dot terms)."""
    perturb = (
        "list_transform(generate_series(1, len(embedding)), "
        f"i -> embedding[i]::DOUBLE * "
        f"(1.0 + ((vec_id * 31 + (i - 1) * 7) % 13 - 6) / 50.0))"
    )
    dot = ("list_sum(list_transform(generate_series(1, len(a.e)), "
           "i -> a.e[i] * b.e[i]))")
    nn = "list_sum(list_transform(generate_series(1, len(e)), i -> e[i] * e[i]))"
    return f"""WITH embcorpus AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 100000, list_transform(embedding, x -> x::DOUBLE)
  FROM embeddings WHERE vec_id % {EMB_EXACT_MOD} = 0
  UNION ALL
  SELECT vec_id + 200000, {perturb}
  FROM embeddings WHERE vec_id % {EMB_NEAR_MOD} = 0
),
norms AS (SELECT vec_id, e, {nn} AS nrm FROM embcorpus),
sims AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                {dot} / (sqrt(a.nrm) * sqrt(b.nrm)) AS sim
         FROM norms a JOIN norms b ON a.vec_id < b.vec_id)
SELECT vec_a, vec_b, CAST(floor(sim * 1000000 + 0.5) AS BIGINT) AS sim_ppm
FROM sims WHERE sim >= {threshold}"""


def knn_cosine_sql(k: int = 5, n_queries: int = 8) -> str:
    dot = ("list_sum(list_transform(generate_series(1, len(q.qe)), "
           "i -> q.qe[i]::DOUBLE * c.ce[i]::DOUBLE))")
    qn = ("list_sum(list_transform(generate_series(1, len(q.qe)), "
          "i -> q.qe[i]::DOUBLE * q.qe[i]::DOUBLE))")
    cn = ("list_sum(list_transform(generate_series(1, len(c.ce)), "
          "i -> c.ce[i]::DOUBLE * c.ce[i]::DOUBLE))")
    return f"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
           FROM embeddings WHERE vec_id < {n_queries}),
c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
sims AS (SELECT q.query_id, c.neighbor_id,
                {dot} / (sqrt({qn}) * sqrt({cn})) AS sim
         FROM c, q WHERE c.neighbor_id <> q.query_id),
ranked AS (SELECT query_id, neighbor_id, sim,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY sim DESC, neighbor_id ASC) AS rn
           FROM sims)
SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id,
       CAST(floor(sim * 1000000 + 0.5) AS BIGINT) AS sim_ppm
FROM ranked WHERE rn <= {k}"""


def doc_skyline_sql() -> str:
    """Length-vs-cleanliness Pareto frontier via NOT EXISTS dominance —
    twin of operators/skyline.doc_quality_skyline."""
    return f"""WITH {TOKS_CTE},
m AS (
  SELECT doc_id,
    CAST(len(tk) AS BIGINT) AS n_tokens,
    CAST(floor(len(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
         / len(text) * 1000000 + 0.5) AS BIGINT) AS alpha_ppm
  FROM toks WHERE len(text) > 0)
SELECT doc_id, n_tokens, alpha_ppm FROM m a
WHERE NOT EXISTS (
  SELECT 1 FROM m b
  WHERE b.n_tokens >= a.n_tokens AND b.alpha_ppm >= a.alpha_ppm
    AND (b.n_tokens > a.n_tokens OR b.alpha_ppm > a.alpha_ppm))"""


def multimodal_features_sql() -> str:
    # Byte-exact for non-ASCII text: operate on hex(encode(text)) — the
    # UTF-8 BYTES — never on characters. head_md5 hashes the uppercase
    # hex of the first 16 bytes (this DuckDB has no md5(BLOB));
    # byte_sum_16 decodes each hex pair via strpos (note '0' is absent
    # from the digit list so strpos returns 0 for it, by construction).
    nyb = "greatest(strpos('123456789ABCDEF', substring(hx, {p}, 1)), 0)"
    pair = f"{nyb.format(p='2*i-1')} * 16 + {nyb.format(p='2*i')}"
    return f"""WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS nb
  FROM documents)
SELECT doc_id,
  CAST(nb AS BIGINT) AS n_bytes,
  md5(substring(hx, 1, 32)) AS head_md5,
  CAST(COALESCE(list_sum(list_transform(generate_series(1, least(16, nb)),
       i -> {pair})), 0) AS BIGINT) AS byte_sum_16,
  'bytes-v1' AS decoder
FROM hx"""
