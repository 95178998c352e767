"""Text-analysis operators for the training-data pipeline layer.

All computation is JVM-side ``pyspark.sql.functions`` over the
``documents(doc_id, text, lang, source, n_chars)`` table — no Python UDFs
anywhere in this module. Each operator has a DuckDB SQL twin in
sql_oracle_docs.py; float ratios are emitted quantized (ppm) so the value
hashes are engine-stable.

Scale notes: every operator here is a narrow projection or a
groupBy-free scan — at 100 TB they are embarrassingly parallel, bounded
by parquet scan throughput, and Catalyst prunes to (doc_id, text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgraph_framework_spark.functions.hashing import portable_hash64

# Shared with the SQL oracle: English function words for the stopword-ratio
# features and the language-ID heuristic.
EN_STOPWORDS = ["the", "a", "of", "and", "is", "to", "in", "that", "it", "on"]

FINGERPRINT_K = 3  # tokens per k-gram
FINGERPRINT_W = 4  # winnowing window (k-grams per window)


def tokens_col(text: Column | None = None) -> Column:
    text = F.col("text") if text is None else text
    return F.split(text, " ")


def _ppm(x: Column) -> Column:
    """Quantize a ratio to parts-per-million as an exact BIGINT."""
    return F.floor(x * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counts and length statistics.

    ``n_tokens`` is a whitespace tokenization; ``n_tokens_bpe`` is a
    BPE-ish count splitting on word boundaries AND digit runs (a cheap
    stand-in for subword tokenizers: numbers and punctuation tokenize
    separately).
    """
    toks = tokens_col()
    n_tok = F.array_size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x.cast("long"),
    )
    # BPE-ish: count maximal alpha runs, digit runs, and punct chars
    bpe = F.array_size(
        F.filter(
            F.split(F.regexp_replace(F.col("text"), r"([0-9])", r" $1 "), " "),
            lambda t: t != F.lit(""),
        )
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_m"),
        n_tok.cast("long").alias("n_tokens"),
        bpe.cast("long").alias("n_tokens_bpe"),
        _ppm(sum_len / n_tok).alias("avg_token_len_ppm"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic document-quality features + combined score.

    Features: stopword ratio, alphabetic-character ratio, mean token
    length band, all combined into a [0,1] score. The exact formula is
    arbitrary (as in any production quality classifier, what matters is
    determinism + cheapness); it is mirrored in the SQL twin.
    """
    toks = tokens_col()
    n_tok = F.array_size(toks)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.array_size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t)))
    )
    n_alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    stop_ratio = n_stop / n_tok
    alpha_ratio = n_alpha / F.length("text")
    len_ok = F.when((n_tok >= 10) & (n_tok <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    score = (
        F.lit(0.4) * F.least(stop_ratio * F.lit(5.0), F.lit(1.0))
        + F.lit(0.4) * alpha_ratio
        + F.lit(0.2) * len_ok
    )
    return docs.select(
        "doc_id",
        _ppm(stop_ratio).alias("stop_ratio_ppm"),
        _ppm(alpha_ratio).alias("alpha_ratio_ppm"),
        _ppm(score).alias("quality_ppm"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Stopword-profile language ID (n-gram-free heuristic).

    Predicts 'en' when the English function-word hit ratio clears a
    threshold, else 'unknown'. A real corpus would use per-language
    profiles; the operator shape (token-set intersection ratio against
    broadcast wordlists) is what matters at scale.
    """
    toks = tokens_col()
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    ratio = F.array_size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t)))
    ) / F.array_size(toks)
    return docs.select(
        "doc_id",
        _ppm(ratio).alias("en_ratio_ppm"),
        F.when(ratio >= 0.04, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_pred"),
    )


def fingerprints(docs: DataFrame, k: int = FINGERPRINT_K, w: int = FINGERPRINT_W) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. MOSS scheme).

    Token k-gram rolling hashes; within every window of ``w`` consecutive
    k-gram hashes keep the minimum; the distinct kept hashes are the
    document's fingerprint set — output one row per (doc_id, fp).
    Implemented with array functions + an explode; the hash is the
    portable md5 form so the DuckDB twin is bit-identical.
    """
    toks = tokens_col()
    n_tok = F.array_size(toks)
    # k-gram strings: positions 0 .. n_tok-k
    grams = F.transform(
        F.sequence(F.lit(0), n_tok - k),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    d = docs.where(n_tok >= k + w - 1).select(
        "doc_id",
        (n_tok - k + 1).alias("n_grams"),
        F.posexplode(grams).alias("pos", "gram"),
    )
    d = d.select("doc_id", "n_grams", "pos", portable_hash64(F.col("gram")).alias("h"))
    from pyspark.sql import Window

    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        d.select(
            "doc_id", "n_grams", "pos", F.min("h").over(win).alias("fp")
        )
        .where(F.col("pos") <= F.col("n_grams") - w)  # complete windows only
        .select("doc_id", "fp")
        .distinct()
    )
