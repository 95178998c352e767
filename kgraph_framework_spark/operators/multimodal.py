"""Multimodal columns: opaque binary payloads + typed metadata.

CONTRACT (closed in round 4, per round-3 advice): the engine treats
image/audio/video as opaque ``binary`` columns with typed metadata and
ships ONE total, codec-free built-in — byte-level feature extraction
(``decoder = 'bytes-v1'``) — that is defined for EVERY payload and media
type. Media-SPECIFIC decoding (pixel decode, resampling, frame
sampling) is an extension point, not a stub: :func:`decode_media` is the
Arrow-batched plumbing (schema, batching, memory bounding) into which a
deployment that has codec libraries (PIL/librosa/pyav) plugs its own
batch decoder. Nothing in this module raises for unknown media types.

At scale: payloads ride in parquet binary columns; ``mapInPandas``
streams Arrow record batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``), so executor memory is
batch-bounded regardless of corpus size, and the extraction is a narrow
map — no shuffle.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, head_md5 string, byte_sum_16 long, decoder string"
)

DECODER_NAME = "bytes-v1"


def binary_corpus(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload: binary, media_type, n_bytes).

    Uses the UTF-8 encoding of ``text`` as a stand-in payload; a real
    deployment reads the binary column straight from parquet.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
    )


def byte_features(payload: bytes) -> dict:
    """Single-payload reference implementation of the built-in byte
    decoder — total over all payloads and media types.
    """
    import hashlib

    head = payload[:16]
    # hash the UPPERCASE HEX of the head bytes (not the raw bytes): this
    # DuckDB build has no md5(BLOB), so the oracle twin reproduces the
    # digest from hex(encode(text)) — byte-exact for any input encoding
    # (the raw-bytes form only agreed on pure-ASCII fixtures).
    return {
        "n_bytes": len(payload),
        "head_md5": hashlib.md5(head.hex().upper().encode()).hexdigest(),
        "byte_sum_16": int(sum(head)),
        "decoder": DECODER_NAME,
    }


def extract_features(binaries: DataFrame) -> DataFrame:
    """Arrow-batched byte-feature extraction over the payload column.

    Byte features are computed with numpy over the CONCATENATED head
    bytes of the whole batch (frombuffer + bincount-segmented sums) —
    no per-row Python arithmetic; the only per-row call left is
    hashlib.md5, a C digest with no vectorized equivalent. Output is
    bit-identical to :func:`byte_features` per row, and is defined for
    every media type (the opaque-binary contract).
    """
    import hashlib

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            payloads = pdf["payload"].to_numpy()
            heads = [bytes(p[:16]) for p in payloads]
            lens = np.fromiter((len(h) for h in heads), np.int64, n)
            arr = np.frombuffer(b"".join(heads), np.uint8)
            byte_sum = np.bincount(
                np.repeat(np.arange(n), lens),
                weights=arr.astype(np.float64),
                minlength=n,
            ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(np.int64),
                    "n_bytes": np.fromiter(
                        (len(p) for p in payloads), np.int64, n
                    ),
                    "head_md5": [
                        hashlib.md5(h.hex().upper().encode()).hexdigest()
                        for h in heads
                    ],
                    "byte_sum_16": byte_sum,
                    "decoder": DECODER_NAME,
                }
            )

    return binaries.mapInPandas(batches, schema=FEATURE_SCHEMA)


def decode_media(
    binaries: DataFrame,
    decoder: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Extension point for media-specific decoding.

    ``decoder`` is a deployment-supplied batch function (pandas in,
    pandas out — e.g. PIL pixel decode, librosa resample, pyav frame
    sample) and ``schema`` its output schema. The engine contributes the
    scale plumbing: Arrow-batched streaming, batch-bounded executor
    memory, narrow-map execution (no shuffle), empty-batch handling.
    Decoders for media types a deployment cannot handle should emit
    their rows with a null/sentinel feature column — by contract nothing
    in the engine raises on unknown media types.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            yield decoder(pdf)

    return binaries.mapInPandas(batches, schema=schema)
