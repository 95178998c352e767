"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as ``binary`` columns with a typed
metadata struct, processed by Arrow-batched ``mapInPandas`` — the schema,
partitioning, UDF signature, and batch shape are real and tested; the
actual media DECODE step is stubbed (the decode libraries are not in this
environment) behind :func:`_decode_stub`, which raises
``NotImplementedError`` when a real codec is requested and otherwise
produces deterministic byte-level features that the DuckDB oracle can
recompute from the source text.

At scale: payloads ride in parquet binary columns; ``mapInPandas``
streams Arrow record batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``), so executor memory is
batch-bounded regardless of corpus size, and the extraction is a narrow
map — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, head_md5 string, byte_sum_16 long, decoder string"
)


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


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for a media decoder.

    A real build would dispatch on media_type to PIL/librosa/pyav; those
    libraries are unavailable here, so any real media type raises and the
    octet-stream path computes byte-level features.
    """
    if media_type not in ("application/octet-stream",):
        raise NotImplementedError(
            f"media decode for {media_type!r} requires codec libraries "
            "not present in this environment"
        )
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
        "decoder": "stub-v1",
    }


def extract_features(binaries: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    Byte features are computed with numpy over the CONCATENATED head
    bytes of the whole batch (frombuffer + bincount-segmented sums) —
    no per-row Python arithmetic; the only per-row call left is
    hashlib.md5, a C digest with no vectorized equivalent. Output is
    bit-identical to the old per-row _decode_stub loop, which remains
    the single-payload reference implementation (and the raising guard
    for undecodable media types).
    """
    import hashlib

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            payloads = pdf["payload"].to_numpy()
            for m in pd.unique(pdf["media_type"]):
                if m != "application/octet-stream":
                    _decode_stub(b"", m)  # raises NotImplementedError
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
                    "decoder": "stub-v1",
                }
            )

    return binaries.mapInPandas(batches, schema=FEATURE_SCHEMA)
