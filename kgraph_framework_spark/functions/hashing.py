"""Portable deterministic hashing — identical in Spark and DuckDB.

The correctness gate runs every query twice (Spark DataFrame vs DuckDB SQL)
and hash-compares values, so every hash-dependent operator (MinHash,
SimHash, fingerprinting, LSH banding) needs a hash function both engines
compute bit-identically. Neither engine's native ``hash()`` qualifies
(Spark = Murmur3-32 with seed 42, DuckDB = its own 64-bit mix), but both
expose md5 over UTF-8 strings. We take the first 15 hex chars (60 bits —
fits BIGINT with headroom, no sign issues):

    Spark :  CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB:  ('0x' || substr(md5(s), 1, 15))::BIGINT

Reference analog: the reference's LSH uses random-projection sign bits
packed into uint32 codes (/root/reference/src/index_lsh.cpp:521-546); its
determinism hazard (unseeded rand()) is avoided here by construction —
md5 needs no seed state at all.

The MinHash family is the classic (a*h + b) mod p universal family over
the 60-bit md5 value reduced mod p first (so a*h stays < 2^63 — exact
int64 arithmetic in both engines). Coefficients are derived from the
function index by fixed arithmetic, NOT an RNG, so the SQL oracle embeds
the very same literals.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: classic universal-hash modulus; keeps a*h < 2^63.
MINHASH_PRIME = 2_147_483_647
# Knuth multiplicative constants for deriving per-function coefficients.
_A_MULT = 2_654_435_761
_B_MULT = 40_503


def portable_hash64(col: Column) -> Column:
    """60-bit md5-based hash, bit-identical to the DuckDB oracle's."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str) -> str:
    """DuckDB SQL for :func:`portable_hash64` applied to ``expr``."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_coeffs(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the (a*h+b) mod p family.

    a must be non-zero mod p; the +1 guarantees it. Pure arithmetic in the
    function index so the SQL oracle generator reproduces the exact values.
    """
    out = []
    for i in range(n_hashes):
        a = (_A_MULT * (2 * i + 1)) % MINHASH_PRIME or 1
        b = (_B_MULT * (i + 1) + 7919 * i * i) % MINHASH_PRIME
        out.append((a, b))
    return out


def minhash_term(hash_col: Column, a: int, b: int) -> Column:
    """(a * (h mod p) + b) mod p as an exact int64 Spark column."""
    p = F.lit(MINHASH_PRIME)
    return F.pmod(F.lit(a) * F.pmod(hash_col, p) + F.lit(b), p)


def minhash_term_sql(hash_expr: str, a: int, b: int) -> str:
    p = MINHASH_PRIME
    return f"(({a} * ({hash_expr} % {p}) + {b}) % {p})"
