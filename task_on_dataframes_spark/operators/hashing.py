"""Engine-portable deterministic hashing primitives.

Spark's builtin ``hash``/``xxhash64`` are engine-specific, so every
hash that feeds a correctness-checked operator (minhash, simhash,
fingerprints, LSH buckets) is built from **md5**, which DuckDB and
Spark compute identically: the first 8 hex digits parsed as an integer
give a portable 32-bit hash. Verified bit-identical across engines.

The universal-hash family h_i(x) = (a_i * H(x) + b_i) mod P uses
P = 1e9+7 (< 2^30) so a_i * H(x) stays below 2^60 — no int64 overflow
on either engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for the universal hash family; < 2^30 keeps products in int64
MERSENNE_P = 1_000_000_007
#: multiplier for deriving per-permutation coefficients (Knuth)
_KNUTH = 2_654_435_761


def hash32(col: Column) -> Column:
    """Portable 32-bit hash: first 8 hex chars of md5, as bigint."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


def hash32_sql(expr: str) -> str:
    """DuckDB SQL rendering of :func:`hash32` over ``expr``."""
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8)) AS BIGINT)"
    )


def perm_coeffs(i: int) -> tuple[int, int]:
    """Deterministic (a, b) coefficients for permutation ``i``."""
    a = (_KNUTH * (2 * i + 1)) % MERSENNE_P
    b = (_KNUTH * (i + 7) + 13) % MERSENNE_P
    return (a if a else 1, b)


def perm_hash(h: Column, i: int) -> Column:
    """h_i(x) = (a_i * H(x) + b_i) mod P over a precomputed hash col."""
    a, b = perm_coeffs(i)
    return (F.lit(a) * (h % MERSENNE_P) + F.lit(b)) % MERSENNE_P


def perm_hash_sql(hexpr: str, i: int) -> str:
    a, b = perm_coeffs(i)
    return f"(({a} * (({hexpr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P})"
