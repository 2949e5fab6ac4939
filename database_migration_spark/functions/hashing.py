"""Deterministic, engine-portable hashing built on md5.

Spark's ``hash()``/``xxhash64()`` are fast but Spark-specific; validation
against external oracles (DuckDB here, any other SQL engine in production)
needs a hash both sides compute identically. md5 is universal; we take the
first 15 hex digits (60 bits — fits a signed 64-bit int) as the integer form.

All helpers return JVM-side Column expressions — no Python UDFs — so they
stay inside whole-stage codegen and scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^61-1: modulus for the minhash permutation family
MERSENNE_61 = (1 << 61) - 1


def md5_long(col: Column | str) -> Column:
    """First 60 bits of md5 as a non-negative bigint (portable).

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """The same 60-bit md5 integer, as DuckDB SQL text."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def md5_slice32(col: Column | str, start: int) -> Column:
    """A 32-bit integer from 8 md5 hex chars at 1-based ``start`` — md5 has
    128 bits, so slices at 1 and 9 are independent 32-bit hashes (SimHash
    uses both to fill a 64-bit fingerprint without touching the BIGINT sign
    bit). DuckDB: ``('0x' || substr(md5(x), start, 8))::BIGINT``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), start, 8), 16, 10).cast("long")


def md5_slice32_sql(expr: str, start: int) -> str:
    return f"CAST(('0x' || substr(md5({expr}), {start}, 8)) AS BIGINT)"


def minhash_permuted(hash_col: Column, a: int, b: int) -> Column:
    """One universal-hash permutation h(x) = (a*x + b) mod p.

    Multiplication of two 61-bit values overflows 64-bit integers, so we work
    modulo 2^61-1 with the operands pre-reduced and split multiplication:
    (a*x) mod p with a < 2^31 keeps every intermediate under 2^92... which
    still overflows. Instead we keep ``a`` under 2^20 and x under 2^40 by
    pre-reducing, trading some mixing quality for exact portable arithmetic
    — the band-bucket LSH only needs uniformity, not cryptography.
    """
    x = hash_col % F.lit(1 << 40)
    return (x * F.lit(a % (1 << 20)) + F.lit(b)) % F.lit(MERSENNE_61)


def minhash_permuted_sql(hash_expr: str, a: int, b: int) -> str:
    return f"((({hash_expr}) % {1 << 40}) * {a % (1 << 20)} + {b}) % {MERSENNE_61}"


def permutation_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for n minhash permutations (LCG on seed)."""
    params = []
    state = seed
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state >> 16) % (1 << 20) | 1  # odd, < 2^20
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE_61
        params.append((a, b))
    return params
