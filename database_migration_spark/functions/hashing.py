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

# Mersenne prime 2^31-1: modulus for the minhash permutation family.
# Chosen so a*x + b stays exact in SIGNED 64-BIT on every engine:
# (p-1)^2 + (p-1) < 2^62 — no 128-bit product, no overflow, yet the
# modulus genuinely wraps, which is what makes the permutations
# independent. (A first attempt used 2^61-1 with pre-reduced operands
# small enough that a*x never reached the modulus — making every
# "permutation" a monotone map of the same value, so all 32 minhashes
# picked the same shingle and LSH buckets collapsed into giant
# common-shingle clusters: 260k candidates for 251 true pairs at sf0.1.)
MERSENNE_31 = (1 << 31) - 1


def md5_long(col: Column | str) -> Column:
    """First 60 bits of md5 as a non-negative bigint (portable).

    DuckDB equivalent: ``('0x' || substr(md5(x), 1, 15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """The same 60-bit md5 integer, as DuckDB SQL text."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def md5_long_spark_sql(expr: str) -> str:
    """The same 60-bit md5 integer as Spark-SQL text (identical to the
    :func:`md5_long` Column form: conv hex→dec, cast long) — for hot
    builders bundling expressions into one ``F.expr``/``selectExpr``
    (the r12 driver-build convention)."""
    return f"bigint(conv(substring(md5({expr}), 1, 15), 16, 10))"


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
    """One universal-hash permutation h(x) = (a·(x mod p) + b) mod p,
    p = 2^31-1.

    The 60-bit md5 value is reduced mod p first; with a, b < p every
    intermediate fits signed 64-bit exactly (max (p-1)^2 + (p-1) < 2^62)
    in both Spark and any BIGINT SQL engine, and the outer mod actually
    wraps — a*x spans ~2^62 over a 2^31 modulus — so distinct (a, b)
    give genuinely independent orderings of the shingle space. 31-bit
    minhash values are ample: per-permutation collision odds for two
    random shingle sets are |S|/2^31.
    """
    x = hash_col % F.lit(MERSENNE_31)
    return (x * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_31)


def minhash_permuted_sql(hash_expr: str, a: int, b: int) -> str:
    """The same permutation as DuckDB SQL text — keep in lockstep with
    :func:`minhash_permuted` (one source for both engines)."""
    return f"((({hash_expr}) % {MERSENNE_31}) * {a} + {b}) % {MERSENNE_31}"


def permutation_params(n: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for n minhash permutations (LCG on seed):
    a ∈ [1, p-1], b ∈ [0, p-1]."""
    params = []
    state = seed
    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state >> 16) % (MERSENNE_31 - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MERSENNE_31
        params.append((a, b))
    return params
