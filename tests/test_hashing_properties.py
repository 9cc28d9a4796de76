"""Property tests for the engine-portable hash family.

The MinHash permutation family runs ``(a*h + b) mod p`` (p = 2^61-1)
entirely in signed-64 long arithmetic via the Mersenne rotation identity
(``functions/hashing.py``) so it stays inside WholeStageCodegen.  The
DuckDB oracle computes the same family with HUGEINT (128-bit) — so the
long-arithmetic trick must be EXACTLY equal to arbitrary-precision
``(a*h+b) % p``, for every coefficient pair and every 60-bit input.
hypothesis drives random inputs through the real Spark expressions and
compares against Python's big-int arithmetic.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_fuse_spark.functions.hashing import (
    MERSENNE_P,
    minhash_coefficients,
    minhash_permutations,
)

# portable_hash64 yields 60-bit non-negative values (15 hex chars)
h_strategy = st.lists(
    st.integers(min_value=0, max_value=(1 << 60) - 1), min_size=1, max_size=50
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(hs=h_strategy, seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_permutations_match_bigint_arithmetic(spark, hs, seed):
    from pyspark.sql import functions as F

    num_hashes = 8
    coeffs = minhash_coefficients(num_hashes, seed)
    df = spark.createDataFrame([(h,) for h in hs], "__h long")
    perms = minhash_permutations(F.col("__h"), num_hashes, seed)
    got = df.select(*[p.alias(f"m{i}") for i, p in enumerate(perms)]).collect()
    for row, h in zip(got, hs):
        for i, (a, b) in enumerate(coeffs):
            expected = (a * h + b) % MERSENNE_P  # Python big-int, exact
            assert row[f"m{i}"] == expected, (h, a, b)


def test_coefficients_deterministic_and_in_range():
    c1 = minhash_coefficients(32, 42)
    c2 = minhash_coefficients(32, 42)
    assert c1 == c2
    assert c1 != minhash_coefficients(32, 43)
    for a, b in c1:
        assert 1 <= a < MERSENNE_P and 0 <= b < MERSENNE_P
