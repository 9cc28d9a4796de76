"""Deterministic hash-based sampling for training-data pipelines.

RNG sampling (``df.sample``/``sampleBy``) is irreproducible across engines,
Spark versions, and partitionings — three properties a 100 TB corpus build
cannot give up (re-running a stage must select the SAME documents, and an
audit engine must agree).  Hash-gate sampling fixes all three: a row is
kept iff ``portable_hash64(key || salt) % buckets < fraction * buckets``.

* deterministic — same key+salt → same decision, forever, everywhere;
* engine-portable — the md5-derived hash has an exact DuckDB twin
  (``functions/hashing.py``), so sampling decisions are oracle-checkable;
* partition-independent — the decision is per-row, no coordination, no
  shuffle; it composes with any scan and pushes NOTHING extra over the
  wire;
* salt-addressable — a new salt draws an independent sample; the same
  salt with a larger fraction yields a SUPERSET (nested samples for
  scaling-law runs, since the kept region ``[0, t)`` only grows).

The reference has no sampling surface; this extends the engine per the
training-pipeline brief alongside dedup/quality/token ops.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import portable_hash64

__all__ = ["sample_gate", "hash_sample", "stratified_hash_sample", "train_holdout_split", "resample_weighted"]

BUCKETS = 1_000_000


def sample_gate(key_col: "str | Column", fraction: float, salt: str = "") -> Column:
    """Boolean keep/drop Column for deterministic sampling by ``key_col``.

    ``fraction`` is quantized to millionths (``BUCKETS``); the same
    quantization applies in any SQL twin, keeping decisions bit-identical.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    key = F.col(key_col) if isinstance(key_col, str) else key_col
    h = portable_hash64(F.concat(key.cast("string"), F.lit(salt)))
    return (h % BUCKETS) < int(fraction * BUCKETS)


def hash_sample(df: DataFrame, key_col: str, fraction: float, salt: str = "") -> DataFrame:
    """Keep a deterministic ``fraction`` of rows, decided by ``key_col``."""
    return df.where(sample_gate(key_col, fraction, salt))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: Mapping[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language rates).

    The hash gate is shared across strata; only the threshold varies, so
    changing one stratum's rate never reshuffles another's selection.
    """
    for frac in (*fractions.values(), default_fraction):
        if not 0.0 <= frac <= 1.0:
            raise ValueError("fractions must be in [0, 1]")
    key = F.col(key_col)
    h = portable_hash64(F.concat(key.cast("string"), F.lit(salt)))
    threshold = F.lit(int(default_fraction * BUCKETS))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(frac * BUCKETS))
        ).otherwise(threshold)
    return df.where((h % BUCKETS) < threshold)


def train_holdout_split(
    df: DataFrame, key_col: str, holdout_fraction: float, salt: str = "split"
) -> "tuple[DataFrame, DataFrame]":
    """Disjoint, exhaustive (train, holdout) split by hash gate.

    Every row lands in exactly one side — including future rows with the
    same keys, which makes the holdout leak-proof across pipeline re-runs
    (an RNG split re-drawn on new data would contaminate it).
    """
    gate = sample_gate(key_col, holdout_fraction, salt)
    return df.where(~gate), df.where(gate)


def resample_weighted(
    df: DataFrame,
    key_col: str,
    rate_col: "str | Column",
    salt: str = "mix",
    copy_col: str = "copy_id",
) -> DataFrame:
    """Deterministic up/down-sampling to a per-row target RATE — the
    training-data MIXING operator (replay a source at 1.5×, keep 25% of
    another, drop a third).

    ``rate_col`` ≥ 0 is the expected output multiplicity of the row:
    every row emits ``floor(rate)`` copies plus one more iff its hash
    gate clears the fractional part — so expected output count is
    exactly ``sum(rate)``, and the decision is the same md5 gate as
    :func:`sample_gate` (deterministic, engine-portable, salt-
    addressable).  ``copy_col`` numbers the copies (1..n) for
    provenance / downstream shuffling.

    Scale shape: pure per-row expressions + one explode — no shuffle,
    no RNG; the gate quantizes fractions to millionths exactly like
    ``sample_gate`` so SQL twins stay bit-identical.

    Quantization convention: the fractional-part threshold is
    ``FLOOR(frac * 1e6)`` — floor, never a bare integer cast, because
    Spark's ``CAST(x AS BIGINT)`` truncates while DuckDB's rounds to
    nearest; SQL twins must write ``CAST(FLOOR(...) AS BIGINT)`` to stay
    bit-identical for non-dyadic rates (e.g. 1/3).
    """
    rate = F.col(rate_col) if isinstance(rate_col, str) else rate_col
    key = F.col(key_col)
    h = portable_hash64(F.concat(key.cast("string"), F.lit(salt)))
    base = F.floor(rate).cast("int")
    frac = rate - F.floor(rate)
    extra = ((h % BUCKETS) < F.floor(frac * BUCKETS).cast("long")).cast("int")
    n_copies = base + extra
    copies = F.when(
        n_copies >= 1, F.sequence(F.lit(1), n_copies)
    ).otherwise(F.array().cast("array<int>"))
    return df.withColumn(copy_col, F.explode(copies))


def weighted_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: "str | Column",
    k: int,
    strata_cols: "list[str] | None" = None,
    salt: str = "aes",
    score_col: str = "sample_key",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential sort keys —
    the A-ES scheme (Efraimidis & Spirakis 2006, "Weighted random
    sampling with a reservoir", public paper): each row draws a uniform
    ``u`` and is ranked by ``u^(1/w)``; the top-k of that ranking is an
    exact weighted sample without replacement.

    Determinism: ``u`` comes from the portable md5 hash of
    ``key_col || salt`` quantized to millionths in (0, 1] — no RNG
    state, reruns and SQL twins agree row-for-row.  The rank key is the
    monotone-equivalent ``ln(u)/w`` (descending), avoiding ``pow``
    precision traps; rows with non-positive weight never qualify.

    Shape: one hash gate (narrow) + ONE top-k window per stratum —
    exactly the ``operators.topk`` pattern, so per-stratum state is k
    rows and the shuffle is on the strata key only.  Without strata the
    global draw goes through ``orderBy().limit(k)`` instead, which
    Catalyst executes as TakeOrderedAndProject — per-partition top-k
    then a k-row merge, never a single-partition window.  At 100 TB
    this is how you draw a 10k-document weighted eval slice (per
    language or corpus-wide) without a global sort of the corpus.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    key = F.col(key_col).cast("string")
    h = portable_hash64(F.concat(key, F.lit(salt)))
    u = ((h % BUCKETS) + 1).cast("double") / F.lit(float(BUCKETS))
    score = F.log(u) / w
    scored = df.where(w > 0).withColumn(score_col, score)
    if not strata_cols:
        return scored.orderBy(F.col(score_col).desc(), F.col(key_col).asc()).limit(k)
    from pyspark.sql import Window

    win = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        F.col(score_col).desc(), F.col(key_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(win))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    salt: str = "fold",
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment by key hash: every key lands in
    exactly one of ``k`` folds, stable across runs, engines, and row
    order — the cross-validation / sharded-eval split that cannot leak
    (same key always lands in the same fold, so a document duplicated
    across batches never straddles train/test).

    Same portable-hash contract as :func:`sample_gate`; change ``salt``
    to draw an independent fold assignment.  Pure per-row expression —
    no shuffle, no RNG state.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    key = F.col(key_col).cast("string")
    h = portable_hash64(F.concat(key, F.lit(salt)))
    return df.withColumn(fold_col, (h % k).cast("int"))
