"""Vector math over ``array<float|double>`` columns, JVM-side.

The reference prepares vectors for cosine similarity by converting to
MLlib vectors and L2-normalizing
(``/root/reference/src/spark_fuse/similarity/metrics.py:78-92``).  Here
the same math is expressed with Spark higher-order functions
(``zip_with`` / ``aggregate`` / ``transform``) directly over array
columns — no VectorUDT boxing, no Python, fully codegen-friendly, and
the arrays stay Arrow-compatible for any pandas-UDF consumers.

All arithmetic is done in ``double`` regardless of the storage type so
results are deterministic and match SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "dot",
    "l2_norm",
    "l2_normalize",
    "cosine_similarity",
    "euclidean_distance",
    "truncate_renormalize",
]


def _d(col: "str | Column") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: "str | Column", b: "str | Column") -> Column:
    """Dot product; left-to-right summation → engine-reproducible."""
    prods = F.zip_with(_d(a), _d(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: "str | Column") -> Column:
    sq = F.aggregate(_d(a), F.lit(0.0), lambda acc, v: acc + v * v)
    return F.sqrt(sq)


def l2_normalize(a: "str | Column") -> Column:
    """Unit vector (zero vector maps to itself, matching MLlib Normalizer)."""
    arr = _d(a)
    nrm = l2_norm(arr)
    return F.when(nrm == 0.0, arr).otherwise(F.transform(arr, lambda v: v / nrm))


def cosine_similarity(a: "str | Column", b: "str | Column") -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def euclidean_distance(a: "str | Column", b: "str | Column") -> Column:
    diffs = F.zip_with(_d(a), _d(b), lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v))


def truncate_renormalize(a: "str | Column", dims: int) -> Column:
    """Matryoshka-style embedding compression: keep the first ``dims``
    components and L2-renormalize the prefix — the storage/compute trade
    MRL-trained encoders support (a 64→16 truncation quarters vector
    bytes and ANN cost; cosine rankings degrade gracefully).  Pure
    higher-order expressions: ``slice`` + one fold for the prefix norm;
    zero-norm prefixes come back as NULL rather than dividing by zero.
    """
    pre = F.slice(_d(a), 1, dims)
    n = F.sqrt(F.aggregate(pre, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when(n > 0, F.transform(pre, lambda x: x / n))
