"""In-engine PCA: exact-integer covariance + bounded-round power iteration.

Promoted from the ``v_pca_power`` / ``v_pca_project`` catalog queries so the
machinery is callable as a library (the catalog entries are now thin
wrappers).  Three composable stages:

* :func:`quantize_vectors` — fixed-point quantization of a vector column
  (2^-20 units by default) so every downstream moment is an INTEGER sum:
  bit-identical across engines/partitionings, no float-summation order
  sensitivity.
* :func:`exact_covariance_matrix` — ONE corpus pass reduces the upper
  triangle of the d×d second-moment matrix (posexplode → map-side-combined
  partial agg to d(d+1)/2 cells; decimal(38)-widened sums), then centers it
  exactly as n·S − m·mᵀ before a single decimal→double cast.
* :func:`power_iteration` — bounded rounds of pure panel algebra on
  d-row / 1-row frames; every float fold is in explicit written order
  (zip_with + left aggregate), so independent engines walk bit-identical
  IEEE trajectories.  BOUNDED-ROUND semantics: the caller budgets rounds,
  the engine never loops to an unbounded fixpoint.

Scale: the corpus pass is an O(rows × d²/2) partial-agg'd shuffle to a
CONSTANT d(d+1)/2 cells; iterations touch only d-sized panels (no corpus
re-scan, no driver collect); scoring is one corpus scan against a
broadcast (component, means, n) panel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "quantize_vectors",
    "exact_covariance_matrix",
    "power_iteration",
    "pca_dominant_component",
    "pca_projection_scores",
]


def quantize_vectors(
    df: DataFrame, vec_col: str = "embedding", scale: int = 1 << 20, keep: "tuple[str, ...]" = ()
) -> DataFrame:
    """(keep..., q array<bigint>) — round-half-up fixed-point quantization."""
    cols = [F.col(c) for c in keep]
    return df.select(
        *cols,
        F.expr(
            f"transform(CAST({vec_col} AS ARRAY<DOUBLE>),"
            f" x -> CAST(floor(x * {scale}.0 + 0.5) AS BIGINT))"
        ).alias("q"),
    )


def exact_covariance_matrix(
    q: DataFrame,
) -> "tuple[DataFrame, DataFrame, DataFrame]":
    """(mat, means, n_t) from a quantized ``q`` column.

    ``mat``: d rows (i, carr array<double>) — row i of the exact centered
    moment matrix n·S − m·mᵀ (proportional to covariance; scaling cancels
    in the Rayleigh quotient / normalization).  ``means``: d rows
    (i, m decimal) of column sums.  ``n_t``: 1-row count panel.  ``mat``
    and ``means`` are eagerly checkpointed — they feed every iteration.

    The O(rows × d²/2) moment pass sums 64-bit longs, not decimals (a
    measured ~2× on the corpus stage): each product ``xi·xj`` is split
    into an exact non-negative low half ``pmod(p, 2³⁰)`` and the
    matching floor-quotient high half, both long-summed and recombined
    in decimal per cell — bit-identical to the direct decimal sum.
    Width bound: |x_q| ≤ 2²⁴ at the default 2²⁰ scale ⇒ |p| ≤ 2⁴⁸,
    |hi| ≤ 2¹⁸, lo < 2³⁰, so the long partials overflow only past
    ~2³³ (≈8.6·10⁹) rows; shrink ``scale`` (or the split radix) past
    that.  The d-sized column sums are long-safe to ~2³⁹ rows.
    """
    n_t = q.agg(F.count(F.lit(1)).alias("n"))
    first = q.select(F.posexplode("q").alias("i", "xi"), "q")
    pairs = first.select("i", "xi", F.posexplode("q").alias("j", "xj")).where(
        F.col("j") >= F.col("i")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    radix = 1 << 30
    p = F.col("xi") * F.col("xj")
    cells = (
        pairs.withColumn("__lo", F.pmod(p, F.lit(radix)))
        .withColumn("__hi", F.expr(f"(xi * xj - pmod(xi * xj, {radix}L)) DIV {radix}L"))
        .groupBy("i", "j")
        .agg(F.sum("__hi").alias("__sh"), F.sum("__lo").alias("__sl"))
        .select("i", "j", (dec(F.col("__sh")) * F.lit(radix) + F.col("__sl")).alias("s"))
    )
    means = (
        first.groupBy("i")
        .agg(dec(F.sum(F.col("xi"))).alias("m"))
        .localCheckpoint()
    )
    mi = means.select(F.col("i").alias("mi_i"), F.col("m").alias("mi"))
    mj = means.select(F.col("i").alias("mj_j"), F.col("m").alias("mj"))
    cn = (
        cells.join(F.broadcast(mi), F.col("i") == F.col("mi_i"))
        .join(F.broadcast(mj), F.col("j") == F.col("mj_j"))
        .crossJoin(F.broadcast(n_t))
        .select(
            "i",
            "j",
            (dec(F.col("n")) * F.col("s") - F.col("mi") * F.col("mj"))
            .cast("double")
            .alias("c"),
        )
    )
    fullm = cn.select("i", "j", "c").unionAll(
        cn.where(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "c"
        )
    )
    mat = (
        fullm.groupBy("i")
        .agg(
            F.expr("transform(sort_array(collect_list(struct(j, c))), s -> s.c)").alias(
                "carr"
            )
        )
        .localCheckpoint()  # the d-row matrix feeds every iteration
    )
    return mat, means, n_t


def power_iteration(
    spark: SparkSession, mat: DataFrame, dims: int, iters: int
) -> "tuple[DataFrame, DataFrame, DataFrame]":
    """(v, v_prev, wp) after ``iters`` bounded rounds from the deterministic
    all-positive start vector (fixes the eigenvector sign).

    ``v``: 1-row (varr) final normalized vector; ``v_prev``: the vector one
    round earlier; ``wp``: the final un-normalized matvec — together they
    give the Rayleigh quotient λ ≈ v_prevᵀ·w without another corpus touch.
    """
    if iters < 1:
        # iters=0 would return wp=None (callers crossJoin it) and iters=1's
        # Rayleigh quotient uses the start vector, so it must be unit-norm
        raise ValueError(f"power_iteration requires iters >= 1, got {iters}")
    dot_expr = (
        "aggregate(zip_with(carr, varr, (x, y) -> x * y), 0.0D, (acc, t) -> acc + t)"
    )
    # unit-norm all-positive start (1/sqrt(dims)) so a single-round Rayleigh
    # quotient is correctly scaled for ANY dims (0.125 was only right for 64)
    v = spark.range(1).select(
        F.expr(
            f"transform(sequence(1, {dims}), k -> 1.0D / sqrt(double({dims})))"
        ).alias("varr")
    )
    v_prev = v
    wp = None
    for _ in range(iters):
        v_prev = v
        w = mat.crossJoin(F.broadcast(v)).select("i", F.expr(dot_expr).alias("w"))
        wp = w.agg(
            F.expr("transform(sort_array(collect_list(struct(i, w))), s -> s.w)").alias(
                "warr"
            )
        )
        v = wp.select(
            F.expr(
                "transform(warr, x -> x / sqrt(aggregate(transform(warr, y -> y * y),"
                " 0.0D, (acc, t) -> acc + t)))"
            ).alias("varr")
        )
    return v, v_prev, wp


def pca_dominant_component(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int = 64,
    scale: int = 1 << 20,
    iters: int = 6,
) -> DataFrame:
    """(dim, loading, eigenvalue) — the dominant principal component of the
    vector corpus, loadings floored to 1e-6 and the Rayleigh-quotient
    eigenvalue (rescaled back to input units) to 1e-4."""
    q = quantize_vectors(df, vec_col, scale)
    mat, _, n_t = exact_covariance_matrix(q)
    v, v_prev, wp = power_iteration(spark, mat, dims, iters)
    lam = v_prev.crossJoin(wp).select(
        F.expr(
            "aggregate(zip_with(varr, warr, (x, y) -> x * y), 0.0D,"
            " (acc, t) -> acc + t)"
        ).alias("lam_raw")
    )
    return (
        v.crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(n_t))
        .select(F.posexplode("varr").alias("dim", "x"), "lam_raw", "n")
        .select(
            F.col("dim").cast("long").alias("dim"),
            (F.floor(F.col("x") * 1000000 + 0.5) / 1000000).alias("loading"),
            (
                F.floor(
                    F.col("lam_raw")
                    / (F.col("n").cast("double") * F.col("n") * float(scale) ** 2)
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("eigenvalue"),
        )
        .orderBy("dim")
    )


def pca_projection_scores(
    spark: SparkSession,
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    scale: int = 1 << 20,
    iters: int = 6,
) -> DataFrame:
    """(id_col, score) — every vector's exactly-centered score along the
    dominant component, in input units.  The centering folds the INTEGER
    (n·x_q − m) against the component in written order, so both engines of
    a differential oracle replay the identical IEEE trajectory; display
    rounding is the caller's business."""
    q = quantize_vectors(df, vec_col, scale, keep=(id_col,))
    mat, means, n_t = exact_covariance_matrix(q.select("q"))
    v, _, _ = power_iteration(spark, mat, dims, iters)
    marr = means.agg(
        F.expr(
            "transform(sort_array(collect_list(struct(i, m))), s -> CAST(s.m AS DOUBLE))"
        ).alias("marr")
    )
    score_expr = (
        "aggregate(zip_with(zip_with(q, marr, (xq, m) -> CAST(n AS DOUBLE) * xq - m),"
        " varr, (cx, vk) -> cx * vk), 0.0D, (acc, t) -> acc + t)"
    )
    return (
        q.crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(marr))
        .crossJoin(F.broadcast(n_t))
        .select(
            id_col,
            (
                F.expr(score_expr)
                / (F.col("n").cast("double") * F.col("n") * float(scale))
            ).alias("score"),
        )
    )
