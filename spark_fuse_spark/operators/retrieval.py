"""Lexical retrieval scoring: BM25 and reciprocal-rank fusion.

The retrieval half of a RAG/data-curation stack (the vector half lives
in ``operators.similarity`` / ``operators.quantization``): score
documents against a term query with Okapi BM25 (Robertson et al., TREC-3
— the Lucene-default formula) and fuse lexical + semantic rankings with
RRF (Cormack, Clarke & Buettcher 2009: ``Σ 1/(k + rank)`` beats either
ranking alone and needs no score calibration).

Scale shape:

* the term set is tiny (a user query) — filtering the exploded token
  stream to it is a broadcast-free ``isin`` prune that drops ~all rows
  BEFORE the per-(doc, term) tf aggregate, so the only wide shuffle is
  keyed by doc_id on the surviving rows;
* document length and the corpus average come from one narrow aggregate
  each (1-row avgdl panel broadcast); per-term document frequencies
  aggregate to |terms| rows, broadcast back;
* the per-document score adds its per-term contributions in FIXED
  term order (one MAX-pivot column per term, summed explicitly) — never
  a float SUM over rows whose order the engine chooses, so scores are
  bit-reproducible and SQL-twin-checkable;
* RRF consumes rankings (already k-bounded relations) and is a pair of
  rank-equi joins — nothing scales with the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens

__all__ = ["bm25_scores", "bm25_topk", "rrf_fuse", "ranking_metrics", "ideal_dcg"]


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document BM25 score for a bag-of-terms query.

    Output: ``id_col, score`` for every document matching ≥1 term.
    idf is the Lucene variant ``ln(1 + (N − df + 0.5)/(df + 0.5))`` —
    always positive, so stopword-ish terms dampen rather than flip
    scores.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    dl = toks.select(id_col, F.size("__toks").cast("double").alias("__dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("__N"),
        (F.sum("__dl") / F.count("*")).alias("__avgdl"),
    )
    hits = (
        toks.select(F.col(id_col), F.explode("__toks").alias("__term"))
        .where(F.col("__term").isin(list(terms)))
        .groupBy(id_col, "__term")
        .agg(F.count("*").cast("double").alias("__tf"))
    )
    dfreq = hits.groupBy("__term").agg(F.count("*").cast("double").alias("__df"))
    scored = (
        hits.join(F.broadcast(dfreq), "__term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    idf = F.log(1.0 + (F.col("__N") - F.col("__df") + 0.5) / (F.col("__df") + 0.5))
    tf_part = (F.col("__tf") * (k1 + 1.0)) / (
        F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
    )
    per_term = scored.select(F.col(id_col), "__term", (idf * tf_part).alias("__s"))

    # fixed-order summation: one exact MAX-pivot column per query term,
    # added left-to-right — float row-SUM order is engine-chosen and
    # would make scores irreproducible
    pivots = [
        F.max(F.when(F.col("__term") == t, F.col("__s"))).alias(f"__s_{i}")
        for i, t in enumerate(terms)
    ]
    per_doc = per_term.groupBy(id_col).agg(*pivots)
    total: Column = F.coalesce(F.col("__s_0"), F.lit(0.0))
    for i in range(1, len(terms)):
        total = total + F.coalesce(F.col(f"__s_{i}"), F.lit(0.0))
    return per_doc.select(F.col(id_col), F.round(total, 6).alias("score"))


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k BM25 ranking: ``id_col, score, rank`` with the id tie-break.

    Scale shape: the cutoff is ``orderBy().limit(k)`` — Catalyst plans a
    distributed TakeOrderedAndProject (per-partition top-k, then a k-row
    merge), so every document containing a common term never funnels into
    one task.  Ranks are then assigned by a window over the ≤ k surviving
    rows — bounded by the constant k, never by the corpus.  (The naive
    ``row_number().over(Window.orderBy(score))`` + filter plans a
    single-partition WindowExec over ALL scored documents — the classic
    scale-killer this function exists to avoid.)
    """
    scores = bm25_scores(df, terms, id_col, text_col, k1, b)
    top = scores.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return top.withColumn(rank_col, F.row_number().over(w))


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    how: str = "inner",
) -> DataFrame:
    """Reciprocal-rank fusion of ≥2 rankings sharing ``id_col``.

    Output: ``id_col, rrf_score, rank_0..rank_{n-1}`` where
    ``rrf_score = Σᵢ 1/(k + rankᵢ)`` added in list order (fixed-order
    float sum, reproducible).  ``how='inner'`` keeps ids present in
    every ranking; ``'full'`` keeps all, with absent rankings simply
    contributing nothing (the standard RRF convention).
    """
    if len(rankings) < 2:
        raise ValueError("need at least two rankings to fuse")
    out = rankings[0].select(F.col(id_col), F.col(rank_col).alias("rank_0"))
    for i, r in enumerate(rankings[1:], start=1):
        out = out.join(
            r.select(F.col(id_col), F.col(rank_col).alias(f"rank_{i}")),
            id_col,
            "inner" if how == "inner" else "full_outer",
        )
    score: Column = F.when(
        F.col("rank_0").isNotNull(), 1.0 / (k + F.col("rank_0"))
    ).otherwise(F.lit(0.0))
    for i in range(1, len(rankings)):
        score = score + F.when(
            F.col(f"rank_{i}").isNotNull(), 1.0 / (k + F.col(f"rank_{i}"))
        ).otherwise(F.lit(0.0))
    return out.select(
        F.col(id_col),
        F.round(score, 6).alias("rrf_score"),
        *[F.col(f"rank_{i}") for i in range(len(rankings))],
    )


def ideal_dcg(k: int) -> float:
    """IDCG@k for binary relevance with all k slots relevant:
    ``Σ_{p=1..k} 1/log2(p+1)`` — a plain Python constant so the Spark
    side and any SQL oracle inline the identical literal."""
    import math

    return sum(1.0 / math.log2(p + 1) for p in range(1, k + 1))


def ranking_metrics(
    system: DataFrame,
    truth: DataFrame,
    k: int,
    query_id: str = "query_id",
    neighbor_id: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query retrieval-quality metrics of ``system`` against ``truth``.

    ``system`` is a ranked run (``query_id, neighbor_id, rank`` with
    rank 1..k); ``truth`` holds the relevant ids per query (its ranks are
    ignored — binary relevance).  Returns one row per query:

    * ``n_relevant`` — hits among the top-k;
    * ``precision_at_k`` — hits / k;
    * ``mrr`` — 1/rank of the first hit (0.0 when none);
    * ``ndcg`` — ``Σ rel_p / log2(p+1)`` over system positions,
      normalized by the all-relevant IDCG@k (binary-relevance NDCG,
      Järvelin & Kekäläinen 2002).

    The in-engine eval loop for ANN/rerank pipelines: both inputs are
    k-bounded relations (a few rows per query), so the join and the
    aggregate cost nothing next to producing the rankings — run it after
    every index build instead of sampling offline.  log2 is computed as
    ``ln(x)/ln(2)`` on both engines; metrics round to 6 dp.
    """
    # distinct: duplicate (query, neighbor) rows in a caller's truth set
    # would otherwise multiply system rows through the join and inflate
    # every metric
    rel_flag = (
        truth.select(query_id, neighbor_id).distinct().withColumn("__rel", F.lit(1))
    )
    rel = system.select(query_id, neighbor_id, rank_col).join(
        rel_flag, [query_id, neighbor_id], "left"
    ).withColumn("__rel", F.coalesce("__rel", F.lit(0)))
    idcg = ideal_dcg(k)
    # DCG folds LEFT-TO-RIGHT over rank order (sort_array + F.aggregate),
    # not a plain F.sum: float addition isn't associative, the engine picks
    # the row order for sum(), and the repo's determinism contract (see
    # km_survival / t_keyword_rake) requires the 6-dp rounding to match the
    # DuckDB oracle bit-for-bit even on near-ties.
    rank_rel = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(rank_col).cast("int").alias("r"), F.col("__rel").alias("rel")
            )
        )
    )
    dcg = F.aggregate(
        rank_rel,
        F.lit(0.0),
        lambda a, x: a
        + x["rel"].cast("double")
        / (F.log(x["r"].cast("double") + F.lit(1.0)) / F.log(F.lit(2.0))),
    )
    return (
        rel.groupBy(query_id)
        .agg(
            F.sum("__rel").alias("n_relevant"),
            F.round(F.sum("__rel") / F.lit(float(k)), 6).alias("precision_at_k"),
            F.round(
                F.coalesce(
                    F.lit(1.0)
                    / F.min(F.when(F.col("__rel") == 1, F.col(rank_col))),
                    F.lit(0.0),
                ),
                6,
            ).alias("mrr"),
            F.round(dcg / F.lit(idcg), 6).alias("ndcg"),
        )
        .orderBy(query_id)
    )
