"""Second-stage reranking: provider contract + HTTP reranker + Spark op.

Completes the retrieval stack (BM25 lexical → ANN semantic →
**rerank**): a cross-encoder-style provider scores (query, document)
pairs and the final ranking reorders the FIRST-STAGE candidates only —
the corpus is never touched again.

* :class:`HttpReranker` speaks the Cohere-style ``/rerank`` contract
  (``{"model", "query", "documents", "top_n"}`` →
  ``{"results": [{"index", "relevance_score"}]}``) that most hosted
  rerankers and local TEI/vLLM servers expose, with the same
  retry/backoff discipline as ``ai/llm.py``'s chat provider
  (429/5xx → exponential backoff, other 4xx → raise).
* :class:`TokenOverlapReranker` is the deterministic offline provider:
  Jaccard overlap between the query's and document's token SETS, using
  the catalog's exact tokenization (lower → collapse whitespace →
  split) — so the full distributed path is differential-testable
  against a DuckDB oracle (``t_rerank_topk``) with zero network.
* :func:`rerank_candidates` runs the provider over candidates with an
  Arrow-batched ``mapInPandas`` and an executor-local provider cache
  (one client per executor, the ``ai/mapping.py`` pattern) — batch
  shape, schema, and partitioning are the real plumbing a hosted
  reranker rides.

Scale: reranking is O(queries × first-stage-k), bounded by
construction; the final cutoff is ``orderBy().limit(k)`` + rank over
≤ k rows — the repo's sanctioned TakeOrdered shape, never a global
window.
"""

from __future__ import annotations

import json
import re
import time
import urllib.error
import urllib.request
from collections.abc import Callable, Sequence
from typing import Any, Protocol

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "RerankProvider",
    "HttpReranker",
    "TokenOverlapReranker",
    "rerank_candidates",
    "rerank_topk",
]


class RerankProvider(Protocol):
    """Scores documents against one query; higher = more relevant."""

    def rerank(self, query: str, docs: Sequence[str]) -> list[float]: ...


def _ws_tokens(text: str) -> list[str]:
    """The catalog tokenization (functions/text.tokens twin): lower,
    collapse whitespace, trim, split on single spaces."""
    collapsed = re.sub(r"\s+", " ", text.lower()).strip()
    return collapsed.split(" ") if collapsed else []


class TokenOverlapReranker:
    """Deterministic offline reranker: Jaccard overlap of token sets.

    Engine-portable by construction — one integer intersection, one
    integer union, one float division — so pipelines built on it are
    oracle-checkable end-to-end.  Swap in :class:`HttpReranker` for a
    hosted cross-encoder; the Spark plumbing is identical.
    """

    def __init__(self, query_tokens: "Sequence[str] | None" = None) -> None:
        self._qtoks = set(query_tokens) if query_tokens is not None else None

    def rerank(self, query: str, docs: Sequence[str]) -> list[float]:
        q = self._qtoks if self._qtoks is not None else set(_ws_tokens(query))
        out = []
        for d in docs:
            dt = set(_ws_tokens(d))
            inter = len(q & dt)
            union = len(q | dt)
            out.append(inter / union if union else 0.0)
        return out


class HttpReranker:
    """Cohere-style ``/rerank`` HTTP provider with retry/backoff.

    ``base_url`` points at any compatible server (hosted API, local
    TEI/vLLM); the endpoint is ``{base_url}/rerank``.  429 and 5xx
    retry with capped exponential backoff; other 4xx raise immediately
    (a malformed request never heals).  Scores come back positionally
    re-aligned via the response's ``index`` field, so callers can zip
    them with their input order.
    """

    def __init__(
        self,
        model: str,
        *,
        api_key: str,
        base_url: str,
        max_retries: int = 3,
        timeout: float = 30.0,
        backoff_cap: float = 60.0,
        sleeper: Callable[[float], None] = time.sleep,
    ) -> None:
        self.model = model
        self.url = f"{base_url.rstrip('/')}/rerank"
        self.headers = {
            "Content-Type": "application/json",
            "Authorization": f"Bearer {api_key}",
        }
        self.max_retries = max_retries
        self.timeout = timeout
        self.backoff_cap = backoff_cap
        self._sleep = sleeper

    def _post(self, payload: dict[str, Any]) -> tuple[int, Any]:
        req = urllib.request.Request(
            self.url,
            data=json.dumps(payload).encode("utf-8"),
            method="POST",
            headers=dict(self.headers),
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                raw, status = resp.read(), resp.status
        except urllib.error.HTTPError as exc:
            raw, status = exc.read(), exc.code
        try:
            return status, json.loads(raw)
        except ValueError:
            return status, raw.decode("utf-8", errors="replace")

    def rerank(self, query: str, docs: Sequence[str]) -> list[float]:
        if not docs:
            return []
        payload = {
            "model": self.model,
            "query": query,
            "documents": list(docs),
            "top_n": len(docs),
        }
        last: Any = None
        for attempt in range(self.max_retries + 1):
            status, body = self._post(payload)
            if status == 200 and isinstance(body, dict) and "results" in body:
                scores = [0.0] * len(docs)
                for r in body["results"]:
                    scores[int(r["index"])] = float(r["relevance_score"])
                return scores
            last = (status, body)
            if status == 429 or status >= 500:
                if attempt < self.max_retries:  # no dead sleep before the raise
                    self._sleep(min(2**attempt, self.backoff_cap))
                continue
            break
        raise RuntimeError(f"rerank failed after retries: {last}")


# executor-local provider cache — ai/mapping.py's implementation, keyed
# by the factory's qualified name (an id()-keyed cache misses on every
# task, since closures re-deserialize per task, and can collide after
# CPython address reuse)
from .mapping import _cached_provider as _cached  # noqa: E402


def rerank_candidates(
    candidates: DataFrame,
    query: str,
    provider_factory: Callable[[], Any],
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "rerank_score",
) -> DataFrame:
    """Score first-stage candidates against ``query`` with the provider.

    Output: ``id_col, score_col`` (adds to whatever granularity the
    candidate frame has; text is dropped post-scoring).  Arrow-batched
    ``mapInPandas`` — each batch makes ONE provider call with the whole
    document list, matching hosted rerankers' batch APIs.
    """
    import pandas as pd

    id_type = candidates.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, {score_col} double"

    def score(batches):
        provider = _cached(provider_factory)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            scores = provider.rerank(query, pdf[text_col].tolist())
            yield pd.DataFrame({id_col: pdf[id_col], score_col: scores})

    return candidates.select(id_col, text_col).mapInPandas(score, out_schema)


def rerank_topk(
    df: DataFrame,
    terms: list[str],
    provider_factory: Callable[[], Any],
    first_stage_k: int = 50,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    rank_col: str = "rank",
) -> DataFrame:
    """BM25 recall (top ``first_stage_k``) → provider rerank → top ``k``.

    Output: ``id_col, bm25_score, rerank_score, rank``.  The rerank
    stage touches exactly ``first_stage_k`` rows; the final cutoff is a
    distributed TakeOrdered + rank over ≤ k rows.  Ties break on bm25
    then id, so the ranking is total and reproducible.
    """
    from ..operators.retrieval import bm25_topk

    first = bm25_topk(
        df, terms, k=first_stage_k, id_col=id_col, text_col=text_col
    ).select(id_col, F.col("score").alias("bm25_score"))
    cands = first.join(df.select(id_col, text_col), id_col)
    scored = rerank_candidates(
        cands, " ".join(terms), provider_factory, id_col=id_col, text_col=text_col
    )
    merged = first.join(scored, id_col)
    top = merged.orderBy(
        F.col("rerank_score").desc(), F.col("bm25_score").desc(), F.col(id_col)
    ).limit(k)
    w = Window.orderBy(
        F.col("rerank_score").desc(), F.col("bm25_score").desc(), F.col(id_col)
    )
    return top.withColumn(rank_col, F.row_number().over(w))
