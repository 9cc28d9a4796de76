"""LLM / embedding operators.

Re-expresses the reference's AI surface Spark-first:

* :mod:`embeddings` — batched embedding generation as an Arrow-vectorized
  pandas UDF with an executor-local provider cache and a deterministic
  hash fallback for offline tests (reference
  ``/root/reference/src/spark_fuse/utils/llm.py:53-236`` and
  ``similarity/embedding.py:25-65,186-303``).
* :mod:`rerank` — second-stage retrieval reranking: Cohere-style
  ``/rerank`` HTTP provider plus a deterministic token-overlap stand-in,
  over an Arrow-batched distributed scorer (``t_rerank_topk`` is the
  oracle-checked pipeline twin).
* :mod:`mapping` — semantic column normalization onto a closed target
  set.  The reference calls the LLM from a row-at-a-time UDF with a
  per-executor memo (``utils/llm.py:416-561``); here the plan is
  rewritten distinct-first — map only ``select(col).distinct()`` and
  broadcast the mapping back — so LLM calls scale with cardinality, not
  row count (SURVEY.md §4.3.4: orders of magnitude fewer calls at
  100 TB).
"""

from spark_fuse_spark.ai.embeddings import HashEmbeddingProvider, with_embeddings
from spark_fuse_spark.ai.mapping import ClosedSetMatcher, map_column_with_llm
from spark_fuse_spark.ai.rerank import HttpReranker, TokenOverlapReranker, rerank_topk

__all__ = [
    "with_embeddings",
    "HashEmbeddingProvider",
    "map_column_with_llm",
    "ClosedSetMatcher",
    "HttpReranker",
    "TokenOverlapReranker",
    "rerank_topk",
]
