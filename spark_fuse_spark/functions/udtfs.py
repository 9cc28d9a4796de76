"""Python UDTFs (Spark 4 table functions).

The reference defines no UDTF (SURVEY.md §2.10); Spark 4's Python UDTF
class is the idiomatic gap-filler for one-row → many-rows library logic
that SQL callers need as a table source (``LATERAL`` joins).  Arrow
batching applies; each UDTF instance is per-task, so state is local.

``text_chunks`` is the training-data-pipeline staple: overlapping
token-window chunks with stable indices — the unit for embedding long
documents (pairs with ``ai.with_embeddings``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

__all__ = ["TextChunks", "register_udtfs"]


@udtf(returnType="idx int, chunk string, n_tokens int")
class TextChunks:
    """Split text into whitespace-token windows of ``size`` with ``overlap``.

    SQL: ``SELECT d.doc_id, c.* FROM documents d,
    LATERAL text_chunks(d.text, 64, 16) c``.
    """

    def eval(self, text: str, size: int = 64, overlap: int = 16):  # noqa: D401
        if text is None:
            return
        if size <= 0 or overlap < 0 or overlap >= size:
            raise ValueError("need size > 0 and 0 <= overlap < size")
        tokens = text.split()
        if not tokens:
            return
        step = size - overlap
        idx = 0
        for start in range(0, len(tokens), step):
            window = tokens[start : start + size]
            yield idx, " ".join(window), len(window)
            idx += 1
            if start + size >= len(tokens):
                break


def register_udtfs(spark: SparkSession) -> None:
    """Register all UDTFs for SQL use (idempotent per session)."""
    spark.udtf.register("text_chunks", TextChunks)
