"""Embedding generation as vectorized pandas UDFs.

Provider contract: a zero-arg factory returning an object with
``embed_batch(texts: list[str]) -> list[list[float]]``.  The factory is
what ships to executors (clients/models are rarely picklable — reference
``utils/llm.py:104-124`` factory pattern); the constructed provider is
cached per executor process keyed by the factory's qualified name
(reference ``similarity/embedding.py:21,124-183`` executor-local
singleton).

Offline default: :class:`HashEmbeddingProvider` — sha256 → unit vector,
deterministic across engines and processes (reference stub semantics,
``similarity/embedding.py:25-65``).  Real deployments plug in a
sentence-transformers or API-backed provider via the same factory hook;
those libraries aren't in this container.
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, FloatType

__all__ = ["HashEmbeddingProvider", "with_embeddings", "hash_embed_one"]

_PROVIDER_CACHE: dict[str, object] = {}


class HashEmbeddingProvider:
    """Deterministic offline embedder: sha256 bytes → ``dims`` floats → L2 unit."""

    def __init__(self, dims: int = 16):
        if dims <= 0 or dims > 32:
            raise ValueError("dims must be in 1..32 (sha256 yields 32 bytes)")
        self.dims = dims

    def embed_batch(self, texts: Sequence[str]) -> list[list[float]]:
        return [hash_embed_one(t, self.dims) for t in texts]


def hash_embed_one(text: "str | None", dims: int = 16) -> list[float]:
    digest = hashlib.sha256((text or "").encode("utf-8")).digest()
    raw = [digest[i] - 127.5 for i in range(dims)]
    norm = math.sqrt(sum(v * v for v in raw)) or 1.0
    return [v / norm for v in raw]


def _cached_provider(factory: Callable[[], object]) -> object:
    key = f"{getattr(factory, '__module__', '?')}.{getattr(factory, '__qualname__', repr(factory))}"
    provider = _PROVIDER_CACHE.get(key)
    if provider is None:
        provider = factory()
        _PROVIDER_CACHE[key] = provider
    return provider


def _chunk_texts(text: str, splitter: "Callable[[str], list[str]] | None") -> list[str]:
    if splitter is None:
        return [text]
    chunks = splitter(text)
    return chunks if chunks else [text]


def with_embeddings(
    df: DataFrame,
    text_col: "str | Column",
    output_col: str = "embedding",
    provider_factory: "Callable[[], object] | None" = None,
    batch_size: int = 32,
    splitter: "Callable[[str], list[str]] | None" = None,
    chunk_agg: str = "mean",
) -> DataFrame:
    """Append an ``array<float>`` embedding column.

    Long texts can be split (``splitter``) and chunk vectors aggregated
    by elementwise ``mean`` or ``first`` (reference ``utils/llm.py:206-229``).
    Arrow-batched: one Python roundtrip per ~10k rows, provider batches
    of ``batch_size`` inside.
    """
    if chunk_agg not in ("mean", "first"):
        raise ValueError("chunk_agg must be 'mean' or 'first'")
    factory = provider_factory or HashEmbeddingProvider

    @pandas_udf(ArrayType(FloatType()))
    def embed(series: pd.Series) -> pd.Series:
        provider = _cached_provider(factory)
        texts = series.fillna("").astype(str).tolist()
        # flatten chunk lists so the provider sees full batches
        chunk_lists = [_chunk_texts(t, splitter) for t in texts]
        flat = [c for chunks in chunk_lists for c in chunks]
        vectors: list[list[float]] = []
        for i in range(0, len(flat), batch_size):
            vectors.extend(provider.embed_batch(flat[i : i + batch_size]))
        out, pos = [], 0
        for chunks in chunk_lists:
            vecs = vectors[pos : pos + len(chunks)]
            pos += len(chunks)
            if chunk_agg == "first" or len(vecs) == 1:
                out.append(vecs[0])
            else:
                n = len(vecs)
                out.append([sum(col) / n for col in zip(*vecs)])
        return pd.Series(out)

    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return df.withColumn(output_col, embed(col))
