"""Concrete embedding-provider adapters for ``with_embeddings``.

Ports the reference's model-adapter pattern
(``/root/reference/src/spark_fuse/similarity/embedding.py:186-303`` —
sentence-transformers generator with executor-local model cache,
driver-side warmup, and stub fallback; ``utils/llm.py:53-236`` —
LangChain ``Embeddings`` acceptance) onto this engine's single provider
contract: ``embed_batch(texts) -> list[list[float]]``, shipped to
executors as a zero-arg picklable factory and cached per worker process
(``ai.embeddings._cached_provider``).

Neither ``sentence-transformers`` nor ``langchain`` is installed in this
container; both adapters degrade deterministically:

* :class:`SentenceTransformerProvider` falls back to the hash stub
  (same (text → unit ``array<float>``) contract) when the import fails
  or ``prefer_stub=True`` — so pipelines and tests run hermetically and
  a real model drops in WITHOUT changing the plan.
* :class:`LangChainEmbeddingsProvider` adapts anything implementing the
  public LangChain ``Embeddings`` duck-type (``embed_documents``), built
  from a user factory.

Use :func:`warmed_factory` to load the model ONCE on the driver before
fan-out, so a bad model name / missing weights fails the job up front
instead of on every executor (reference ``embedding.py:230-233``).
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

from .embeddings import _cached_provider, hash_embed_one

__all__ = [
    "SentenceTransformerProvider",
    "LangChainEmbeddingsProvider",
    "sentence_transformer_factory",
    "langchain_factory",
    "warmed_factory",
]

# executor-local model cache, keyed (model_name, device) — one model per
# worker process regardless of how many tasks run there
_MODEL_CACHE: dict[tuple[str, "str | None"], object] = {}

_OFFLINE_ENV_DEFAULTS = {
    # cached-model offline mode + single-threaded encoders: executor
    # processes already saturate cores task-wise; a model spawning its
    # own thread pool oversubscribes the worker (reference
    # embedding.py:134-146 applies the same defaults)
    "HF_HUB_OFFLINE": "1",
    "TRANSFORMERS_OFFLINE": "1",
    "OMP_NUM_THREADS": "1",
    "MKL_NUM_THREADS": "1",
    "TOKENIZERS_PARALLELISM": "false",
}


def _load_model(model_name: str, device: "str | None") -> "object | None":
    """Import + construct the sentence-transformers model, cached per
    process.  Returns None when the library is unavailable (callers fall
    back to the stub)."""
    key = (model_name, device)
    if key in _MODEL_CACHE:
        return _MODEL_CACHE[key]
    for env_key, value in _OFFLINE_ENV_DEFAULTS.items():
        os.environ.setdefault(env_key, value)
    try:
        from sentence_transformers import SentenceTransformer  # type: ignore
    except Exception:
        model = None
    else:
        model = (
            SentenceTransformer(model_name)
            if device is None
            else SentenceTransformer(model_name, device=device)
        )
    _MODEL_CACHE[key] = model
    return model


class SentenceTransformerProvider:
    """sentence-transformers adapter for the ``embed_batch`` contract.

    ``prefer_stub=True`` (or an unavailable library) routes every batch
    through the deterministic hash stub with ``stub_dims`` dimensions —
    the schema and batch shape are identical to the real model path.
    """

    def __init__(
        self,
        model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
        device: "str | None" = None,
        normalize: bool = True,
        prefer_stub: bool = False,
        stub_dims: int = 16,
    ):
        self.model_name = model_name
        self.device = device
        self.normalize = normalize
        self.prefer_stub = prefer_stub
        self.stub_dims = stub_dims

    def _model(self) -> "object | None":
        if self.prefer_stub:
            return None
        return _load_model(self.model_name, self.device)

    def embed_batch(self, texts: Sequence[str]) -> list[list[float]]:
        model = self._model()
        if model is None:
            return [hash_embed_one(t, self.stub_dims) for t in texts]
        vectors = model.encode(
            [t or "" for t in texts],
            batch_size=len(texts) or 1,
            normalize_embeddings=self.normalize,
        )
        return [[float(x) for x in vec] for vec in vectors]


class LangChainEmbeddingsProvider:
    """Adapter for the public LangChain ``Embeddings`` duck-type.

    ``embeddings_factory`` returns an object with
    ``embed_documents(texts: list[str]) -> list[list[float]]`` — any
    LangChain embeddings class satisfies this.  The factory (not the
    instance) ships to executors; the instance is built lazily and held
    for the worker's lifetime.
    """

    def __init__(self, embeddings_factory: Callable[[], object]):
        self._factory = embeddings_factory
        self._instance: "object | None" = None

    def _embeddings(self) -> object:
        if self._instance is None:
            self._instance = self._factory()
        return self._instance

    def embed_batch(self, texts: Sequence[str]) -> list[list[float]]:
        vectors = self._embeddings().embed_documents([t or "" for t in texts])
        return [[float(x) for x in vec] for vec in vectors]


def sentence_transformer_factory(
    model_name: str = "sentence-transformers/all-MiniLM-L6-v2", **kwargs: object
) -> Callable[[], SentenceTransformerProvider]:
    """Picklable zero-arg factory for ``with_embeddings``."""
    import functools

    return functools.partial(SentenceTransformerProvider, model_name, **kwargs)


def langchain_factory(
    embeddings_factory: Callable[[], object],
) -> Callable[[], LangChainEmbeddingsProvider]:
    """Picklable zero-arg factory wrapping a LangChain-style factory."""
    import functools

    return functools.partial(LangChainEmbeddingsProvider, embeddings_factory)


def warmed_factory(factory: Callable[[], object], probe: str = "warmup") -> Callable[[], object]:
    """Driver-side warmup: construct the provider HERE and embed one
    probe text so import/download/config errors fail the job before any
    task is scheduled (reference primes its model cache on the driver for
    the same reason).  Returns the same factory for executor shipping —
    the driver-side instance also lands in the driver's provider cache,
    so local-mode reuses it."""
    provider = _cached_provider(factory)
    result = provider.embed_batch([probe])  # type: ignore[attr-defined]
    if not result or not result[0]:
        raise ValueError("embedding provider warmup returned no vector")
    return factory
