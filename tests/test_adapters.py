"""Embedding-provider adapters: stub-backed tests (model libs absent)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_fuse_spark.ai.adapters import (
    LangChainEmbeddingsProvider,
    SentenceTransformerProvider,
    langchain_factory,
    sentence_transformer_factory,
    warmed_factory,
)
from spark_fuse_spark.ai.embeddings import hash_embed_one, with_embeddings


def test_sentence_transformer_stub_fallback_deterministic():
    p = SentenceTransformerProvider(prefer_stub=True, stub_dims=8)
    vecs = p.embed_batch(["alpha", "beta", "alpha"])
    assert vecs[0] == vecs[2] != vecs[1]
    assert vecs[0] == hash_embed_one("alpha", 8)
    # unit vectors
    assert abs(sum(x * x for x in vecs[0]) - 1.0) < 1e-9


def test_sentence_transformer_unavailable_library_falls_back():
    # the container has no sentence-transformers: the non-stub path must
    # still answer (with the stub) rather than raise on import
    p = SentenceTransformerProvider(model_name="any-model", stub_dims=4)
    assert p.embed_batch(["x"]) == [hash_embed_one("x", 4)]


class _FakeLangChainEmbeddings:
    """Public LangChain Embeddings duck-type."""

    def __init__(self):
        self.calls = 0

    def embed_documents(self, texts):
        self.calls += 1
        return [[float(len(t)), 1.0] for t in texts]


def test_langchain_adapter_wraps_embed_documents():
    p = LangChainEmbeddingsProvider(_FakeLangChainEmbeddings)
    assert p.embed_batch(["ab", "xyz", None]) == [[2.0, 1.0], [3.0, 1.0], [0.0, 1.0]]
    # instance constructed once, reused across batches
    inst = p._embeddings()
    p.embed_batch(["q"])
    assert p._embeddings() is inst


def test_warmed_factory_fails_fast_on_broken_provider():
    class Broken:
        def embed_batch(self, texts):
            return [[] for _ in texts]

    with pytest.raises(ValueError, match="warmup"):
        warmed_factory(Broken)


def test_adapter_through_with_embeddings_plan(spark):
    """Factory → executor path: the adapter plugs into with_embeddings
    unchanged (Arrow-batched pandas UDF, array<float> output)."""
    df = spark.createDataFrame([("doc one",), ("doc two",)], ["text"])
    factory = warmed_factory(
        sentence_transformer_factory("stub-model", prefer_stub=True, stub_dims=8)
    )
    out = with_embeddings(df, "text", provider_factory=factory)
    rows = out.select(F.size("embedding").alias("d")).collect()
    assert [r["d"] for r in rows] == [8, 8]

    # locally-defined class: cloudpickle ships it by value, as a user's
    # ad-hoc embeddings object would be
    class LocalFake:
        def embed_documents(self, texts):
            return [[float(len(t)), 1.0] for t in texts]

    lc = warmed_factory(langchain_factory(LocalFake))
    out2 = with_embeddings(df, "text", provider_factory=lc)
    got = {tuple(r["embedding"]) for r in out2.collect()}
    assert got == {(7.0, 1.0)}  # both texts have 7 chars
