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


def test_sentence_transformer_real_model_branch_via_fake_module(monkeypatch):
    """Exercise the NON-stub branch (model.encode -> float lists) without
    the library: inject a fake sentence_transformers module, assert the
    encode output (not the hash stub) comes back, the normalize flag and
    device reach the model, and the process-local model cache holds."""
    import sys
    import types

    from spark_fuse_spark.ai import adapters as ad

    constructed = []

    class FakeModel:
        def __init__(self, name, device=None):
            self.name, self.device = name, device
            constructed.append(self)
            self.encode_kwargs = None

        def encode(self, texts, batch_size, normalize_embeddings):
            self.encode_kwargs = {
                "batch_size": batch_size,
                "normalize_embeddings": normalize_embeddings,
            }
            return [[float(len(t)), 2.5] for t in texts]

    fake = types.ModuleType("sentence_transformers")
    fake.SentenceTransformer = FakeModel
    monkeypatch.setitem(sys.modules, "sentence_transformers", fake)
    monkeypatch.setattr(ad, "_MODEL_CACHE", {})

    p = SentenceTransformerProvider("fake-minilm", device="cpu", normalize=False)
    vecs = p.embed_batch(["ab", "wxyz"])
    assert vecs == [[2.0, 2.5], [4.0, 2.5]]  # encode output, NOT the stub
    assert vecs != [hash_embed_one("ab", 16), hash_embed_one("wxyz", 16)]
    assert len(constructed) == 1
    assert constructed[0].name == "fake-minilm" and constructed[0].device == "cpu"
    assert constructed[0].encode_kwargs == {
        "batch_size": 2,
        "normalize_embeddings": False,
    }
    # second batch reuses the cached model instance (executor-local cache)
    p.embed_batch(["q"])
    assert len(constructed) == 1
    # a second provider with the same (model, device) key also shares it
    SentenceTransformerProvider("fake-minilm", device="cpu").embed_batch(["r"])
    assert len(constructed) == 1


def test_warmed_factory_drives_real_branch_via_fake_module(monkeypatch):
    """warmed_factory must fail fast on a bad model name through the REAL
    constructor path, and succeed through a working fake model."""
    import sys
    import types

    from spark_fuse_spark.ai import adapters as ad
    from spark_fuse_spark.ai import embeddings as emb

    class FakeModel:
        def __init__(self, name, device=None):
            if name == "no-such-model":
                raise OSError("model not found")

        def encode(self, texts, batch_size, normalize_embeddings):
            return [[1.0, 0.0] for _ in texts]

    fake = types.ModuleType("sentence_transformers")
    fake.SentenceTransformer = FakeModel
    monkeypatch.setitem(sys.modules, "sentence_transformers", fake)
    monkeypatch.setattr(ad, "_MODEL_CACHE", {})
    monkeypatch.setattr(emb, "_PROVIDER_CACHE", {}, raising=False)

    ok = warmed_factory(sentence_transformer_factory("fake-ok"))
    assert callable(ok)
    monkeypatch.setattr(emb, "_PROVIDER_CACHE", {}, raising=False)
    with pytest.raises(OSError, match="model not found"):
        warmed_factory(sentence_transformer_factory("no-such-model"))


# ------------------------------------------------ opt-in LIVE smoke tests
# Run with e.g.:
#   FUSE_LIVE_EMBEDDINGS=sentence-transformers/all-MiniLM-L6-v2 pytest -k live
#   FUSE_LIVE_CHAT=gpt-4o-mini OPENAI_API_KEY=... pytest -k live
# They are skipped in this container (no weights, no network) but prove the
# real model/API paths end-to-end wherever those exist.

import os as _os  # noqa: E402


@pytest.mark.skipif(
    not _os.getenv("FUSE_LIVE_EMBEDDINGS"),
    reason="set FUSE_LIVE_EMBEDDINGS=<model-name> to run the live model smoke",
)
def test_live_sentence_transformer_smoke():
    model_name = _os.environ["FUSE_LIVE_EMBEDDINGS"]
    p = SentenceTransformerProvider(model_name)
    vecs = p.embed_batch(["hello world", "goodbye world"])
    assert len(vecs) == 2 and len(vecs[0]) == len(vecs[1]) > 0
    # a real model must NOT be answering from the hash stub
    assert vecs[0] != hash_embed_one("hello world", len(vecs[0]))
    # normalized by default
    assert abs(sum(x * x for x in vecs[0]) - 1.0) < 1e-3


@pytest.mark.skipif(
    not _os.getenv("FUSE_LIVE_CHAT"),
    reason="set FUSE_LIVE_CHAT=<model> plus OPENAI_API_KEY/AZURE_* to run",
)
def test_live_openai_chat_smoke():
    from spark_fuse_spark.ai.llm import OpenAIChatMapper

    mapper = OpenAIChatMapper(_os.environ["FUSE_LIVE_CHAT"])
    out = mapper.map_values(["crimson"], ["red", "green", "blue"])
    assert out == ["red"]
