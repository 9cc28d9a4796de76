"""OpenAI-compatible chat provider: mock-HTTP end-to-end tests.

Mirrors the reference's provider test strategy
(``/root/reference/tests/utils/test_llm.py``): a real (local) HTTP
server plays the chat-completions API so the full request loop —
auth headers, payload shape, retry/backoff, temperature-rejection
fallback, answer validation — runs against actual sockets.
"""

from __future__ import annotations

import pytest
from test_sources import MockServer

from spark_fuse_spark.ai.llm import OpenAIChatMapper, openai_chat_factory, resolve_chat_api
from spark_fuse_spark.ai.mapping import map_column_with_llm


@pytest.fixture()
def server():
    s = MockServer()
    yield s
    s.stop()


def _chat_response(content: str):
    return {"choices": [{"message": {"role": "assistant", "content": content}}]}


def _mapper(server, **kwargs):
    kwargs.setdefault("sleeper", lambda _s: None)
    return OpenAIChatMapper(
        "test-model", api_key="k", base_url=f"{server.url}/v1", **kwargs
    )


def test_happy_path_and_answer_validation(server):
    server.route(
        "POST",
        "/v1/chat/completions",
        _chat_response("Books"),          # exact target
        _chat_response('"electronics"'),  # quoted + case-insensitive
        _chat_response("None"),           # explicit abstain
        _chat_response("Gadgets"),        # invented category
    )
    m = _mapper(server)
    targets = ["Books", "Electronics"]
    assert m.map_values(["book dept", "ELEC", "???", "gizmo"], targets) == [
        "Books",
        "Electronics",
        None,
        None,
    ]
    # payload shape: model included (non-Azure), temperature forwarded,
    # bearer auth, system+user messages
    method, path, body = server.requests[0]
    assert (method, path) == ("POST", "/v1/chat/completions")
    assert body["model"] == "test-model"
    assert body["temperature"] == 0.0
    assert [msg["role"] for msg in body["messages"]] == ["system", "user"]
    assert 'book dept' in body["messages"][1]["content"]
    assert server.auth_log[0][1] == "Bearer k"


def test_rate_limit_backoff_then_success(server):
    server.route(
        "POST",
        "/v1/chat/completions",
        (429, {"error": {"message": "rate limited"}}),
        (500, {"error": {"message": "boom"}}),
        _chat_response("Books"),
    )
    sleeps: list[float] = []
    m = _mapper(server, sleeper=sleeps.append)
    assert m.map_value("x", ["Books"]) == "Books"
    assert sleeps == [2, 4]  # exponential: 2**1, 2**2
    assert len(server.requests) == 3


def test_temperature_rejection_fallback(server):
    server.route(
        "POST",
        "/v1/chat/completions",
        (400, {"error": {"message": "temperature is not supported with this model"}}),
        _chat_response("Books"),
    )
    m = _mapper(server)
    assert m.map_value("x", ["Books"]) == "Books"
    first, second = server.requests[0][2], server.requests[1][2]
    assert first["temperature"] == 0.0
    assert "temperature" not in second  # dropped after rejection


def test_other_400_gives_up_unmapped(server):
    server.route("POST", "/v1/chat/completions", (400, {"error": {"message": "bad request"}}))
    m = _mapper(server)
    assert m.map_value("x", ["Books"]) is None
    assert len(server.requests) == 1  # no retry on non-temperature 400


def test_persistent_server_error_exhausts_retries(server):
    server.route("POST", "/v1/chat/completions", (503, {"error": {"message": "down"}}))
    m = _mapper(server, max_retries=3)
    assert m.map_value("x", ["Books"]) is None
    assert len(server.requests) == 3


def test_resolve_azure_config(monkeypatch):
    monkeypatch.delenv("OPENAI_BASE_URL", raising=False)
    monkeypatch.setenv("AZURE_OPENAI_KEY", "azkey")
    monkeypatch.setenv("AZURE_OPENAI_ENDPOINT", "https://example.cognitive.azure.test/")
    monkeypatch.setenv("AZURE_OPENAI_API_VERSION", "2024-01-01")
    url, headers, use_azure = resolve_chat_api("my-deployment")
    assert use_azure
    assert url == (
        "https://example.cognitive.azure.test/openai/deployments/"
        "my-deployment/chat/completions?api-version=2024-01-01"
    )
    assert headers["api-key"] == "azkey"
    assert "Authorization" not in headers


def test_resolve_requires_key(monkeypatch):
    for var in ("OPENAI_API_KEY", "AZURE_OPENAI_KEY", "AZURE_OPENAI_API_KEY"):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(RuntimeError, match="API key"):
        resolve_chat_api("m")


def test_map_column_with_llm_via_provider(spark, server):
    """Full plan integration: distinct-first mapping through the real
    HTTP provider (driver-map path — distinct cardinality is tiny)."""
    server.route(
        "POST",
        "/v1/chat/completions",
        lambda handler, body: _chat_response(
            "Books" if "paperback" in body["messages"][1]["content"] else "None"
        ),
    )
    df = spark.createDataFrame(
        [("paperback",), ("paperback",), ("mystery-item",)], ["category"]
    )
    factory = openai_chat_factory(
        "test-model", api_key="k", base_url=f"{server.url}/v1", sleeper=lambda _s: None
    )
    out = map_column_with_llm(
        df, "category", ["Books", "Electronics"], provider_factory=factory
    )
    got = {(r["category"], r["category_mapped"]) for r in out.collect()}
    assert got == {("paperback", "Books"), ("mystery-item", None)}
    # distinct-first: 2 distinct unresolved values -> exactly 2 HTTP calls
    assert len(server.requests) == 2
