"""Second-stage rerank: mock-HTTP e2e for the provider contract, Python
brute-force pins for the offline scorer, and the distributed pipeline.
Mirrors the chat-provider test strategy (tests/test_llm_provider.py)."""
from __future__ import annotations

import pytest
from test_sources import MockServer

from spark_fuse_spark.ai.rerank import (
    HttpReranker,
    TokenOverlapReranker,
    rerank_candidates,
    rerank_topk,
)


@pytest.fixture()
def server():
    s = MockServer()
    yield s
    s.stop()


def _reranker(server, **kwargs):
    kwargs.setdefault("sleeper", lambda _s: None)
    return HttpReranker("test-rerank", api_key="k", base_url=server.url, **kwargs)


def test_http_reranker_happy_path_realigns_by_index(server):
    """Scores come back positionally re-aligned via the response index
    field (hosted APIs return results sorted by relevance, not input
    order); payload carries model/query/documents/top_n and the bearer
    header."""
    server.routes[("POST", "/rerank")] = [
        {
            "results": [
                {"index": 2, "relevance_score": 0.9},
                {"index": 0, "relevance_score": 0.5},
                {"index": 1, "relevance_score": 0.1},
            ]
        }
    ]
    r = _reranker(server)
    assert r.rerank("q", ["a", "b", "c"]) == [0.5, 0.1, 0.9]
    method, path, body = server.requests[0]
    assert (method, path) == ("POST", "/rerank")
    assert body == {
        "model": "test-rerank",
        "query": "q",
        "documents": ["a", "b", "c"],
        "top_n": 3,
    }
    assert server.auth_log[0][1] == "Bearer k"


def test_http_reranker_retries_429_then_succeeds(server):
    server.routes[("POST", "/rerank")] = [
        (429, {"message": "slow down"}),
        {"results": [{"index": 0, "relevance_score": 1.0}]},
    ]
    assert _reranker(server).rerank("q", ["a"]) == [1.0]
    assert len(server.requests) == 2


def test_http_reranker_4xx_raises_immediately(server):
    server.routes[("POST", "/rerank")] = [(400, {"message": "bad"})]
    with pytest.raises(RuntimeError, match="rerank failed"):
        _reranker(server).rerank("q", ["a"])
    assert len(server.requests) == 1  # no retry on a malformed request


def test_http_reranker_5xx_exhausts_retries(server):
    server.routes[("POST", "/rerank")] = [(500, {"message": "boom"})]
    with pytest.raises(RuntimeError, match="rerank failed"):
        _reranker(server, max_retries=2).rerank("q", ["a"])
    assert len(server.requests) == 3


def test_http_reranker_empty_docs_no_request(server):
    assert _reranker(server).rerank("q", []) == []
    assert server.requests == []


def test_token_overlap_scores_are_jaccard():
    r = TokenOverlapReranker()
    got = r.rerank("join  Shuffle", ["join broadcast", "JOIN shuffle", "xyz", ""])
    assert got == [1 / 3, 1.0, 0.0, 0.0]


def test_rerank_candidates_mapinpandas(spark):
    """The distributed scorer matches the provider applied by hand."""
    df = spark.createDataFrame(
        [(1, "join shuffle"), (2, "broadcast join"), (3, "nothing here")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.rerank_score
        for r in rerank_candidates(df, "join shuffle broadcast",
                                   TokenOverlapReranker).collect()
    }
    assert got == {1: 2 / 3, 2: 2 / 3, 3: 0.0}


def test_rerank_topk_end_to_end(spark, tmp_path):
    """bm25 recall -> rerank -> top-k: ranks are total (jaccard desc,
    bm25 desc, id) and bounded by k; first-stage losers never surface."""
    rows = [
        (1, "join shuffle broadcast"),        # jaccard 1.0
        (2, "join shuffle broadcast extra"),  # 3/4
        (3, "join join join"),                # 1/3
        (4, "shuffle"),                       # 1/3, lower bm25 than 3?
        (5, "completely unrelated text"),     # no term: not in first stage
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = rerank_topk(df, ["join", "shuffle", "broadcast"],
                      TokenOverlapReranker, first_stage_k=10, k=3).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    assert [r.doc_id for r in out][:2] == [1, 2]
    assert all(r.doc_id != 5 for r in out)
    assert out[0].rerank_score == 1.0
