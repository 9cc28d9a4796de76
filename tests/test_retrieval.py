"""BM25 and RRF: hand-computed scores on a tiny corpus, ranking
invariants, and fusion semantics."""

from __future__ import annotations

import math

import pytest

from spark_fuse_spark.operators.retrieval import bm25_scores, bm25_topk, rrf_fuse

DOCS = [
    (1, "spark shuffle join shuffle"),
    (2, "broadcast join"),
    (3, "python pandas"),
    (4, "shuffle"),
]


def _bm25_expected(terms):
    texts = {d: t.split() for d, t in DOCS}
    n = float(len(DOCS))
    avgdl = sum(len(t) for t in texts.values()) / n
    dfreq = {t: float(sum(1 for toks in texts.values() if t in toks)) for t in terms}
    out = {}
    for d, toks in texts.items():
        s = 0.0
        for t in terms:
            tf = float(toks.count(t))
            if not tf or not dfreq[t]:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
        if s:
            out[d] = round(s, 6)
    return out


def test_bm25_matches_closed_form(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {r.doc_id: r.score for r in bm25_scores(df, ["shuffle", "join"]).collect()}
    want = _bm25_expected(["shuffle", "join"])
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6)


def test_bm25_topk_rank_and_tiebreak(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    rows = bm25_topk(df, ["shuffle", "join"], k=2).orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2]
    assert rows[0].score >= rows[1].score
    # doc 3 matches nothing and never appears at any k
    all_rows = bm25_topk(df, ["shuffle", "join"], k=10).collect()
    assert 3 not in {r.doc_id for r in all_rows}


def test_rrf_fuse_inner_and_full(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(2, 1), (3, 2), (4, 3)], ["doc_id", "rank"])
    inner = {r.doc_id: r.rrf_score for r in rrf_fuse([a, b]).collect()}
    assert set(inner) == {2, 3}
    assert inner[2] == round(1 / 62 + 1 / 61, 6)
    full = {r.doc_id: r.rrf_score for r in rrf_fuse([a, b], how="full").collect()}
    assert set(full) == {1, 2, 3, 4}
    assert full[1] == round(1 / 61, 6)
    assert full[4] == round(1 / 63, 6)


def test_rrf_requires_two_rankings(spark):
    a = spark.createDataFrame([(1, 1)], ["doc_id", "rank"])
    with pytest.raises(ValueError):
        rrf_fuse([a])


def test_rrf_three_way_fusion(spark):
    a = spark.createDataFrame([(1, 1), (2, 2)], ["doc_id", "rank"])
    b = spark.createDataFrame([(1, 2), (2, 1)], ["doc_id", "rank"])
    c = spark.createDataFrame([(1, 3), (3, 1)], ["doc_id", "rank"])
    full = {r.doc_id: r.rrf_score for r in rrf_fuse([a, b, c], how="full").collect()}
    assert full[1] == round(1 / 61 + 1 / 62 + 1 / 63, 6)
    assert full[2] == round(1 / 62 + 1 / 61, 6)
    assert full[3] == round(1 / 61, 6)
    inner = rrf_fuse([a, b, c]).collect()
    assert {r.doc_id for r in inner} == {1}
