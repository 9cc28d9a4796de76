"""End-to-end connector tests against an in-process mock HTTP server.

Mirrors the reference's connector test strategy
(``/root/reference/tests/io/test_rest_api.py:28-259``,
``test_sparql.py:29-227``, ``test_qdrant.py:113-245``): canned JSON per
path, real ``spark.read.format(...).load()`` round trips, assertions on
both DataFrame contents and the recorded request sequence.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from spark_fuse_spark.sources import qdrant as qd
from spark_fuse_spark.sources import rest
from spark_fuse_spark.sources import sparql as sq


class MockServer:
    """Threaded HTTP server with per-(method,path) canned responses.

    Responses: list of payloads consumed in order (last one repeats), or a
    callable (handler, body) -> payload.  Requests are recorded as
    (method, path, parsed_body) for assertion.
    """

    def __init__(self):
        self.routes: dict[tuple[str, str], list] = {}
        self.requests: list[tuple[str, str, object]] = []
        self.auth_log: list[tuple[str, "str | None"]] = []
        self.lock = threading.Lock()
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _serve(self, method: str):
                length = int(self.headers.get("Content-Length") or 0)
                raw = self.rfile.read(length) if length else b""
                try:
                    body = json.loads(raw) if raw else None
                except ValueError:
                    body = raw.decode("utf-8", "replace")
                path = self.path.split("?")[0]
                with outer.lock:
                    outer.requests.append((method, self.path, body))
                    outer.auth_log.append((path, self.headers.get("Authorization")))
                    queue = outer.routes.get((method, path))
                if queue is None:
                    self.send_response(404)
                    self.end_headers()
                    return
                entry = queue[0] if len(queue) == 1 else queue.pop(0)
                if callable(entry):
                    entry = entry(self, body)
                status, payload = entry if isinstance(entry, tuple) else (200, entry)
                data = json.dumps(payload).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._serve("GET")

            def do_POST(self):
                self._serve("POST")

            def do_PUT(self):
                self._serve("PUT")

        self.server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.server.server_address[1]}"
        self.thread = threading.Thread(target=self.server.serve_forever, daemon=True)
        self.thread.start()

    def stop(self):
        self.server.shutdown()
        self.server.server_close()

    def route(self, method: str, path: str, *responses):
        self.routes[(method, path)] = list(responses)


@pytest.fixture()
def mock_server():
    server = MockServer()
    yield server
    server.stop()


# ------------------------------------------------------------------- REST


def test_rest_query_pagination(spark, mock_server):
    # single path, page param in query string: respond per requested page
    def pager(handler, body):
        q = handler.path.split("page=")[1]
        page = int(q.split("&")[0])
        items = [{"id": page * 10 + i, "name": f"r{page}-{i}"} for i in range(2)]
        return {"data": items}

    mock_server.route("GET", "/items", pager)
    rest.register(spark)
    cfg = rest.build_rest_config(
        f"{mock_server.url}/items",
        pagination={"mode": "query", "param": "page", "start": 1, "stop": 3},
    )
    df = spark.read.format(rest.FORMAT_NAME).option(rest.CONFIG_OPTION, cfg).load()
    rows = sorted(r["id"] for r in df.collect())
    assert rows == [10, 11, 20, 21, 30, 31]


def test_rest_token_pagination_and_post(spark, mock_server):
    # schema inference walks the chain once, the read walks it again —
    # serve the two-page sequence twice
    page1 = {"results": [{"id": 1}], "next": {"token": "t2"}}
    page2 = {"results": [{"id": 2}], "next": {"token": None}}
    mock_server.route("POST", "/search", page1, page2, page1, page2)
    rest.register(spark)
    cfg = rest.build_rest_config(
        f"{mock_server.url}/search",
        request_type="POST",
        body={"q": "spark"},
        pagination={"mode": "token", "field": "next.token", "param": "cursor"},
    )
    df = spark.read.format(rest.FORMAT_NAME).option(rest.CONFIG_OPTION, cfg).load()
    assert sorted(r["id"] for r in df.collect()) == [1, 2]
    posts = [b for m, p, b in mock_server.requests if m == "POST"]
    assert all(b == {"q": "spark"} for b in posts)


def test_rest_link_pagination_follows_next_urls(spark, mock_server):
    """Response/link mode (reference ``tests/io/test_rest_api.py``
    response-pagination case): the reader follows each payload's ``next``
    link — absolute AND relative forms — until a page carries none."""

    def page(links_next, ids):
        payload = {"data": [{"id": i} for i in ids]}
        if links_next is not None:
            payload["links"] = {"next": links_next}
        return payload

    # page 1 links absolutely, page 2 relatively (resolved against the
    # page-2 URL), page 3 ends the chain; schema inference + read = 2 walks
    chain = [
        page(None, [30]),  # served at /v2/items/p3
    ]
    mock_server.route("GET", "/v2/items/p3", *chain)
    mock_server.route("GET", "/v2/items/p2", page("p3", [20, 21]))
    mock_server.route("GET", "/v2/items", page(f"{mock_server.url}/v2/items/p2", [10, 11]))

    rest.register(spark)
    cfg = rest.build_rest_config(
        f"{mock_server.url}/v2/items",
        records_field="data",
        pagination={"mode": "response", "field": "links.next"},
    )
    df = spark.read.format(rest.FORMAT_NAME).option(rest.CONFIG_OPTION, cfg).load()
    assert sorted(r["id"] for r in df.collect()) == [10, 11, 20, 21, 30]
    # the chain was followed in order: base -> absolute p2 -> relative p3
    paths = [p for m, p, _ in mock_server.requests if m == "GET"]
    assert paths[:3] == ["/v2/items", "/v2/items/p2", "/v2/items/p3"]


def test_rest_link_pagination_max_pages_cap(spark, mock_server):
    """A self-linking endpoint must stop at max_pages, not loop forever."""

    def self_link(handler, body):
        return {"data": [{"id": 1}], "next": f"{mock_server.url}/loop"}

    mock_server.route("GET", "/loop", self_link)
    rest.register(spark)
    cfg = rest.build_rest_config(
        f"{mock_server.url}/loop",
        records_field="data",
        pagination={"mode": "response", "field": "next", "max_pages": 3},
    )
    df = spark.read.format(rest.FORMAT_NAME).option(rest.CONFIG_OPTION, cfg).load()
    assert [r["id"] for r in df.collect()] == [1, 1, 1]


def test_rest_filter_pushdown_appends_query_params(spark, mock_server):
    records = [
        {"id": 1, "status": "open", "kind": "a"},
        {"id": 2, "status": "closed", "kind": "b"},
        {"id": 3, "status": "open", "kind": "c"},
    ]
    mock_server.route("GET", "/items", {"data": records})
    rest.register(spark)
    cfg = rest.build_rest_config(
        f"{mock_server.url}/items",
        records_field="data",
        # IN pushdown needs the endpoint's list convention declared
        # explicitly; a plain-string spec pushes equality only
        filter_param_map={
            "status": "status",
            "kind": {"param": "kind", "in_delimiter": ","},
        },
    )
    df = spark.read.format(rest.FORMAT_NAME).option(rest.CONFIG_OPTION, cfg).load()
    from pyspark.sql import functions as F

    out = df.filter(
        (F.col("status") == "open") & F.col("kind").isin("a", "c") & (F.col("id") > 0)
    ).collect()
    # the mock ignores the params and returns everything; Spark's
    # re-evaluation still yields exactly the matching rows
    assert sorted(r["id"] for r in out) == [1, 3]
    # the read request (inference fetches first, without pushdown)
    # carried the mapped predicates as query parameters; the unmapped
    # id>0 predicate did not reach the wire
    paths = [path for method, path, _ in mock_server.requests]
    assert any("status=open" in p and "kind=a%2Cc" in p for p in paths), paths
    assert all("id" not in p for p in paths)


def test_rest_filter_pushdown_in_requires_optin_and_skips_hazards(spark, mock_server):
    """IN without a declared delimiter must NOT reach the wire (an endpoint
    matching the literal 'a,c' would subtractively drop rows); operands
    containing the delimiter and float equality are likewise unpushable."""
    records = [{"id": 1, "status": "open", "kind": "a,b", "score": 1.0}]
    mock_server.route("GET", "/items", {"data": records})
    rest.register(spark)
    cfg = rest.build_rest_config(
        f"{mock_server.url}/items",
        records_field="data",
        filter_param_map={
            "status": "status",  # equality-only spec
            "kind": {"param": "kind", "in_delimiter": ","},
            "score": "score",
        },
    )
    df = spark.read.format(rest.FORMAT_NAME).option(rest.CONFIG_OPTION, cfg).load()
    from pyspark.sql import functions as F

    out = df.filter(
        F.col("status").isin("open", "held")  # IN on equality-only spec
        & F.col("kind").isin("a,b", "x")  # operand contains the delimiter
        & (F.col("score") == 1.0)  # float equality: str() mismatch hazard
    ).collect()
    assert [r["id"] for r in out] == [1]
    paths = [path for method, path, _ in mock_server.requests]
    assert all("status=" not in p for p in paths), paths
    assert all("kind=" not in p for p in paths), paths
    assert all("score=" not in p for p in paths), paths


def test_rest_filter_param_map_rejects_bad_spec():
    with pytest.raises(ValueError, match="filter_param_map"):
        rest.build_rest_config(
            "http://example.com/items",
            filter_param_map={"kind": {"in_delimiter": ","}},  # missing 'param'
        )


def test_rest_filter_pushdown_requires_declared_map(spark, mock_server):
    """Without filter_param_map the plain reader is used: same results,
    nothing appended to the query string (endpoints that 400 on unknown
    params stay safe)."""
    mock_server.route("GET", "/items", {"data": [{"id": 1, "status": "open"}]})
    rest.register(spark)
    cfg = rest.build_rest_config(f"{mock_server.url}/items", records_field="data")
    df = spark.read.format(rest.FORMAT_NAME).option(rest.CONFIG_OPTION, cfg).load()
    assert df.filter(df.status == "open").count() == 1
    assert all("status=" not in path for _, path, _ in mock_server.requests)


# ------------------------------------------------------------------ SPARQL


def _sparql_select_payload():
    return {
        "head": {"vars": ["name", "age"]},
        "results": {
            "bindings": [
                {
                    "name": {"type": "literal", "value": "ann"},
                    "age": {
                        "type": "literal",
                        "value": "41",
                        "datatype": "http://www.w3.org/2001/XMLSchema#integer",
                    },
                },
                {
                    "name": {"type": "uri", "value": "http://x/bob"},
                    "age": {
                        "type": "literal",
                        "value": "7.5",
                        "datatype": "http://www.w3.org/2001/XMLSchema#double",
                    },
                },
            ]
        },
    }


def test_sparql_select_coercion(spark, mock_server):
    mock_server.route("POST", "/sparql", _sparql_select_payload())
    sq.register(spark)
    cfg = sq.build_sparql_config(f"{mock_server.url}/sparql", "SELECT ?name ?age WHERE {}")
    df = spark.read.format(sq.FORMAT_NAME).option(sq.CONFIG_OPTION, cfg).load()
    rows = {r["name"]: r for r in df.collect()}
    assert rows["ann"]["age"] == 41.0 or rows["ann"]["age"] == 41
    assert "http://x/bob" in rows


def test_sparql_ask(spark, mock_server):
    mock_server.route("POST", "/ask", {"head": {}, "boolean": True})
    sq.register(spark)
    cfg = sq.build_sparql_config(f"{mock_server.url}/ask", "ASK WHERE {}")
    df = spark.read.format(sq.FORMAT_NAME).option(sq.CONFIG_OPTION, cfg).load()
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["boolean"] is True


def test_sparql_metadata_columns(spark, mock_server):
    mock_server.route("POST", "/sparql", _sparql_select_payload())
    sq.register(spark)
    cfg = sq.build_sparql_config(
        f"{mock_server.url}/sparql",
        "SELECT ?name ?age WHERE {}",
        include_metadata=True,
    )
    df = spark.read.format(sq.FORMAT_NAME).option(sq.CONFIG_OPTION, cfg).load()
    assert "name__type" in df.columns and "age__datatype" in df.columns
    by_name = {r["name"]: r for r in df.collect()}
    assert by_name["http://x/bob"]["name__type"] == "uri"


def test_sparql_basic_auth_and_raw_mode(spark, mock_server):
    mock_server.route("POST", "/auth", {"head": {}, "boolean": False})
    sq.register(spark)
    cfg = sq.build_sparql_config(
        f"{mock_server.url}/auth",
        "ASK WHERE {}",
        username="alice",
        password="s3cret",
        payload_mode="raw",
    )
    df = spark.read.format(sq.FORMAT_NAME).option(sq.CONFIG_OPTION, cfg).load()
    assert df.collect()[0]["boolean"] is False
    # raw mode posts the query text itself, not a form encoding
    bodies = [b for m, p, b in mock_server.requests if p == "/auth"]
    assert bodies and all(b == "ASK WHERE {}" for b in bodies)
    # basic auth reached the endpoint
    import base64

    expected = "Basic " + base64.b64encode(b"alice:s3cret").decode()
    auths = [a for p, a in mock_server.auth_log if p == "/auth"]
    assert auths and all(a == expected for a in auths)


# ------------------------------------------------------------------ Qdrant


def _scroll_pages():
    page1 = {
        "status": "ok",
        "result": {
            "points": [
                {"id": 1, "payload": {"title": "a", "score": 0.5}},
                {"id": 2, "payload": {"title": "b", "score": 0.7}},
            ],
            "next_page_offset": 3,
        },
    }
    page2 = {
        "status": "ok",
        "result": {
            "points": [{"id": 3, "payload": {"title": "c", "score": 0.9}}],
            "next_page_offset": None,
        },
    }
    return page1, page2


def test_qdrant_scroll_read(spark, mock_server):
    page1, page2 = _scroll_pages()
    # inference scrolls once, the read scrolls again — serve the sequence twice
    mock_server.route("POST", "/collections/docs/points/scroll", page1, page2, page1, page2)
    qd.register(spark)
    cfg = qd.build_qdrant_read_config(mock_server.url, "docs", api_key="sekrit")
    df = spark.read.format(qd.FORMAT_NAME).option(qd.CONFIG_OPTION, cfg).load()
    rows = sorted((r["id"], r["payload"]["title"]) for r in df.collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_qdrant_partition_filters(spark, mock_server):
    def by_shard(handler, body):
        flt = (body or {}).get("filter") or {}
        blob = json.dumps(flt)
        pid = 100 if "shard-a" in blob else 200
        return {
            "status": "ok",
            "result": {"points": [{"id": pid, "payload": {"t": "x"}}], "next_page_offset": None},
        }

    mock_server.route("POST", "/collections/docs/points/scroll", by_shard)
    qd.register(spark)
    cfg = qd.build_qdrant_read_config(
        mock_server.url,
        "docs",
        partition_filters=[
            {"must": [{"key": "g", "match": {"value": "shard-a"}}]},
            {"must": [{"key": "g", "match": {"value": "shard-b"}}]},
        ],
    )
    df = spark.read.format(qd.FORMAT_NAME).option(qd.CONFIG_OPTION, cfg).load()
    assert sorted(r["id"] for r in df.collect()) == [100, 200]


def test_qdrant_predicate_pushdown_reaches_scroll_filter(spark, mock_server):
    points = [
        {"id": 1, "payload": {"lang": "en", "score": 5}},
        {"id": 2, "payload": {"lang": "de", "score": 1}},
    ]
    mock_server.route(
        "POST",
        "/collections/docs/points/scroll",
        {"status": "ok", "result": {"points": points, "next_page_offset": None}},
    )
    qd.register(spark)
    cfg = qd.build_qdrant_read_config(mock_server.url, "docs", predicate_pushdown=True)
    df = spark.read.format(qd.FORMAT_NAME).option(qd.CONFIG_OPTION, cfg).load()
    from pyspark.sql import functions as F

    out = df.filter((F.col("payload.lang") == "en") & (F.col("id") < 100)).collect()
    # Spark re-evaluates: the mock ignored the filter and returned both
    # points, yet only the matching row survives.
    assert [(r["id"], r["payload"]["lang"]) for r in out] == [(1, "en")]
    # the READ scroll (inference scrolls first, without pushdown) carried
    # the translated predicate server-side; id<100 stayed Spark-only
    filters = [
        json.dumps((body or {}).get("filter"))
        for method, path, body in mock_server.requests
        if path.endswith("/points/scroll")
    ]
    assert any('{"key": "lang", "match": {"value": "en"}}' in f for f in filters)
    assert all("100" not in f for f in filters)


def test_qdrant_pushdown_merges_with_static_filter(spark, mock_server):
    mock_server.route(
        "POST",
        "/collections/docs/points/scroll",
        {
            "status": "ok",
            "result": {
                "points": [{"id": 7, "payload": {"lang": "en"}}],
                "next_page_offset": None,
            },
        },
    )
    qd.register(spark)
    static = {"must": [{"key": "tenant", "match": {"value": "acme"}}]}
    cfg = qd.build_qdrant_read_config(
        mock_server.url, "docs", filter=static, predicate_pushdown=True
    )
    df = spark.read.format(qd.FORMAT_NAME).option(qd.CONFIG_OPTION, cfg).load()
    assert df.filter(df.id.isin(7, 8)).count() == 1
    read_filters = [
        (body or {}).get("filter")
        for method, path, body in mock_server.requests
        if path.endswith("/points/scroll") and (body or {}).get("filter")
    ]
    # the read request nests BOTH the static config filter and the pushed
    # has_id condition under one AND
    merged = [f for f in read_filters if "has_id" in json.dumps(f)]
    assert merged, f"no scroll carried the pushed has_id: {read_filters}"
    blob = json.dumps(merged[-1])
    assert '"tenant"' in blob and '"has_id": [7, 8]' in blob


def test_qdrant_condition_translation_unit():
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        In,
        IsNull,
        LessThanOrEqual,
        StringStartsWith,
    )

    cond = qd._qdrant_condition
    assert cond(EqualTo(("payload", "lang"), "en")) == {
        "key": "lang",
        "match": {"value": "en"},
    }
    assert cond(EqualTo(("payload", "meta", "k"), 3)) == {
        "key": "meta.k",
        "match": {"value": 3},
    }
    assert cond(EqualTo(("id",), 5)) == {"has_id": [5]}
    assert cond(In(("id",), (1, 2))) == {"has_id": [1, 2]}
    assert cond(In(("payload", "lang"), ("en", "de"))) == {
        "key": "lang",
        "match": {"any": ["en", "de"]},
    }
    assert cond(GreaterThan(("payload", "score"), 3)) == {
        "key": "score",
        "range": {"gt": 3},
    }
    assert cond(LessThanOrEqual(("payload", "score"), 2.5)) == {
        "key": "score",
        "range": {"lte": 2.5},
    }
    from pyspark.sql.datasource import IsNotNull

    # IsNotNull pushes as a safe superset (must_not is_null keeps key-absent
    # points for Spark's re-filter); IsNull must NOT push — Qdrant's is_null
    # misses key-absent points and server filtering is subtractive.
    assert cond(IsNotNull(("payload", "score"))) == {
        "must_not": [{"is_null": {"key": "score"}}]
    }
    assert cond(IsNull(("payload", "score"))) is None
    # unpushable: float equality, string range, non-payload column,
    # id range, unsupported operator class
    assert cond(EqualTo(("payload", "score"), 1.5)) is None
    assert cond(GreaterThan(("payload", "lang"), "a")) is None
    assert cond(EqualTo(("vector",), "x")) is None
    assert cond(EqualTo(("other_col",), "x")) is None
    assert cond(GreaterThan(("id",), 3)) is None
    assert cond(StringStartsWith(("payload", "lang"), "e")) is None


def test_qdrant_write_upsert_and_autocreate(spark, mock_server, tmp_path):
    acked = {"status": "ok", "result": {"operation_id": 0, "status": "acknowledged"}}
    mock_server.route("GET", "/collections/vecs", (404, {"status": {"error": "not found"}}))
    mock_server.route("PUT", "/collections/vecs", acked)
    mock_server.route("PUT", "/collections/vecs/points", acked)
    qd.register(spark)
    df = spark.createDataFrame(
        [(1, [0.1, 0.2], "ann"), (2, [0.3, 0.4], "bob")],
        ["id", "vector", "name"],
    )
    cfg = qd.build_qdrant_write_config(
        mock_server.url, "vecs", create_collection=True, batch_size=10
    )
    (
        df.coalesce(1)
        .write.format(qd.FORMAT_NAME)
        .option(qd.CONFIG_OPTION, cfg)
        .mode("append")
        .save()
    )
    creates = [b for m, p, b in mock_server.requests if m == "PUT" and p == "/collections/vecs"]
    assert creates and creates[0]["vectors"]["size"] == 2
    upserts = [
        b
        for m, p, b in mock_server.requests
        if m == "PUT" and p.startswith("/collections/vecs/points")
    ]
    points = [pt for b in upserts for pt in b["points"]]
    assert sorted(pt["id"] for pt in points) == [1, 2]
    by_id = {pt["id"]: pt for pt in points}
    assert by_id[1]["vector"] == [pytest.approx(0.1), pytest.approx(0.2)]
    assert by_id[1]["payload"] == {"name": "ann"}


def _qdrant_write(spark, mock_server, collection, df, **cfg_overrides):
    cfg = qd.build_qdrant_write_config(mock_server.url, collection, **cfg_overrides)
    (
        df.coalesce(1)
        .write.format(qd.FORMAT_NAME)
        .option(qd.CONFIG_OPTION, cfg)
        .mode("append")
        .save()
    )


def _points_upserts(mock_server, collection):
    return [
        (m, b)
        for m, p, b in mock_server.requests
        if p.startswith(f"/collections/{collection}/points")
    ]


def test_qdrant_write_negotiates_to_legacy_post_flat_batch(spark, mock_server):
    """A legacy server that only speaks POST + flat columnar batches: the
    auto matrix walks PUT points/batch/flat_batch then POST points/batch
    before landing on POST flat_batch (reference writer.py:388-467)."""
    acked = {"status": "ok", "result": {"status": "acknowledged"}}

    def put_reject(handler, body):
        return (400, {"status": {"error": "bad request"}})

    def post_flat_only(handler, body):
        if isinstance(body, dict) and "ids" in body and "batch" not in body:
            return acked
        return (400, {"status": {"error": "missing field `ids`"}})

    mock_server.route("PUT", "/collections/legacy/points", put_reject)
    mock_server.route("POST", "/collections/legacy/points", post_flat_only)
    qd.register(spark)
    df = spark.createDataFrame([(1, [0.1, 0.2], "a"), (2, [0.3, 0.4], "b")], ["id", "vector", "name"])
    _qdrant_write(spark, mock_server, "legacy", df, batch_size=10)
    reqs = _points_upserts(mock_server, "legacy")
    # 3 PUT rejections, then POST points, POST batch, POST flat_batch ok
    assert [m for m, _ in reqs] == ["PUT", "PUT", "PUT", "POST", "POST", "POST"]
    final = reqs[-1][1]
    assert sorted(final["ids"]) == [1, 2] and len(final["vectors"]) == 2
    assert final["payloads"] == [{"name": "a"}, {"name": "b"}]


def test_qdrant_write_pinned_put_batch_envelope(spark, mock_server):
    """payload_format='batch' + write_method='put' sends exactly one leg:
    the PointsBatch envelope via PUT, no negotiation traffic."""
    acked = {"status": "ok", "result": {"status": "acknowledged"}}

    def put_batch_only(handler, body):
        if isinstance(body, dict) and set(body) <= {"batch"} and "batch" in body:
            return acked
        return (400, {"status": {"error": "expected batch envelope"}})

    mock_server.route("PUT", "/collections/env/points", put_batch_only)
    qd.register(spark)
    df = spark.createDataFrame([(7, [1.0, 0.0], "x")], ["id", "vector", "name"])
    _qdrant_write(
        spark, mock_server, "env", df, batch_size=10,
        payload_format="batch", write_method="put",
    )
    reqs = _points_upserts(mock_server, "env")
    assert [m for m, _ in reqs] == ["PUT"]
    assert reqs[0][1]["batch"]["ids"] == [7]
    assert reqs[0][1]["batch"]["payloads"] == [{"name": "x"}]


def test_qdrant_write_pinned_post_points(spark, mock_server):
    acked = {"status": "ok", "result": {"status": "acknowledged"}}

    def post_points_only(handler, body):
        if isinstance(body, dict) and "points" in body:
            return acked
        return (400, {"status": {"error": "expected points list"}})

    mock_server.route("POST", "/collections/pp/points", post_points_only)
    qd.register(spark)
    df = spark.createDataFrame([(9, [0.5, 0.5], "y")], ["id", "vector", "name"])
    _qdrant_write(
        spark, mock_server, "pp", df, batch_size=10,
        payload_format="points", write_method="post",
    )
    reqs = _points_upserts(mock_server, "pp")
    assert [m for m, _ in reqs] == ["POST"]
    assert reqs[0][1]["points"][0]["id"] == 9


def test_qdrant_write_negotiates_to_put_flat_batch(spark, mock_server):
    """A server accepting only PUT + flat columnar batches: negotiation
    stops at the third leg without ever issuing a POST."""
    acked = {"status": "ok", "result": {"status": "acknowledged"}}

    def put_flat_only(handler, body):
        if isinstance(body, dict) and "ids" in body and "batch" not in body:
            return acked
        return (400, {"status": {"error": "missing field `ids`"}})

    mock_server.route("PUT", "/collections/pf/points", put_flat_only)
    qd.register(spark)
    df = spark.createDataFrame([(3, [0.2, 0.8], "c")], ["id", "vector", "name"])
    _qdrant_write(spark, mock_server, "pf", df, batch_size=10)
    reqs = _points_upserts(mock_server, "pf")
    assert [m for m, _ in reqs] == ["PUT", "PUT", "PUT"]  # points, batch, flat
    assert reqs[-1][1]["ids"] == [3] and "batch" not in reqs[-1][1]


def test_qdrant_write_winning_leg_is_sticky_across_flushes(spark, mock_server):
    """After one negotiation, later flushes in the same task go straight to
    the winning leg — no per-batch renegotiation."""
    acked = {"status": "ok", "result": {"status": "acknowledged"}}

    def put_reject(handler, body):
        return (400, {"status": {"error": "nope"}})

    def post_any(handler, body):
        if isinstance(body, dict) and "points" in body:
            return acked
        return (400, {"status": {"error": "missing field `ids`"}})

    mock_server.route("PUT", "/collections/st/points", put_reject)
    mock_server.route("POST", "/collections/st/points", post_any)
    qd.register(spark)
    df = spark.createDataFrame(
        [(i, [float(i), 0.0], f"n{i}") for i in range(4)], ["id", "vector", "name"]
    )
    _qdrant_write(spark, mock_server, "st", df, batch_size=1)
    reqs = _points_upserts(mock_server, "st")
    # first flush negotiates (3 PUT fails + POST points win); the other
    # three flushes are single POST hits on the remembered leg
    assert [m for m, _ in reqs] == ["PUT", "PUT", "PUT"] + ["POST"] * 4


def test_qdrant_write_cached_leg_4xx_renegotiates_once(spark, mock_server):
    """A mid-job server change that retires the cached winning leg but
    still speaks another: the writer clears the cache, re-walks the full
    matrix once, and continues on the new winner instead of failing the
    task with a one-leg 'no accepted combination' error."""
    acked = {"status": "ok", "result": {"status": "acknowledged"}}
    state = {"flipped": False}

    def put_route(handler, body):
        # old server: rejects everything; new server: batch envelope only
        if state["flipped"] and isinstance(body, dict) and "batch" in body:
            return acked
        return (400, {"status": {"error": "nope"}})

    def post_route(handler, body):
        # old server: points list only; flips to the new server after its
        # first accepted upsert (simulating an upgrade behind an LB)
        if not state["flipped"] and isinstance(body, dict) and "points" in body:
            state["flipped"] = True
            return acked
        return (400, {"status": {"error": "retired shape"}})

    mock_server.route("PUT", "/collections/flip/points", put_route)
    mock_server.route("POST", "/collections/flip/points", post_route)
    qd.register(spark)
    df = spark.createDataFrame(
        [(i, [float(i), 1.0], f"n{i}") for i in range(3)], ["id", "vector", "name"]
    )
    _qdrant_write(spark, mock_server, "flip", df, batch_size=1)
    reqs = _points_upserts(mock_server, "flip")
    # flush 1: PUT points/batch/flat all 400, POST points wins (old server)
    # flush 2: cached POST points now 400 -> renegotiate: PUT points 400,
    #          PUT batch wins (new server)
    # flush 3: straight to the re-cached PUT batch
    assert [m for m, _ in reqs] == ["PUT"] * 3 + ["POST", "POST", "PUT", "PUT", "PUT"]
    assert "batch" in reqs[-1][1]


def test_qdrant_write_pinned_batch_keeps_reference_fallback(spark, mock_server):
    """payload_format='batch' pins the format INTENT but keeps the
    reference's batch -> flat_batch -> points fallback (writer.py:398-407)
    so a flat-batch-only server still succeeds."""
    acked = {"status": "ok", "result": {"status": "acknowledged"}}

    def put_flat_only(handler, body):
        if isinstance(body, dict) and "ids" in body and "batch" not in body:
            return acked
        return (400, {"status": {"error": "missing field `ids`"}})

    mock_server.route("PUT", "/collections/pbf/points", put_flat_only)
    qd.register(spark)
    df = spark.createDataFrame([(4, [0.4, 0.6], "d")], ["id", "vector", "name"])
    _qdrant_write(
        spark, mock_server, "pbf", df, batch_size=10,
        payload_format="batch", write_method="put",
    )
    reqs = _points_upserts(mock_server, "pbf")
    assert [m for m, _ in reqs] == ["PUT", "PUT"]  # batch 400, flat_batch ok
    assert "batch" in reqs[0][1]
    assert reqs[1][1]["ids"] == [4] and "batch" not in reqs[1][1]


def test_qdrant_write_server_error_is_not_renegotiated(spark, mock_server):
    """5xx is an outage, not a format problem: the writer raises on the
    first leg instead of walking the matrix and masking the real error."""
    mock_server.route(
        "PUT", "/collections/down/points", (503, {"status": {"error": "unavailable"}})
    )
    qd.register(spark)
    df = spark.createDataFrame([(1, [0.1, 0.2], "a")], ["id", "vector", "name"])
    with pytest.raises(Exception, match="status 503"):
        _qdrant_write(spark, mock_server, "down", df, batch_size=10, max_retries=0)
    reqs = _points_upserts(mock_server, "down")
    assert all(m == "PUT" for m, _ in reqs)  # never advanced to POST legs


def test_qdrant_write_config_validates_matrix_knobs():
    with pytest.raises(ValueError, match="payload_format"):
        qd.build_qdrant_write_config("http://h", "c", payload_format="csv")
    with pytest.raises(ValueError, match="write_method"):
        qd.build_qdrant_write_config("http://h", "c", write_method="patch")


# ------------------------------------------------------- REST streaming


def _stream_route(data):
    """Offset/limit endpoint over a (mutable) record list."""
    import urllib.parse as up

    def route(handler, body):
        q = up.parse_qs(up.urlparse(handler.path).query)
        off = int(q.get("offset", ["0"])[0])
        lim = int(q.get("limit", ["0"])[0])
        return {"total": len(data), "items": data[off : off + lim]}

    return route


def _stream_cfg(url, **overrides):
    stream = {
        "offset_param": "offset",
        "limit_param": "limit",
        "total_field": "total",
        "page_size": 10,
    }
    stream.update(overrides)
    return rest.build_rest_config(url, records_field="items", stream=stream)


def test_rest_stream_reader_protocol(mock_server):
    """Drive the DataSourceStreamReader contract directly (no Spark):
    offset probing, page partitioning, deterministic range replay, and
    the per-trigger cap."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    data = [{"id": i, "v": f"row{i}"} for i in range(25)]
    mock_server.route("GET", "/stream", _stream_route(data))
    cfg = json.loads(_stream_cfg(f"{mock_server.url}/stream", max_records_per_batch=8))
    schema = StructType([StructField("id", LongType()), StructField("v", StringType())])
    reader = rest._RestStreamReader(cfg, schema)

    assert reader.initialOffset() == {"pos": 0}
    first = reader.latestOffset()
    assert first == {"pos": 8}  # admission control applies to the FIRST probe too
    parts = reader.partitions({"pos": 0}, first)
    assert [(p.start, p.end) for p in parts] == [(0, 8)]
    got = [row for p in parts for row in reader.read(p)]
    assert got == [(i, f"row{i}") for i in range(8)]
    # subsequent probes drain the backlog cap-by-cap, clamped at total
    assert reader.latestOffset() == {"pos": 16}
    assert reader.latestOffset() == {"pos": 24}
    assert reader.latestOffset() == {"pos": 25}
    # deterministic replay of an arbitrary committed range (page-split)
    parts = reader.partitions({"pos": 5}, {"pos": 25})
    assert [(p.start, p.end) for p in parts] == [(5, 15), (15, 25)]
    assert list(reader.read(parts[1])) == [(i, f"row{i}") for i in range(15, 25)]

    data.extend({"id": i, "v": f"row{i}"} for i in range(25, 60))
    second = reader.latestOffset()
    assert second == {"pos": 33}  # growth capped at max_records_per_batch=8
    third = reader.latestOffset()
    assert third == {"pos": 41}
    # endpoint total shrinking must never move offsets backwards
    del data[50:]
    assert reader.latestOffset() == {"pos": 49}
    assert reader.latestOffset() == {"pos": 50}
    assert reader.latestOffset() == {"pos": 50}


def test_rest_stream_end_to_end(spark, mock_server):
    """readStream → memory sink: microbatches drain the endpoint and pick
    up appended records on later triggers."""
    import time
    import uuid

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    data = [{"id": i, "v": f"row{i}"} for i in range(25)]
    mock_server.route("GET", "/stream", _stream_route(data))
    rest.register(spark)
    cfg = _stream_cfg(f"{mock_server.url}/stream")
    schema = StructType([StructField("id", LongType()), StructField("v", StringType())])
    name = f"rest_stream_{uuid.uuid4().hex[:8]}"
    query = (
        spark.readStream.format(rest.FORMAT_NAME)
        .option(rest.CONFIG_OPTION, cfg)
        .option(rest.SCHEMA_OPTION, json.dumps(schema.jsonValue()))
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def wait_rows(n, timeout=60.0):
            deadline = time.time() + timeout
            while time.time() < deadline:
                if spark.sql(f"SELECT count(*) c FROM {name}").first().c >= n:
                    return
                time.sleep(0.5)
            raise AssertionError(
                f"timed out waiting for {n} rows; have "
                f"{spark.sql(f'SELECT count(*) c FROM {name}').first().c}"
            )

        wait_rows(25)
        data.extend({"id": i, "v": f"row{i}"} for i in range(25, 32))
        wait_rows(32)
        rows = spark.sql(f"SELECT id, v FROM {name} ORDER BY id").collect()
        assert [r.id for r in rows] == list(range(32))
        assert rows[31].v == "row31"
    finally:
        query.stop()


def test_qdrant_stream_writer_end_to_end(spark, mock_server):
    """Streaming pipeline across both connectors: REST stream source →
    writeStream into the Qdrant sink; upserted points must cover every
    source record exactly (idempotent by id)."""
    import time
    import uuid

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    data = [{"id": i, "vector": [float(i), 1.0]} for i in range(12)]
    mock_server.route("GET", "/stream", _stream_route(data))
    mock_server.route("PUT", "/collections/svecs/points", {"result": {}})
    rest.register(spark)
    qd.register(spark)
    read_cfg = _stream_cfg(f"{mock_server.url}/stream", page_size=5)
    write_cfg = qd.build_qdrant_write_config(
        mock_server.url, "svecs", id_column="id", vector_column="vector"
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("vector", ArrayType(DoubleType())),
        ]
    )
    query = (
        spark.readStream.format(rest.FORMAT_NAME)
        .option(rest.CONFIG_OPTION, read_cfg)
        .option(rest.SCHEMA_OPTION, json.dumps(schema.jsonValue()))
        .load()
        .writeStream.format(qd.FORMAT_NAME)
        .option(qd.CONFIG_OPTION, write_cfg)
        .option("checkpointLocation", f"/tmp/qdrant_stream_{uuid.uuid4().hex[:8]}")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        def upserted_ids():
            with mock_server.lock:
                reqs = list(mock_server.requests)
            ids = set()
            for method, path, body in reqs:
                if method == "PUT" and path.startswith("/collections/svecs/points"):
                    for p in (body or {}).get("points", []):
                        ids.add(p["id"])
            return ids

        deadline = time.time() + 60
        while time.time() < deadline and len(upserted_ids()) < 12:
            time.sleep(0.5)
        assert upserted_ids() == set(range(12))
    finally:
        query.stop()


class TestFilesSource:
    def _tree(self, tmp_path):
        (tmp_path / "a").mkdir()
        (tmp_path / "a" / "x.parquet").write_bytes(b"12345")
        (tmp_path / "a" / "y.txt").write_bytes(b"12")
        (tmp_path / "b" / "c").mkdir(parents=True)
        (tmp_path / "b" / "c" / "z.parquet").write_bytes(b"1234567")
        (tmp_path / "top.parquet").write_bytes(b"123")
        return str(tmp_path)

    def test_manifest_lists_tree_with_subtree_partitions(self, spark, tmp_path):
        from spark_fuse_spark.sources.files import register

        register(spark)
        root = self._tree(tmp_path)
        df = spark.read.format("fuse-files").option("root", root).load()
        rows = {r["name"]: r for r in df.collect()}
        assert set(rows) == {"x.parquet", "y.txt", "z.parquet", "top.parquet"}
        assert rows["x.parquet"]["size"] == 5 and rows["x.parquet"]["ext"] == "parquet"
        assert rows["top.parquet"]["depth"] == 0 and rows["z.parquet"]["depth"] == 2
        # one partition per immediate subdir + one for root-level files
        assert df.rdd.getNumPartitions() == 3

    def test_manifest_suffix_filter_and_flat_mode(self, spark, tmp_path):
        from spark_fuse_spark.sources.files import register

        register(spark)
        root = self._tree(tmp_path)
        pq = (
            spark.read.format("fuse-files")
            .option("root", root)
            .option("suffix", ".parquet")
            .load()
        )
        assert {r["name"] for r in pq.collect()} == {
            "x.parquet", "z.parquet", "top.parquet"
        }
        flat = (
            spark.read.format("fuse-files")
            .option("root", root)
            .option("recursive", "false")
            .load()
        )
        assert {r["name"] for r in flat.collect()} == {"top.parquet"}

    def test_manifest_drives_smallfiles_compaction(self, spark, tmp_path):
        """The audit loop: a fragmented dataset's manifest shows many tiny
        parquet files; compacting by the manifest's total size collapses
        them; the re-read manifest confirms."""
        import math

        from spark_fuse_spark.operators.layout import write_compacted
        from spark_fuse_spark.sources.files import register

        register(spark)
        frag = str(tmp_path / "frag")
        spark.range(2000).repartition(16).write.parquet(frag)

        def manifest(root):
            return (
                spark.read.format("fuse-files")
                .option("root", root)
                .option("suffix", ".parquet")
                .load()
            )

        before = manifest(frag).collect()
        assert len(before) == 16
        total = sum(r["size"] for r in before)
        target = total  # everything fits one target-size file
        compact = str(tmp_path / "compact")
        n = write_compacted(spark.read.parquet(frag), compact, target_file_bytes=target)
        assert n == math.ceil(total / target) <= 2
        after = manifest(compact).collect()
        assert len(after) <= 2 < len(before)
        assert (
            spark.read.parquet(compact).count()
            == spark.read.parquet(frag).count()
            == 2000
        )


# ------------------------------------------------------ arrow-batched reads


def test_arrow_batch_iterator_yields_record_batches():
    import pyarrow as pa
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from spark_fuse_spark.sources.arrowbatch import arrow_batch_iterator

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("vec", ArrayType(FloatType())),
        ]
    )
    records = iter(
        [{"id": i, "name": f"n{i}", "vec": [0.1 * i], "extra": "dropped"} for i in range(5)]
    )
    out = list(arrow_batch_iterator(records, schema, batch_size=2))
    assert all(isinstance(b, pa.RecordBatch) for b in out)
    assert [b.num_rows for b in out] == [2, 2, 1]
    assert out[0].schema.names == ["id", "name", "vec"]
    # missing keys become nulls (same projection semantics as the tuple path)
    row = list(arrow_batch_iterator(iter([{"id": 9}]), schema, batch_size=8))[0]
    assert row.to_pylist() == [{"id": 9, "name": None, "vec": None}]


def test_arrow_batch_iterator_falls_back_to_tuples_on_bad_first_batch():
    from pyspark.sql.types import LongType, StructField, StructType

    from spark_fuse_spark.sources.arrowbatch import arrow_batch_iterator

    schema = StructType([StructField("id", LongType())])
    # a string in a long column: first batch fails to convert -> whole
    # stream degrades to tuples, nothing is lost
    records = iter([{"id": "not-a-long"}, {"id": 2}, {"id": 3}])
    out = list(arrow_batch_iterator(records, schema, batch_size=2))
    assert out == [("not-a-long",), (2,), (3,)]


def test_arrow_batch_iterator_raises_on_midstream_type_drift():
    import pyarrow as pa
    from pyspark.sql.types import LongType, StructField, StructType

    from spark_fuse_spark.sources.arrowbatch import arrow_batch_iterator

    schema = StructType([StructField("id", LongType())])
    records = iter([{"id": 1}, {"id": 2}, {"id": "drift"}, {"id": 4}])
    it = arrow_batch_iterator(records, schema, batch_size=2)
    first = next(it)
    assert isinstance(first, pa.RecordBatch)
    # the error names the drifting field and quotes the offending value
    with pytest.raises(RuntimeError, match=r"mid-stream.*'id'.*'drift'"):
        list(it)


def test_qdrant_read_arrow_and_tuple_paths_agree(spark, mock_server):
    points = [
        {"id": i, "payload": {"name": f"p{i}", "score": i * 1.5}} for i in range(7)
    ]
    mock_server.route(
        "POST",
        "/collections/vecs/points/scroll",
        {"status": "ok", "result": {"points": points, "next_page_offset": None}},
    )
    qd.register(spark)

    def read(arrow):
        cfg = qd.build_qdrant_read_config(
            mock_server.url, "vecs", page_size=3, arrow_batches=arrow
        )
        df = spark.read.format(qd.FORMAT_NAME).option(qd.CONFIG_OPTION, cfg).load()
        return sorted(tuple(r) for r in df.collect())

    assert read(True) == read(False)


def test_rest_read_arrow_and_tuple_paths_agree(spark, mock_server):
    records = [{"id": i, "name": f"r{i}", "score": i / 2} for i in range(6)]
    mock_server.route("GET", "/items", {"data": records})
    rest.register(spark)

    def read(arrow):
        cfg = rest.build_rest_config(
            f"{mock_server.url}/items", records_field="data", arrow_batches=arrow
        )
        df = spark.read.format(rest.FORMAT_NAME).option(rest.CONFIG_OPTION, cfg).load()
        return sorted(tuple(r) for r in df.collect())

    assert read(True) == read(False)


def test_sparql_read_arrow_and_tuple_paths_agree(spark, mock_server):
    # mixed-type SELECT (string URI, typed double, null cell) + metadata
    # columns — exactly the value shapes that must normalize identically
    # on both representations
    mock_server.route("POST", "/sparql", _sparql_select_payload())
    sq.register(spark)

    def read(arrow):
        cfg = sq.build_sparql_config(
            f"{mock_server.url}/sparql",
            "SELECT ?name ?age WHERE {}",
            include_metadata=True,
            arrow_batches=arrow,
        )
        df = spark.read.format(sq.FORMAT_NAME).option(sq.CONFIG_OPTION, cfg).load()
        return df.columns, sorted(
            tuple(r) for r in df.collect()
        )

    assert read(True) == read(False)
