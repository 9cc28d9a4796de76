"""Paginated JSON REST API data source (PySpark Python Data Source API).

Capability parity with the reference REST connector
(``/root/reference/src/spark_fuse/io/rest_api.py:557-728``): one JSON
config option carrying sources/params/pagination/request shape, three
pagination modes (query/page, token/cursor, response/link), default
record-container keys ``data/results/items/value``, optional raw-payload
column, retry/backoff, and chunked partition planning.

Architecture differences (scale fixes, SURVEY.md §4.3):
* schema inference samples only the FIRST work item and caps records —
  the reference re-fetches the whole source once for schema and again
  for data;
* page-mode pagination fans out one work item per page and chunks into
  ``ceil(n/parallelism)`` partitions, so page fetches run concurrently
  across executors (token/response chains are inherently serial — one
  partition each, documented).

Usage::

    register(spark)
    cfg = build_rest_config("https://api.example.com/items",
                            pagination={"mode": "query", "param": "page",
                                        "start": 1, "stop": 10})
    df = (spark.read.format("fuse-rest")
          .option("fuse.rest.config", cfg).load())
"""

from __future__ import annotations

import json
import math
import urllib.parse
from typing import Any, Iterator, Mapping, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)
from pyspark.sql.types import StructType, _infer_schema, _merge_type

from .http import HttpClient, get_nested, merge_query_params, validate_http_url

__all__ = ["RestDataSource", "register", "build_rest_config", "FORMAT_NAME", "CONFIG_OPTION"]

FORMAT_NAME = "fuse-rest"
CONFIG_OPTION = "fuse.rest.config"
SCHEMA_OPTION = "fuse.rest.schema"
DEFAULT_RECORD_KEYS: Sequence[str] = ("data", "results", "items", "value")
_REGISTERED: set[str] = set()


def register(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id not in _REGISTERED:
        spark.dataSource.register(RestDataSource)
        _REGISTERED.add(app_id)


# ----------------------------------------------------------------- config
def build_rest_config(
    url: "str | list[str]",
    *,
    params: "Mapping[str, Any] | None" = None,
    pagination: "Mapping[str, Any] | None" = None,
    records_field: "str | None" = None,
    request_type: str = "GET",
    body: Any = None,
    body_type: str = "json",
    headers: "Mapping[str, str] | None" = None,
    timeout: float = 30.0,
    max_retries: int = 3,
    backoff_factor: float = 0.5,
    include_response_payload: bool = False,
    response_payload_field: str = "raw_payload",
    parallelism: "int | None" = None,
    infer_schema: bool = True,
    infer_sample_records: int = 100,
    stream: "Mapping[str, Any] | None" = None,
    filter_param_map: "Mapping[str, str | Mapping[str, str]] | None" = None,
    arrow_batches: bool = True,
) -> str:
    """Validate + normalize connector options into the JSON config string.

    ``stream`` enables ``spark.readStream.format("fuse-rest")`` against an
    offset-paginated endpoint (see :class:`_RestStreamReader`):
    ``offset_param``/``limit_param`` (required) are the endpoint's
    offset/limit query parameters, ``total_field`` (required) is the
    dotted path of the total-record-count field in the response payload,
    ``page_size`` (default 100) rows per request, ``max_records_per_batch``
    (default 32*page_size) caps one microbatch, ``start_offset``
    (default 0) is the initial position.

    ``filter_param_map`` maps result-column names to server-side query
    parameters the endpoint natively filters by.  A plain-string value
    (``{"status": "status"}`` for ``GET /items?status=open``) pushes
    equality only; to additionally push IN predicates the endpoint's
    list convention must be declared explicitly with a dict spec —
    ``{"kind": {"param": "kind", "in_delimiter": ","}}`` renders
    ``kind=a,b,c`` (operands containing the delimiter are skipped).
    When Catalyst pushes a predicate on a mapped column, the value is
    appended to every request's query string so the server prunes records
    before they cross the wire; Spark still re-evaluates the predicate
    post-scan, so an endpoint that ignores the parameter stays correct
    (see ``_RestPushdownReader.pushFilters``; requires
    ``spark.sql.python.filterPushdown.enabled=true``, set by
    ``create_session``).

    ``arrow_batches=True`` (default) emits ``pyarrow.RecordBatch``es from
    the reader instead of per-row pickled tuples — columnar bulk transfer
    across the Python↔JVM boundary.  Falls back to tuples automatically
    when the schema or the first batch does not convert cleanly to
    Arrow; set False to force the row path."""
    sources = [url] if isinstance(url, str) else list(url)
    for u in sources:
        validate_http_url(u)
    if body_type not in ("json", "form", "raw"):
        raise ValueError("body_type must be json|form|raw")
    if pagination is not None:
        mode = str(pagination.get("mode", "query")).lower()
        if mode in ("token", "cursor"):
            if not pagination.get("param"):
                raise ValueError("token pagination requires 'param'")
            if not pagination.get("field"):
                raise ValueError("token pagination requires 'field'")
        elif mode in ("query", "page"):
            if (
                pagination.get("stop") is None
                and pagination.get("max_pages") is None
                and pagination.get("values") is None
            ):
                raise ValueError("query pagination requires stop, max_pages, or values")
        elif mode not in ("response", "link"):
            raise ValueError(f"unsupported pagination mode {mode!r}")
    if filter_param_map:
        for col_name, spec in filter_param_map.items():
            if isinstance(spec, str):
                continue
            if not isinstance(spec, Mapping) or not spec.get("param"):
                raise ValueError(
                    f"filter_param_map[{col_name!r}] must be a parameter name "
                    "or a dict with 'param' (and optional 'in_delimiter')"
                )
    if stream is not None:
        for key in ("offset_param", "limit_param", "total_field"):
            if not stream.get(key):
                raise ValueError(f"stream config requires {key!r}")
        if int(stream.get("page_size", 100)) <= 0:
            raise ValueError("stream.page_size must be positive")
    cfg = {
        "sources": sources,
        "params": dict(params or {}),
        "pagination": dict(pagination) if pagination else None,
        "records_field": records_field,
        "request_type": request_type.upper(),
        "body": body,
        "body_type": body_type,
        "headers": dict(headers or {}),
        "timeout": timeout,
        "max_retries": max_retries,
        "backoff_factor": backoff_factor,
        "include_response_payload": include_response_payload,
        "response_payload_field": response_payload_field,
        "parallelism": parallelism,
        "infer_schema": infer_schema,
        "infer_sample_records": infer_sample_records,
        "stream": dict(stream) if stream else None,
        "arrow_batches": arrow_batches,
        "filter_param_map": (
            {
                k: (dict(v) if isinstance(v, Mapping) else v)
                for k, v in filter_param_map.items()
            }
            if filter_param_map
            else None
        ),
    }
    return json.dumps(cfg)


def _records_path(value: "str | None") -> "list[str] | None":
    if not value or not str(value).strip():
        return None
    return str(value).strip().split(".")


def _extract_records(payload: Any, records_field: "list[str] | None") -> list:
    """Pull the record list out of a response payload (reference
    ``rest_api.py:56-77`` semantics: explicit dotted field, else first of
    the default container keys holding a list, else the payload itself)."""
    if records_field:
        data = get_nested(payload, records_field)
    elif isinstance(payload, list):
        data = payload
    elif isinstance(payload, Mapping):
        data = next(
            (payload[k] for k in DEFAULT_RECORD_KEYS if isinstance(payload.get(k), list)),
            payload,
        )
    else:
        data = payload
    if data is None:
        return []
    if isinstance(data, list):
        return data
    return [data]


def _page_values(pg: Mapping[str, Any]) -> Iterator[Any]:
    explicit = pg.get("values")
    if explicit is not None:
        yield from explicit
        return
    start, stop, step = pg.get("start", 1), pg.get("stop"), pg.get("step", 1)
    max_pages = pg.get("max_pages")
    count, value = 0, start
    while True:
        if max_pages is not None and count >= max_pages:
            break
        if stop is not None and ((step > 0 and value > stop) or (step < 0 and value < stop)):
            break
        yield value
        count += 1
        value += step


def _work_items(cfg: Mapping[str, Any]) -> list[dict]:
    sources: list[str] = cfg["sources"]
    if not sources:
        raise ValueError("REST connector requires at least one source URL")
    params = cfg.get("params") or {}
    if len(sources) > 1:
        return [{"mode": "single", "url": merge_query_params(u, params)} for u in sources]
    base = sources[0]
    pg = cfg.get("pagination")
    if not pg:
        return [{"mode": "single", "url": merge_query_params(base, params)}]
    mode = str(pg.get("mode", "query")).lower()
    extra = dict(pg.get("extra_params") or {})
    if pg.get("page_size_param") and "page_size" in pg:
        extra[pg["page_size_param"]] = pg["page_size"]
    if mode in ("query", "page"):
        items = []
        for value in _page_values(pg):
            p = {**params, **extra, pg.get("param", "page"): value}
            items.append({"mode": "single", "url": merge_query_params(base, p)})
        return items
    if mode in ("token", "cursor"):
        base_params = {**params, **extra}
        if pg.get("start") is not None:
            base_params[pg["param"]] = pg["start"]
        return [
            {
                "mode": "token",
                "url": base,
                "params": base_params,
                "token_param": str(pg["param"]),
                "field": pg["field"],
                "max_pages": pg.get("max_pages"),
            }
        ]
    # response/link
    return [
        {
            "mode": "response",
            "url": merge_query_params(base, params),
            "field": pg.get("field", "next"),
            "max_pages": pg.get("max_pages"),
        }
    ]


# ------------------------------------------------------------------ fetch
def _request_kwargs(cfg: Mapping[str, Any]) -> dict:
    body, body_type = cfg.get("body"), cfg.get("body_type", "json")
    kwargs: dict = {}
    if body is not None:
        if body_type == "json":
            kwargs["json_body"] = body
        elif body_type == "form":
            kwargs["data"] = urllib.parse.urlencode(body).encode()
            kwargs["content_type"] = "application/x-www-form-urlencoded"
        else:
            kwargs["data"] = str(body).encode()
            kwargs["content_type"] = "text/plain"
    return kwargs


def _iter_item_records(client: HttpClient, item: Mapping[str, Any],
                       cfg: Mapping[str, Any]) -> Iterator[dict]:
    method = cfg.get("request_type", "GET")
    rfield = _records_path(cfg.get("records_field"))
    include_payload = cfg.get("include_response_payload", False)
    payload_field = cfg.get("response_payload_field", "raw_payload")
    kwargs = _request_kwargs(cfg)

    def rows(payload) -> Iterator[dict]:
        for rec in _extract_records(payload, rfield):
            row = dict(rec) if isinstance(rec, Mapping) else {"value": rec}
            if include_payload:
                row[payload_field] = json.dumps(payload)
            yield row

    mode = item["mode"]
    if mode == "single":
        payload = client.request_json(item["url"], method, **kwargs)
        if payload is not None:
            yield from rows(payload)
        return

    if mode == "token":
        token_path = _records_path(item["field"]) or [str(item["field"])]
        params = dict(item.get("params") or {})
        token_param, max_pages, page = item["token_param"], item.get("max_pages"), 0
        token = params.get(token_param)
        while True:
            page += 1
            if max_pages is not None and page > max_pages:
                break
            p = dict(params)
            if token not in (None, ""):
                p[token_param] = token
            else:
                p.pop(token_param, None)
            payload = client.request_json(merge_query_params(item["url"], p), method, **kwargs)
            if payload is None:
                break
            yield from rows(payload)
            token = get_nested(payload, token_path)
            if token in (None, ""):
                break
        return

    # response/link chain
    next_path = _records_path(item["field"]) or ["next"]
    url, max_pages, page = item["url"], item.get("max_pages"), 0
    while url:
        page += 1
        if max_pages is not None and page > max_pages:
            break
        payload = client.request_json(url, method, **kwargs)
        if payload is None:
            break
        yield from rows(payload)
        nxt = get_nested(payload, next_path)
        if not nxt or not isinstance(nxt, str):
            break
        url = nxt if nxt.startswith(("http://", "https://")) else urllib.parse.urljoin(url, nxt)


# ------------------------------------------------------------- data source
class _RestPartition(InputPartition):
    def __init__(self, items_json: str):
        self.items_json = items_json


def _rest_param_value(value: Any) -> "str | None":
    """Render one predicate operand as a query-string value (None = unpushable).

    Floats are deliberately unpushable: ``str(1.0)`` renders ``"1.0"`` while
    the endpoint may store/compare ``"1"`` — and because server-side filtering
    is subtractive, a textual mismatch silently drops matching rows that
    Spark's re-evaluation can never restore.
    """
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, (str, int)):
        return str(value)
    return None


class _RestReader(DataSourceReader):
    def __init__(self, cfg: dict, schema: StructType):
        self.cfg = cfg
        self.schema = schema

    def partitions(self) -> list[InputPartition]:
        items = _work_items(self.cfg)
        par = self.cfg.get("parallelism") or len(items) or 1
        chunk = max(math.ceil(len(items) / max(par, 1)), 1)
        return [
            _RestPartition(json.dumps(items[i : i + chunk]))
            for i in range(0, len(items), chunk)
        ] or [_RestPartition("[]")]

    def read(self, partition: _RestPartition) -> Iterator:
        client = HttpClient(
            timeout=self.cfg.get("timeout", 30.0),
            max_retries=self.cfg.get("max_retries", 3),
            backoff_factor=self.cfg.get("backoff_factor", 0.5),
            headers=self.cfg.get("headers") or {},
        )

        def records() -> Iterator[dict]:
            for item in json.loads(partition.items_json):
                yield from _iter_item_records(client, item, self.cfg)

        if self.cfg.get("arrow_batches", True):
            from .arrowbatch import arrow_batch_iterator

            yield from arrow_batch_iterator(records(), self.schema)
            return
        names = self.schema.fieldNames()
        for row in records():
            yield tuple(row.get(n) for n in names)


class _RestPushdownReader(_RestReader):
    """Reader variant with Catalyst → query-parameter predicate pushdown.

    Selected only when the config declares a ``filter_param_map`` —
    Spark 4.1 hard-errors on readers that define ``pushFilters`` while
    ``spark.sql.python.filterPushdown.enabled`` is false, so the default
    reader must not carry the method (``create_session`` enables the
    conf).
    """

    def pushFilters(self, filters: "list[Filter]"):
        """Catalyst predicate pushdown → server-side query parameters.

        Only columns the user has declared in ``filter_param_map`` are
        pushed (the connector can't know which parameters an arbitrary
        endpoint filters by — the reference's config-static ``params``,
        ``rest_api.py:557-605``, is the same contract minus Catalyst
        integration).  By default only equality pushes (``param=value``):
        IN would have to assume a server-side list convention (e.g.
        comma-joined), and an endpoint that instead matches the literal
        string ``"a,b,c"`` returns a subset Spark cannot recover — server
        filtering is subtractive.  IN therefore requires an explicit
        per-param opt-in declaring the endpoint's convention: a dict spec
        ``{"param": "status", "in_delimiter": ","}``.  Operands containing
        the declared delimiter are never pushed (they would be re-split
        server-side).  Every filter is returned for Spark-side
        re-evaluation, so endpoints that ignore unknown parameters still
        yield correct results — pushdown is a transfer-volume
        optimization, never a correctness dependency.
        """
        fmap = self.cfg.get("filter_param_map") or {}
        pushed: dict[str, str] = {}
        for f in filters:
            attr = getattr(f, "attribute", None)
            if not attr or len(attr) != 1 or attr[0] not in fmap:
                continue
            spec = fmap[attr[0]]
            if isinstance(spec, str):
                param, delim = spec, None
            else:
                param = spec.get("param")
                delim = spec.get("in_delimiter")
                if not param:
                    continue
            if isinstance(f, EqualTo):
                value = _rest_param_value(f.value)
                if value is not None and (delim is None or delim not in value):
                    pushed[param] = value
            elif isinstance(f, In) and delim:
                values = [_rest_param_value(v) for v in f.value]
                if values and all(v is not None and delim not in v for v in values):
                    pushed[param] = delim.join(values)  # type: ignore[arg-type]
        if pushed:
            cfg = dict(self.cfg)
            cfg["params"] = {**(cfg.get("params") or {}), **pushed}
            self.cfg = cfg
        return filters


class RestDataSource(DataSource):
    """``spark.read.format("fuse-rest")`` — paginated JSON-over-HTTP."""

    def __init__(self, options: dict):
        super().__init__(options)
        raw = options.get(CONFIG_OPTION) or options.get(CONFIG_OPTION.lower())
        if not raw:
            raise ValueError(f"missing required option {CONFIG_OPTION!r}")
        self.cfg = json.loads(raw)
        schema_json = options.get(SCHEMA_OPTION) or options.get(SCHEMA_OPTION.lower())
        self.user_schema = (
            StructType.fromJson(json.loads(schema_json)) if schema_json else None
        )

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        if self.user_schema is not None:
            return self.user_schema
        if not self.cfg.get("infer_schema", True):
            raise ValueError(
                f"infer_schema is disabled: supply {SCHEMA_OPTION!r} (StructType JSON)"
            )
        return self._infer()

    def _infer(self) -> StructType:
        """Sample-capped inference from the FIRST work item only (the
        reference re-fetches everything twice; see SURVEY.md §4.3.1)."""
        client = HttpClient(
            timeout=self.cfg.get("timeout", 30.0),
            max_retries=self.cfg.get("max_retries", 3),
            backoff_factor=self.cfg.get("backoff_factor", 0.5),
            headers=self.cfg.get("headers") or {},
        )
        cap = int(self.cfg.get("infer_sample_records", 100))
        merged = None
        for item in _work_items(self.cfg)[:1]:
            for i, row in enumerate(_iter_item_records(client, item, self.cfg)):
                if i >= cap:
                    break
                inferred = _infer_schema(row, infer_dict_as_struct=True)
                merged = inferred if merged is None else _merge_type(merged, inferred)
        if merged is None:
            raise ValueError("schema inference found no records; supply an explicit schema")
        return merged

    def reader(self, schema: StructType) -> DataSourceReader:
        if self.cfg.get("filter_param_map"):
            return _RestPushdownReader(self.cfg, schema)
        return _RestReader(self.cfg, schema)

    def streamReader(self, schema: StructType) -> "DataSourceStreamReader":
        if not self.cfg.get("stream"):
            raise ValueError(
                "streaming read requires a 'stream' section in the config "
                "(build_rest_config(..., stream={'offset_param': ..., "
                "'limit_param': ..., 'total_field': ...}))"
            )
        return _RestStreamReader(self.cfg, schema)


# --------------------------------------------------------------- streaming
class _RestStreamPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _RestStreamReader(DataSourceStreamReader):
    """Offset-paginated streaming reader for append-only REST endpoints.

    Model: the endpoint exposes a monotonically growing record list
    addressed by ``?<offset_param>=N&<limit_param>=K`` plus a total-count
    field in the payload.  Offsets are ``{"pos": N}`` — the number of
    records consumed so far:

    * ``latestOffset`` probes with ``limit=0`` and advances to the
      endpoint's reported total, capped at ``max_records_per_batch`` per
      trigger so one enormous backlog cannot produce an unbounded batch;
    * ``partitions(start, end)`` splits ``[start, end)`` into
      ``page_size`` ranges — one page fetch per task, so a microbatch's
      pages download in PARALLEL across executors (this is the streaming
      analog of the batch reader's page fan-out, and the scale story:
      throughput per trigger = page_size × parallelism, not one serial
      cursor walk);
    * ``read`` re-fetches a range deterministically from its offsets, so
      a failed/replayed batch returns the same rows (exactly-once into
      transactional sinks) provided the endpoint is append-only —
      documented contract, same as any offset-replayable source;
    * ``commit`` is a no-op (nothing to acknowledge server-side).

    The streaming twin of the reference's page-mode batch pagination
    (``/root/reference/src/spark_fuse/io/rest_api.py:88-114,397-410``);
    the reference itself has no streaming surface (SURVEY.md §2.9).
    """

    def __init__(self, cfg: dict, schema: StructType):
        self.cfg = cfg
        self.schema = schema
        self.stream = cfg["stream"]
        self.page_size = int(self.stream.get("page_size", 100))
        self.max_per_batch = int(
            self.stream.get("max_records_per_batch", self.page_size * 32)
        )
        self.url = cfg["sources"][0]

    def _client(self) -> HttpClient:
        return HttpClient(
            timeout=self.cfg.get("timeout", 30.0),
            max_retries=self.cfg.get("max_retries", 3),
            backoff_factor=self.cfg.get("backoff_factor", 0.5),
            headers=self.cfg.get("headers") or {},
        )

    def _fetch(self, client: HttpClient, offset: int, limit: int):
        params = dict(self.cfg.get("params") or {})
        params[self.stream["offset_param"]] = offset
        params[self.stream["limit_param"]] = limit
        return client.request_json(
            merge_query_params(self.url, params),
            self.cfg.get("request_type", "GET"),
            **_request_kwargs(self.cfg),
        )

    def initialOffset(self) -> dict:
        return {"pos": int(self.stream.get("start_offset", 0))}

    def latestOffset(self) -> dict:
        payload = self._fetch(self._client(), 0, 0)
        total_path = _records_path(self.stream["total_field"]) or ["total"]
        raw = get_nested(payload, total_path) if payload is not None else None
        total = int(raw) if isinstance(raw, (int, float)) else None
        floor = int(self.stream.get("start_offset", 0))
        last = getattr(self, "_last_offset", None)
        if last is None:
            # first probe of this run: admission control applies here too
            # — a fresh query against a large backlog gets a bounded
            # first microbatch instead of the whole endpoint in one
            # trigger.  If a restarted checkpoint is ahead of this
            # position, the engine plans (checkpoint, latest) with
            # latest <= checkpoint, i.e. empty batches, until the
            # tracked position catches up — never a backwards range.
            pos = floor if total is None else min(total, floor + self.max_per_batch)
        else:
            pos = int(last["pos"])
            if total is not None:
                pos = max(pos, min(total, pos + self.max_per_batch))
        self._last_offset = {"pos": max(pos, floor)}
        return self._last_offset

    def partitions(self, start: dict, end: dict) -> "list[InputPartition]":
        lo, hi = int(start["pos"]), int(end["pos"])
        return [
            _RestStreamPartition(i, min(i + self.page_size, hi))
            for i in range(lo, hi, self.page_size)
        ]

    def read(self, partition: _RestStreamPartition) -> Iterator[tuple]:
        client = self._client()
        rfield = _records_path(self.cfg.get("records_field"))
        names = self.schema.fieldNames()
        payload = self._fetch(client, partition.start, partition.end - partition.start)
        if payload is None:
            return
        for rec in _extract_records(payload, rfield):
            row = dict(rec) if isinstance(rec, Mapping) else {"value": rec}
            yield tuple(row.get(n) for n in names)

    def commit(self, end: dict) -> None:
        pass
