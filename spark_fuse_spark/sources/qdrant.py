"""Qdrant vector-store read/write data source (PySpark Python Data Source API).

Capability parity with the reference connector
(``/root/reference/src/spark_fuse/io/qdrant/reader.py:219-325`` scroll
read, ``writer.py:388-509`` batched upsert write, ``writer.py:162-199``
collection auto-create, ``writer.py:26-72`` vector normalization):

* read: scroll-API pagination (``POST /collections/{c}/points/scroll``
  with ``next_page_offset`` cursor), ``with_payload``/``with_vectors``
  projection, server-side ``filter`` JSON, ``limit``/``page_size``/
  ``max_pages``, ``api-key`` header auth;
* write: batched point upserts negotiating the reference's FULL
  payload-format x verb matrix (``points`` modern list, ``batch``
  PointsBatch envelope, ``flat_batch`` legacy columnar — each via PUT or
  POST; ``writer.py:388-467``), pinnable via ``payload_format`` /
  ``write_method`` config, with the winning leg cached per task; optional
  collection auto-create with the vector schema derived from the first
  record, id/vector/payload column mapping, strict numeric vector
  coercion (incl. MLlib DenseVector and numpy arrays).

Scale fixes over the reference (SURVEY.md §4.3):

* the reference reads in ONE partition (``reader.py:317-318``) and
  re-scrolls the entire collection for schema inference.  Here schema
  inference samples a single capped page, and reads can be sharded
  across executors via ``partition_filters`` — a list of Qdrant filter
  objects (e.g. payload-field ranges or ``group_id`` matches), one scroll
  per partition, each merged with the base filter.  Cursor pagination is
  inherently serial per shard, so user-declared shards are the honest
  parallelism contract at 100 TB.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Mapping, Sequence

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import Row, StructType, _infer_schema, _merge_type

from .http import HttpClient, validate_http_url

__all__ = [
    "QdrantDataSource",
    "register",
    "build_qdrant_read_config",
    "build_qdrant_write_config",
    "FORMAT_NAME",
    "CONFIG_OPTION",
]

FORMAT_NAME = "fuse-qdrant"
CONFIG_OPTION = "fuse.qdrant.config"
SCHEMA_OPTION = "fuse.qdrant.schema"
_REGISTERED: set[str] = set()


def register(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id not in _REGISTERED:
        spark.dataSource.register(QdrantDataSource)
        _REGISTERED.add(app_id)


# ----------------------------------------------------------------- config


def build_qdrant_read_config(
    endpoint: str,
    collection: str,
    *,
    api_key: "str | None" = None,
    headers: "Mapping[str, str] | None" = None,
    with_payload: Any = True,
    with_vectors: Any = False,
    filter: "Mapping[str, Any] | None" = None,  # noqa: A002 - Qdrant's own name
    partition_filters: "Sequence[Mapping[str, Any]] | None" = None,
    limit: "int | None" = None,
    page_size: int = 128,
    max_pages: "int | None" = None,
    timeout: float = 30.0,
    max_retries: int = 3,
    backoff_factor: float = 0.5,
    infer_schema: bool = True,
    infer_sample_records: int = 100,
    predicate_pushdown: bool = False,
    arrow_batches: bool = True,
) -> str:
    """Validate + serialize a scroll-read config for the ``fuse-qdrant`` format.

    ``predicate_pushdown=True`` lets Catalyst WHERE predicates on payload
    fields / point ids reach the server-side scroll ``filter`` (see
    ``_QdrantPushdownReader.pushFilters``); Spark still re-evaluates every
    predicate post-scan, so this is purely a transfer-volume optimization.
    Requires ``spark.sql.python.filterPushdown.enabled=true`` (set by
    ``create_session``) — hence opt-in.

    ``arrow_batches=True`` (default) emits ``pyarrow.RecordBatch``es from
    the reader instead of per-row pickled tuples — columnar bulk transfer
    across the Python↔JVM boundary (one batch per scroll page).  Falls
    back to tuples automatically when the schema or the first page does
    not convert cleanly to Arrow; set False to force the row path.
    """
    validate_http_url(endpoint)
    if not collection.strip():
        raise ValueError("collection must be non-empty")
    if page_size <= 0:
        raise ValueError("page_size must be positive")
    if limit is not None and limit <= 0:
        raise ValueError("limit must be positive when provided")
    if max_pages is not None and max_pages <= 0:
        raise ValueError("max_pages must be positive when provided")
    cfg = {
        "mode": "read",
        "endpoint": endpoint.rstrip("/"),
        "collection": collection.strip(),
        "api_key": api_key,
        "headers": dict(headers or {}),
        "with_payload": with_payload,
        "with_vectors": with_vectors,
        "filter": filter,
        "partition_filters": [dict(f) for f in partition_filters] if partition_filters else None,
        "limit": limit,
        "page_size": min(page_size, limit) if limit else page_size,
        "max_pages": max_pages,
        "timeout": timeout,
        "max_retries": max_retries,
        "backoff_factor": backoff_factor,
        "infer_schema": infer_schema,
        "infer_sample_records": infer_sample_records,
        "predicate_pushdown": predicate_pushdown,
        "arrow_batches": arrow_batches,
    }
    return json.dumps(cfg)


def build_qdrant_write_config(
    endpoint: str,
    collection: str,
    *,
    api_key: "str | None" = None,
    headers: "Mapping[str, str] | None" = None,
    id_column: str = "id",
    vector_column: str = "vector",
    payload_columns: "Sequence[str] | None" = None,
    batch_size: int = 128,
    create_collection: bool = False,
    distance: str = "Cosine",
    wait: bool = True,
    timeout: float = 30.0,
    max_retries: int = 3,
    backoff_factor: float = 0.5,
    payload_format: str = "auto",
    write_method: str = "auto",
) -> str:
    """Validate + serialize an upsert-write config for the ``fuse-qdrant`` format.

    ``payload_format`` pins the request shape (``points`` modern list,
    ``batch`` PointsBatch envelope, ``flat_batch`` legacy columnar) and
    ``write_method`` the HTTP verb; ``auto`` negotiates the full 6-leg
    matrix the reference speaks (``writer.py:388-467``), PUT before POST,
    points -> batch -> flat_batch within each verb.
    """
    validate_http_url(endpoint)
    if not collection.strip():
        raise ValueError("collection must be non-empty")
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    if payload_format not in ("auto", "points", "batch", "flat_batch"):
        raise ValueError(
            "payload_format must be one of auto|points|batch|flat_batch, "
            f"got {payload_format!r}"
        )
    if write_method not in ("auto", "put", "post"):
        raise ValueError(f"write_method must be one of auto|put|post, got {write_method!r}")
    cfg = {
        "mode": "write",
        "endpoint": endpoint.rstrip("/"),
        "collection": collection.strip(),
        "api_key": api_key,
        "headers": dict(headers or {}),
        "id_column": id_column,
        "vector_column": vector_column,
        "payload_columns": list(payload_columns) if payload_columns is not None else None,
        "batch_size": batch_size,
        "create_collection": create_collection,
        "distance": distance,
        "wait": wait,
        "timeout": timeout,
        "max_retries": max_retries,
        "backoff_factor": backoff_factor,
        "payload_format": payload_format,
        "write_method": write_method,
    }
    return json.dumps(cfg)


def _client(cfg: Mapping[str, Any]) -> HttpClient:
    headers = dict(cfg.get("headers") or {})
    if cfg.get("api_key"):
        headers.setdefault("api-key", str(cfg["api_key"]))
    return HttpClient(
        timeout=cfg.get("timeout", 30.0),
        max_retries=cfg.get("max_retries", 3),
        backoff_factor=cfg.get("backoff_factor", 0.5),
        headers=headers,
    )


# ----------------------------------------------------------------- read


def _merged_filter(base: "Mapping | None", shard: "Mapping | None") -> "dict | None":
    if base and shard:
        return {"must": [dict(base), dict(shard)]}
    chosen = base or shard
    return dict(chosen) if chosen else None


def _scroll_points(
    cfg: Mapping[str, Any],
    shard_filter: "Mapping[str, Any] | None",
    record_cap: "int | None" = None,
) -> Iterator[dict]:
    """Yield normalized point dicts: id, vector?, payload-dict flattened in."""
    client = _client(cfg)
    url = f"{cfg['endpoint']}/collections/{cfg['collection']}/points/scroll"
    scroll_filter = _merged_filter(cfg.get("filter"), shard_filter)
    include_vectors = bool(cfg.get("with_vectors"))
    include_payload = cfg.get("with_payload") is not False

    remaining = cfg.get("limit")
    if record_cap is not None:
        remaining = min(remaining, record_cap) if remaining else record_cap
    offset, pages = None, 0
    while True:
        body: dict[str, Any] = {
            "limit": min(cfg["page_size"], remaining) if remaining else cfg["page_size"],
            "with_payload": cfg.get("with_payload", True),
            "with_vectors": cfg.get("with_vectors", False),
        }
        if scroll_filter is not None:
            body["filter"] = scroll_filter
        if offset is not None:
            body["offset"] = offset
        resp = client.request_json(url, method="POST", json_body=body)
        if resp is None:
            raise RuntimeError(f"Qdrant scroll failed after retries: {url}")
        if str(resp.get("status", "ok")).lower() != "ok":
            raise RuntimeError(f"Qdrant returned non-ok status: {resp.get('status')}")
        result = resp.get("result") or {}
        for point in result.get("points") or []:
            yield _normalize_point(point, include_payload, include_vectors)
            if remaining is not None:
                remaining -= 1
                if remaining <= 0:
                    return
        offset = result.get("next_page_offset")
        pages += 1
        if offset is None or (cfg.get("max_pages") and pages >= cfg["max_pages"]):
            return


def _normalize_point(point: Any, include_payload: bool, include_vectors: bool) -> dict:
    if not isinstance(point, Mapping):
        return {"value": point}
    row: dict[str, Any] = {}
    for key, value in point.items():
        if key == "payload" and not include_payload:
            continue
        if key == "vector" and not include_vectors:
            continue
        row[str(key)] = value
    return row


_MATCHABLE = (str, int, bool)  # Qdrant `match` supports keyword/integer/bool — not float


def _qdrant_condition(f: Filter) -> "dict | None":
    """Translate one Catalyst filter into a Qdrant filter condition.

    Returns ``None`` for anything Qdrant can't express server-side
    (float equality, Not/StringContains, non-payload columns, ...).
    ``id`` is the point id — equality/membership map to ``has_id``;
    payload fields arrive as multi-part attributes (``("payload",
    "title")`` — the scroll row keeps ``payload`` as a nested struct) and
    map to Qdrant's dotted payload-key notation.  Range conditions are
    numeric-only: Qdrant's ``range`` clause compares numbers, while
    Spark's may compare strings or dates, so non-numeric operands stay
    Spark-side.
    """
    attr = getattr(f, "attribute", None)
    if not attr:
        return None
    is_id = len(attr) == 1 and attr[0] == "id"
    if is_id:
        col = "id"
    elif attr[0] == "payload" and len(attr) >= 2:
        col = ".".join(attr[1:])
    else:
        return None
    if isinstance(f, EqualTo):
        if is_id:
            return {"has_id": [f.value]} if isinstance(f.value, _MATCHABLE) else None
        if isinstance(f.value, _MATCHABLE):
            return {"key": col, "match": {"value": f.value}}
        return None
    if isinstance(f, In):
        values = list(f.value)
        if not values or not all(isinstance(v, _MATCHABLE) for v in values):
            return None
        if is_id:
            return {"has_id": values}
        return {"key": col, "match": {"any": values}}
    if is_id:
        return None
    if isinstance(f, (GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)):
        if isinstance(f.value, bool) or not isinstance(f.value, (int, float)):
            return None
        op = {
            GreaterThan: "gt",
            GreaterThanOrEqual: "gte",
            LessThan: "lt",
            LessThanOrEqual: "lte",
        }[type(f)]
        return {"key": col, "range": {op: f.value}}
    if isinstance(f, IsNull):
        # NOT pushable: Qdrant's ``is_null`` matches only points where the
        # payload key EXISTS with a null value, while Spark's IsNull is also
        # true for points missing the key entirely.  Server-side filtering is
        # subtractive — rows the server drops can never be restored by Spark's
        # post-scan re-evaluation — so pushing this would silently lose every
        # key-absent point.  Keep IsNull Spark-side.
        return None
    if isinstance(f, IsNotNull):
        # Safe SUPERSET: must_not(is_null) keeps key-absent points (is_null is
        # false for them), which Spark's re-evaluation then filters out.  A
        # superset can only cost post-filter CPU, never drop a matching row.
        return {"must_not": [{"is_null": {"key": col}}]}
    return None


class _QdrantPartition(InputPartition):
    def __init__(self, shard_json: "str | None"):
        self.shard_json = shard_json


class _QdrantReader(DataSourceReader):
    def __init__(self, cfg: dict, schema: StructType):
        self.cfg = cfg
        self.schema = schema

    def partitions(self) -> list[InputPartition]:
        shards = self.cfg.get("partition_filters")
        if shards:
            return [_QdrantPartition(json.dumps(s)) for s in shards]
        return [_QdrantPartition(None)]

    def read(self, partition: _QdrantPartition) -> Iterator:
        shard = json.loads(partition.shard_json) if partition.shard_json else None
        records = _scroll_points(self.cfg, shard)
        if self.cfg.get("arrow_batches", True):
            from .arrowbatch import arrow_batch_iterator

            yield from arrow_batch_iterator(
                records, self.schema, batch_size=int(self.cfg.get("page_size", 128))
            )
            return
        names = self.schema.fieldNames()
        for record in records:
            yield tuple(record.get(n) for n in names)


class _QdrantPushdownReader(_QdrantReader):
    """Reader variant with Catalyst → Qdrant predicate pushdown.

    A separate class because Spark 4.1 treats the mere presence of
    ``pushFilters`` as "this source requires
    ``spark.sql.python.filterPushdown.enabled``" and hard-errors when the
    conf is off — the opt-in ``predicate_pushdown=True`` config selects
    this class so default readers keep working on any session
    (``create_session`` enables the conf).
    """

    def pushFilters(self, filters: "list[Filter]"):
        """Catalyst predicate pushdown → Qdrant server-side ``filter`` JSON.

        The reference connector only supports a config-time static filter
        (``/root/reference/src/spark_fuse/io/qdrant/reader.py:219-325``);
        here WHERE clauses on payload fields / point ids reach the scroll
        request itself, so the server prunes points before they cross the
        wire.  Deliberately conservative: every filter — pushed or not —
        is returned to Spark for re-evaluation (the API's partial-pushdown
        contract), so a semantic mismatch between Qdrant match rules and
        Spark comparison rules can only cost a little post-filter CPU,
        never a wrong answer.
        """
        conditions = [c for c in map(_qdrant_condition, filters) if c is not None]
        if conditions:
            cfg = dict(self.cfg)
            cfg["filter"] = _merged_filter(cfg.get("filter"), {"must": conditions})
            self.cfg = cfg
        return filters


# ----------------------------------------------------------------- write


def _coerce_vector(value: Any) -> Any:
    """Strict numeric coercion: floats list, named-vector map, MLlib/numpy.

    Mirrors reference semantics (``writer.py:26-72``) — Decimal/str become
    float, unknown types raise.
    """
    if value is None:
        return None
    if hasattr(value, "toArray"):  # pyspark.ml.linalg.{Dense,Sparse}Vector
        value = value.toArray()
    if hasattr(value, "tolist"):  # numpy
        value = value.tolist()
    if isinstance(value, Mapping):
        return {str(k): _coerce_vector(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [float(v) for v in value]
    raise TypeError(f"cannot coerce vector value of type {type(value).__name__}")


def _row_to_point(row: Mapping[str, Any], cfg: Mapping[str, Any]) -> dict:
    id_col, vec_col = cfg["id_column"], cfg["vector_column"]
    payload_cols = cfg.get("payload_columns")
    if payload_cols is None:
        payload = {k: v for k, v in row.items() if k not in (id_col, vec_col)}
    else:
        payload = {k: row[k] for k in payload_cols if k in row}
    point = {"id": row.get(id_col), "vector": _coerce_vector(row.get(vec_col))}
    if payload:
        point["payload"] = payload
    return point


class _QdrantCommit(WriterCommitMessage):
    pass


class _QdrantWriter(DataSourceWriter):
    """Per-partition batched upserts; global commit/abort are no-ops
    (reference ``writer.py:505-509`` — Qdrant upserts are idempotent by
    point id, so task retries converge)."""

    def __init__(self, cfg: dict):
        self.cfg = cfg

    def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
        cfg = self.cfg
        client = _client(cfg)
        url = f"{cfg['endpoint']}/collections/{cfg['collection']}/points"
        if cfg.get("wait", True):
            url += "?wait=true"
        batch: list[dict] = []
        ensured = not cfg.get("create_collection", False)
        for row in iterator:
            point = _row_to_point(row.asDict(recursive=True), cfg)
            batch.append(point)
            if not ensured:
                self._ensure_collection(client, point)
                ensured = True
            if len(batch) >= cfg["batch_size"]:
                self._flush(client, url, batch)
                batch = []
        if batch:
            self._flush(client, url, batch)
        return _QdrantCommit()

    def _ensure_collection(self, client: HttpClient, sample: Mapping[str, Any]) -> None:
        cfg = self.cfg
        url = f"{cfg['endpoint']}/collections/{cfg['collection']}"
        status, body = client.request_json_status(url, method="GET")
        if status is not None and 200 <= status < 300:
            return
        if status != 404:
            # timeouts / persistent 5xx are NOT "collection missing" —
            # creating here would mask the outage and race other tasks
            raise RuntimeError(
                f"could not determine existence of Qdrant collection "
                f"{cfg['collection']!r} (status {status}): {body!r}"
            )
        vector = sample.get("vector")
        if isinstance(vector, Mapping):  # named vectors
            vectors = {
                name: {"size": len(v), "distance": cfg["distance"]}
                for name, v in vector.items()
            }
        else:
            vectors = {"size": len(vector or []), "distance": cfg["distance"]}
        status, body = client.request_json_status(url, method="PUT", json_body={"vectors": vectors})
        if status is not None and 200 <= status < 300:
            return
        # concurrent write partitions race to create: already-exists /
        # conflict responses mean another task won — that's success
        if status == 409 or (status == 400 and "exist" in str(body).lower()):
            return
        raise RuntimeError(
            f"failed to create Qdrant collection {cfg['collection']!r} "
            f"(status {status}): {body!r}"
        )

    @staticmethod
    def _payload_for(fmt: str, batch: "list[dict]") -> dict:
        if fmt == "points":
            return {"points": batch}
        cols = {
            "ids": [p.get("id") for p in batch],
            "vectors": [p.get("vector") for p in batch],
        }
        if any("payload" in p for p in batch):
            cols["payloads"] = [p.get("payload") for p in batch]
        if fmt == "batch":  # PointsBatch envelope
            return {"batch": cols}
        return cols  # flat_batch: legacy columnar shape, no envelope

    def _attempt_matrix(self) -> "list[tuple[str, str]]":
        """(method, format) attempts in reference order (writer.py:388-467):
        ``auto`` walks PUT before POST and points -> batch -> flat_batch
        within each method — 6 legs.  Pinned ``payload_format='batch'``
        keeps the reference's batch -> flat_batch -> points fallback
        (writer.py:398-407) so migrating users hitting flat-batch-only
        servers degrade the same way; other pins try exactly one format."""
        cfg = self.cfg
        fmt = cfg.get("payload_format", "auto")
        meth = cfg.get("write_method", "auto")
        if fmt == "auto":
            formats = ["points", "batch", "flat_batch"]
        elif fmt == "batch":
            formats = ["batch", "flat_batch", "points"]
        else:
            formats = [fmt]
        methods = ["PUT", "POST"] if meth == "auto" else [meth.upper()]
        return [(m, f) for m in methods for f in formats]

    def _flush(self, client: HttpClient, url: str, batch: list[dict]) -> None:
        # Negotiate the server's accepted (method, payload-format) leg —
        # the full points/batch/flat_batch x PUT/POST matrix the reference
        # speaks (writer.py:388-467), not just 2 of 6.  Negotiation only
        # advances on 400/404/405 (what a server answers an unknown shape
        # or verb with); 5xx / retry exhaustion raises immediately so an
        # outage is never misread as a format problem, and the final error
        # carries the FIRST leg's status + body so e.g. a wrong vector
        # dimension isn't reported as a legacy-format failure.  The winning
        # leg is remembered per writer (one negotiation per task, then
        # every subsequent flush goes straight to it — cheaper than the
        # reference's per-batch renegotiation at 100 TB batch counts).
        # A 4xx on the cached leg does NOT mean the task failed: a
        # mid-job server change (upgrade/downgrade behind a load
        # balancer) can retire the leg that won negotiation while the
        # server still speaks another — renegotiate the full matrix once
        # before raising.
        won = getattr(self, "_won_leg", None)
        first_fail: "tuple[str, str, object, object] | None" = None
        if won is not None:
            method, fmt = won
            status, body = client.request_json_status(
                url, method=method, json_body=self._payload_for(fmt, batch)
            )
            if status is not None and 200 <= status < 300:
                return
            if status not in (400, 404, 405):
                raise RuntimeError(
                    f"Qdrant upsert failed for {len(batch)} points via "
                    f"{method} {fmt} (status {status}): {body!r}"
                )
            self._won_leg = None
            first_fail = (method, fmt, status, body)
        attempts = self._attempt_matrix()
        for method, fmt in attempts:
            status, body = client.request_json_status(
                url, method=method, json_body=self._payload_for(fmt, batch)
            )
            if status is not None and 200 <= status < 300:
                self._won_leg = (method, fmt)
                return
            if first_fail is None:
                first_fail = (method, fmt, status, body)
            if status not in (400, 404, 405):
                raise RuntimeError(
                    f"Qdrant upsert failed for {len(batch)} points via "
                    f"{method} {fmt} (status {status}): {body!r}"
                )
        m0, f0, s0, b0 = first_fail  # type: ignore[misc]
        raise RuntimeError(
            f"Qdrant upsert failed for {len(batch)} points: no accepted "
            f"(method, payload-format) combination among {attempts}; first "
            f"attempt {m0} {f0} (status {s0}): {b0!r}"
        )

    def commit(self, messages) -> None:
        return None

    def abort(self, messages) -> None:
        return None


class _QdrantStreamWriter(DataSourceStreamWriter):
    """Micro-batch vector sink: ``df.writeStream.format("fuse-qdrant")``.

    Delegates each partition's rows to the batch writer's upsert loop —
    Qdrant upserts are idempotent by point id, so a replayed microbatch
    (failure between write and checkpoint commit) converges to the same
    state: at-least-once delivery, exactly-once effect.  This is the
    streaming completion of the reference's batch-only vector sink
    (``/root/reference/src/spark_fuse/io/qdrant/writer.py:497-509``) and
    the natural tail of an embedding pipeline: readStream → embed
    (pandas UDF) → upsert vectors."""

    def __init__(self, cfg: dict):
        self._delegate = _QdrantWriter(cfg)

    def write(self, iterator: Iterator[Row]) -> WriterCommitMessage:
        return self._delegate.write(iterator)

    def commit(self, messages, batchId: int) -> None:
        return None

    def abort(self, messages, batchId: int) -> None:
        return None


# ----------------------------------------------------------------- source


class QdrantDataSource(DataSource):
    """``spark.read/write.format("fuse-qdrant")`` with one JSON config option."""

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
        cap = int(self.cfg.get("infer_sample_records", 100))
        merged = None
        for i, record in enumerate(_scroll_points(self.cfg, None, record_cap=cap)):
            inferred = _infer_schema(record, infer_dict_as_struct=True)
            merged = inferred if merged is None else _merge_type(merged, inferred)
            if i + 1 >= cap:
                break
        if merged is None:
            raise ValueError("no points sampled for schema; supply an explicit schema")
        return merged

    def reader(self, schema: StructType) -> DataSourceReader:
        if self.cfg.get("predicate_pushdown"):
            return _QdrantPushdownReader(self.cfg, schema)
        return _QdrantReader(self.cfg, schema)

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _QdrantWriter(self.cfg)

    def streamWriter(self, schema: StructType, overwrite: bool) -> DataSourceStreamWriter:
        return _QdrantStreamWriter(self.cfg)
