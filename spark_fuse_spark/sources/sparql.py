"""SPARQL endpoint data source (PySpark Python Data Source API).

Capability parity with the reference SPARQL connector
(``/root/reference/src/spark_fuse/io/sparql.py:382-414`` DataSource,
``:58-98`` XSD coercion, ``:101-153`` SELECT/ASK parsing, ``:165-185``
auth/payload modes): SELECT bindings → rows with XSD-typed coercion
(integer family → long, decimal/double/float → double, boolean → bool,
URIs/plain literals → string), ASK → single-row ``boolean`` column,
optional per-variable metadata columns ``var__type`` / ``var__datatype``
/ ``var__xml:lang``, basic auth, form/json/raw payload modes, GET/POST.

Scale fix vs reference: schema inference runs only the FIRST query with
an injected ``LIMIT`` sample (the reference executes every query fully
on the driver and throws the rows away, ``sparql.py:398-406``).
Partitioning: one partition per query in ``queries`` — shard a large
extraction by writing range-sliced queries.

Like fuse-rest and fuse-qdrant, the reader emits ``pyarrow.RecordBatch``
objects by default (columnar Python↔JVM transfer, one batch per result
chunk) with the whole-stream tuple fallback from
:mod:`spark_fuse_spark.sources.arrowbatch`; ``arrow_batches=False`` pins
the row path.
"""

from __future__ import annotations

import base64
import json
import urllib.parse
from typing import Any, Iterator, Mapping

from pyspark.sql import SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .http import HttpClient, validate_http_url

__all__ = ["SparqlDataSource", "register", "build_sparql_config", "FORMAT_NAME", "CONFIG_OPTION"]

FORMAT_NAME = "fuse-sparql"
CONFIG_OPTION = "fuse.sparql.config"
SCHEMA_OPTION = "fuse.sparql.schema"
_REGISTERED: set[str] = set()

METADATA_KEYS = ("type", "datatype", "xml:lang")
_INT_TYPES = {
    "integer", "int", "long", "short", "byte", "nonpositiveinteger",
    "negativeinteger", "nonnegativeinteger", "positiveinteger",
    "unsignedbyte", "unsignedshort", "unsignedint", "unsignedlong",
}
_FLOAT_TYPES = {"decimal", "double", "float"}


def register(spark: SparkSession) -> None:
    app_id = spark.sparkContext.applicationId
    if app_id not in _REGISTERED:
        spark.dataSource.register(SparqlDataSource)
        _REGISTERED.add(app_id)


def build_sparql_config(
    endpoint: str,
    query: "str | list[str]",
    *,
    method: str = "POST",
    payload_mode: str = "form",
    username: "str | None" = None,
    password: "str | None" = None,
    include_metadata: bool = False,
    metadata_suffix: str = "__",
    coerce_types: bool = True,
    headers: "Mapping[str, str] | None" = None,
    timeout: float = 30.0,
    max_retries: int = 3,
    backoff_factor: float = 0.5,
    infer_sample_limit: int = 100,
    arrow_batches: bool = True,
) -> str:
    validate_http_url(endpoint)
    if payload_mode not in ("form", "json", "raw"):
        raise ValueError("payload_mode must be form|json|raw")
    if method.upper() not in ("GET", "POST"):
        raise ValueError("method must be GET or POST")
    queries = [query] if isinstance(query, str) else list(query)
    if not queries:
        raise ValueError("at least one query required")
    return json.dumps(
        {
            "endpoint": endpoint,
            "queries": queries,
            "method": method.upper(),
            "payload_mode": payload_mode,
            "username": username,
            "password": password,
            "include_metadata": include_metadata,
            "metadata_suffix": metadata_suffix,
            "coerce_types": coerce_types,
            "headers": dict(headers or {}),
            "timeout": timeout,
            "max_retries": max_retries,
            "backoff_factor": backoff_factor,
            "infer_sample_limit": infer_sample_limit,
            "arrow_batches": arrow_batches,
        }
    )


# -------------------------------------------------------------- result parse
def coerce_literal(value: str, datatype: "str | None") -> Any:
    """XSD-datatype-driven coercion (None when not coercible)."""
    if not datatype:
        return None
    dt = datatype.lower().rsplit("#", 1)[-1]
    if dt == "boolean":
        low = value.strip().lower()
        return True if low in ("true", "1") else False if low in ("false", "0") else None
    if dt in _INT_TYPES:
        try:
            return int(value)
        except (TypeError, ValueError):
            return None
    if dt in _FLOAT_TYPES:
        try:
            return float(value)
        except (TypeError, ValueError):
            return None
    return None


def parse_results(payload: Mapping[str, Any], include_metadata: bool,
                  metadata_suffix: str, coerce_types: bool) -> tuple[list[dict], list[str]]:
    """SELECT → (rows, ordered columns); ASK → single boolean row."""
    if "results" in payload:
        columns: list[str] = [
            c for c in payload.get("head", {}).get("vars", []) if isinstance(c, str)
        ]
        rows = []
        for binding in payload.get("results", {}).get("bindings", []) or []:
            if not isinstance(binding, Mapping):
                continue
            row: dict[str, Any] = {c: None for c in columns}
            for var, entry in binding.items():
                var = str(var)
                if var not in columns:
                    columns.append(var)
                if isinstance(entry, Mapping):
                    value = entry.get("value")
                    if coerce_types and value is not None:
                        coerced = coerce_literal(str(value), entry.get("datatype"))
                        row[var] = coerced if coerced is not None else value
                    else:
                        row[var] = value
                    if include_metadata:
                        for mk in METADATA_KEYS:
                            col = f"{var}{metadata_suffix}{mk}"
                            row[col] = entry.get(mk)
                            if col not in columns:
                                columns.append(col)
                else:
                    row[var] = entry
            rows.append(row)
        return rows, columns
    if "boolean" in payload:
        val = payload["boolean"]
        if isinstance(val, str):
            val = val.strip().lower() in ("true", "1")
        return [{"boolean": bool(val)}], ["boolean"]
    raise ValueError("SPARQL response must contain 'results' or 'boolean'")


def _execute(client: HttpClient, cfg: Mapping[str, Any], query: str) -> Any:
    headers = dict(cfg.get("headers") or {})
    headers.setdefault("Accept", "application/sparql-results+json")
    if cfg.get("username") is not None:
        token = base64.b64encode(
            f"{cfg['username']}:{cfg.get('password') or ''}".encode()
        ).decode()
        headers["Authorization"] = f"Basic {token}"
    method, mode = cfg.get("method", "POST"), cfg.get("payload_mode", "form")
    endpoint = cfg["endpoint"]
    if method == "GET":
        sep = "&" if "?" in endpoint else "?"
        url = f"{endpoint}{sep}query={urllib.parse.quote(query)}"
        return client.request_json(url, "GET", headers=headers)
    if mode == "json":
        return client.request_json(endpoint, "POST", headers=headers,
                                   json_body={"query": query})
    if mode == "raw":
        return client.request_json(endpoint, "POST", headers=headers,
                                   data=query.encode(),
                                   content_type="application/sparql-query")
    return client.request_json(
        endpoint, "POST", headers=headers,
        data=urllib.parse.urlencode({"query": query}).encode(),
        content_type="application/x-www-form-urlencoded",
    )


def _client(cfg: Mapping[str, Any]) -> HttpClient:
    return HttpClient(
        timeout=cfg.get("timeout", 30.0),
        max_retries=cfg.get("max_retries", 3),
        backoff_factor=cfg.get("backoff_factor", 0.5),
    )


def _schema_from_rows(rows: list[dict], columns: list[str],
                      metadata_suffix: str) -> StructType:
    """Value-type-driven schema: long/double/bool where observed, string
    default; metadata columns forced to string (reference
    ``sparql.py:243-270``)."""
    fields = []
    for col in columns:
        observed = {type(r.get(col)) for r in rows if r.get(col) is not None}
        if metadata_suffix and any(
            col.endswith(f"{metadata_suffix}{mk}") for mk in METADATA_KEYS
        ):
            dtype = StringType()
        elif observed == {bool}:
            dtype = BooleanType()
        elif observed == {int}:
            dtype = LongType()
        elif observed <= {int, float} and float in observed:
            dtype = DoubleType()
        else:
            dtype = StringType()
        fields.append(StructField(col, dtype))
    return StructType(fields)


class _SparqlPartition(InputPartition):
    def __init__(self, query: str):
        self.query = query


class _SparqlReader(DataSourceReader):
    def __init__(self, cfg: dict, schema: StructType):
        self.cfg, self.schema = cfg, schema

    def partitions(self) -> list[InputPartition]:
        return [_SparqlPartition(q) for q in self.cfg["queries"]]

    def read(self, partition: _SparqlPartition) -> Iterator:
        client = _client(self.cfg)
        payload = _execute(client, self.cfg, partition.query)
        if payload is None:
            return
        rows, _ = parse_results(
            payload,
            self.cfg.get("include_metadata", False),
            self.cfg.get("metadata_suffix", "__"),
            self.cfg.get("coerce_types", True),
        )
        names = self.schema.fieldNames()
        types = {f.name: f.dataType for f in self.schema.fields}

        def records() -> Iterator[dict]:
            # string-typed fields stringify non-null values BEFORE the
            # representation split, so arrow and tuple paths see the same
            # normalized records (URIs stay str; stray ints under a
            # StringType schema don't poison an Arrow column)
            for row in rows:
                rec = {}
                for n in names:
                    v = row.get(n)
                    if v is not None and isinstance(types[n], StringType):
                        v = str(v)
                    rec[n] = v
                yield rec

        if self.cfg.get("arrow_batches", True):
            from .arrowbatch import arrow_batch_iterator

            yield from arrow_batch_iterator(records(), self.schema)
            return
        for rec in records():
            yield tuple(rec[n] for n in names)


class SparqlDataSource(DataSource):
    """``spark.read.format("fuse-sparql")`` — SPARQL SELECT/ASK."""

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
        client = _client(self.cfg)
        query = self.cfg["queries"][0]
        limit = int(self.cfg.get("infer_sample_limit", 100))
        sample_q = query
        # ASK returns one boolean — a LIMIT clause is invalid SPARQL there
        is_ask = query.lstrip().lower().startswith("ask")
        if not is_ask and "limit" not in query.lower():
            sample_q = f"{query.rstrip()} LIMIT {limit}"
        payload = _execute(client, self.cfg, sample_q)
        if payload is None:
            raise ValueError("SPARQL schema inference failed; supply an explicit schema")
        rows, columns = parse_results(
            payload,
            self.cfg.get("include_metadata", False),
            self.cfg.get("metadata_suffix", "__"),
            self.cfg.get("coerce_types", True),
        )
        return _schema_from_rows(rows, columns, self.cfg.get("metadata_suffix", "__"))

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SparqlReader(self.cfg, schema)
