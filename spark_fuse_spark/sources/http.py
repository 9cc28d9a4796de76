"""Shared HTTP core for the Python Data Source connectors.

Re-expresses the reference's retry/session semantics
(``/root/reference/src/spark_fuse/io/_http.py`` and
``io/rest_api.py:117-148``: N retries, exponential ``backoff * 2**i``,
JSON decode, non-2xx tolerated until retries exhaust) on the standard
library only (urllib) — no third-party dependency inside Spark's Python
data-source workers.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Any, Mapping

__all__ = ["HttpClient", "merge_query_params", "get_nested", "validate_http_url"]


def validate_http_url(url: str) -> str:
    parsed = urllib.parse.urlparse(url)
    if parsed.scheme not in ("http", "https") or not parsed.netloc:
        raise ValueError(f"invalid HTTP(S) URL: {url!r}")
    return url


def merge_query_params(url: str, params: "Mapping[str, Any] | None") -> str:
    """Merge extra query params into a URL (existing params preserved,
    duplicates overridden by ``params``)."""
    if not params:
        return url
    parts = urllib.parse.urlsplit(url)
    existing = dict(urllib.parse.parse_qsl(parts.query, keep_blank_values=True))
    existing.update({str(k): str(v) for k, v in params.items()})
    query = urllib.parse.urlencode(existing)
    return urllib.parse.urlunsplit((parts.scheme, parts.netloc, parts.path, query, parts.fragment))


def get_nested(payload: Any, path: "list[str] | None") -> Any:
    """Walk a dotted path through nested mappings; None on any miss."""
    if not path:
        return None
    current = payload
    for part in path:
        if isinstance(current, Mapping):
            current = current.get(part)
        else:
            return None
    return current


@dataclass
class HttpClient:
    """Retrying JSON-over-HTTP client (stdlib urllib).

    One instance per partition/task; connection reuse is delegated to
    the OS (urllib opens per request — acceptable because connector
    latency is dominated by the remote service; swap in a pooled opener
    if profiling disagrees).
    """

    timeout: float = 30.0
    max_retries: int = 3
    backoff_factor: float = 0.5
    headers: Mapping[str, str] = field(default_factory=dict)

    def request_json(
        self,
        url: str,
        method: str = "GET",
        headers: "Mapping[str, str] | None" = None,
        json_body: Any = None,
        data: "bytes | None" = None,
        content_type: "str | None" = None,
    ) -> Any:
        """Return parsed JSON, or None after exhausting retries."""
        body = data
        all_headers = {**self.headers, **(headers or {})}
        if json_body is not None:
            body = json.dumps(json_body).encode("utf-8")
            all_headers.setdefault("Content-Type", "application/json")
        if content_type:
            all_headers["Content-Type"] = content_type

        attempts = max(self.max_retries, 0) + 1
        for attempt in range(attempts):
            req = urllib.request.Request(
                url, data=body, method=method.upper(), headers=dict(all_headers)
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    if 200 <= resp.status < 300:
                        raw = resp.read()
                        try:
                            return json.loads(raw)
                        except ValueError:
                            return None
            except urllib.error.HTTPError as exc:
                # non-2xx: retry (transient 5xx) — 4xx also retried to match
                # reference behavior, then give up quietly with None
                exc.read()
            except (urllib.error.URLError, OSError, TimeoutError):
                pass
            if attempt < attempts - 1:
                delay = self.backoff_factor * (2**attempt)
                if delay > 0:
                    time.sleep(delay)
        return None

    def request_json_status(
        self,
        url: str,
        method: str = "GET",
        headers: "Mapping[str, str] | None" = None,
        json_body: Any = None,
    ) -> "tuple[int | None, Any]":
        """Status-aware variant: returns ``(status, parsed-body-or-text)``.

        Retries network errors and 5xx with the same backoff as
        :meth:`request_json`; 4xx responses return IMMEDIATELY (the
        server decided — retrying cannot change a client error, and the
        caller needs the status to react: 404-means-missing,
        409-means-exists, 400-means-rejected).  ``status`` is ``None``
        when every attempt failed at the network layer.
        """
        body = None
        all_headers = {**self.headers, **(headers or {})}
        if json_body is not None:
            body = json.dumps(json_body).encode("utf-8")
            all_headers.setdefault("Content-Type", "application/json")

        last_status: "int | None" = None
        last_payload: Any = None
        attempts = max(self.max_retries, 0) + 1
        for attempt in range(attempts):
            req = urllib.request.Request(
                url, data=body, method=method.upper(), headers=dict(all_headers)
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    raw = resp.read()
                    status = resp.status
            except urllib.error.HTTPError as exc:
                raw = exc.read()
                status = exc.code
            except (urllib.error.URLError, OSError, TimeoutError):
                status, raw = None, b""
            if status is not None:
                try:
                    payload = json.loads(raw)
                except ValueError:
                    payload = raw.decode("utf-8", errors="replace")
                last_status, last_payload = status, payload
                if status < 500:
                    return status, payload
            if attempt < attempts - 1:
                delay = self.backoff_factor * (2**attempt)
                if delay > 0:
                    time.sleep(delay)
        return last_status, last_payload
