"""OpenAI-compatible chat-completions provider for closed-set mapping.

Re-expresses the reference's LLM plumbing
(``/root/reference/src/spark_fuse/utils/llm.py:239-413`` —
``_get_llm_api_config`` + ``_fetch_llm_mapping``) against the PUBLIC
OpenAI / Azure-OpenAI chat-completions API shape, stdlib-only:

* **Config resolution** — ``OPENAI_API_KEY`` / ``AZURE_OPENAI_KEY`` /
  ``AZURE_OPENAI_API_KEY`` for the key; when ``AZURE_OPENAI_ENDPOINT``
  (or ``OPENAI_API_BASE``) is set the request targets the Azure
  deployment URL (``.../openai/deployments/<model>/chat/completions
  ?api-version=...``, key in an ``api-key`` header) — otherwise the
  standard endpoint with a ``Bearer`` header.  An explicit ``base_url``
  targets any OpenAI-compatible server (local inference, test mocks).
* **Request loop** — exponential back-off (capped) on 429, 5xx, and
  network errors; a 400 whose error message mentions ``temperature``
  drops the explicit temperature and retries (some models reject
  non-default values — reference ``llm.py:345-360``); any other non-200
  abstains with ``None``.
* **Answer handling** — ``choices[0].message.content``, stripped of
  quotes; empty or ``"None"`` → unmapped; answers are matched
  case-insensitively against the target list and anything else is
  treated as unmapped (the model cannot invent categories).

The mapper satisfies the ``map_values(values, targets)`` provider
contract of :func:`spark_fuse_spark.ai.mapping.map_column_with_llm`, so
``provider_factory=openai_chat_factory(model=...)`` swaps the offline
:class:`~spark_fuse_spark.ai.mapping.ClosedSetMatcher` stub for a real
model without touching the plan (the distinct-first / broadcast-back
shape is provider-independent).
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from typing import Any, Callable, Sequence

__all__ = ["resolve_chat_api", "OpenAIChatMapper", "openai_chat_factory"]

_DEFAULT_API_URL = "https://api.openai.com/v1/chat/completions"
_DEFAULT_AZURE_API_VERSION = "2023-05-15"
_SYSTEM_PROMPT = "You are a data normalization assistant."


def resolve_chat_api(
    model: str,
    api_key: "str | None" = None,
    base_url: "str | None" = None,
) -> tuple[str, dict[str, str], bool]:
    """Resolve ``(api_url, headers, use_azure)`` for a chat-completions call.

    Mirrors reference ``_get_llm_api_config`` (``utils/llm.py:239-284``):
    Azure is selected by the presence of an Azure endpoint env var; the
    model name doubles as the Azure deployment name.  ``base_url``
    (or ``OPENAI_BASE_URL``) short-circuits to a plain OpenAI-compatible
    endpoint — useful for local/compatible servers and tests.
    """
    key = (
        api_key
        or os.getenv("OPENAI_API_KEY")
        or os.getenv("AZURE_OPENAI_KEY")
        or os.getenv("AZURE_OPENAI_API_KEY")
    )
    if not key:
        raise RuntimeError(
            "no API key: pass api_key= or set OPENAI_API_KEY / AZURE_OPENAI_KEY"
        )

    explicit_base = base_url or os.getenv("OPENAI_BASE_URL")
    if explicit_base:
        url = explicit_base.rstrip("/")
        if not url.endswith("/chat/completions"):
            url = f"{url}/chat/completions"
        return url, {"Content-Type": "application/json", "Authorization": f"Bearer {key}"}, False

    azure_endpoint = os.getenv("AZURE_OPENAI_ENDPOINT") or os.getenv("OPENAI_API_BASE")
    if azure_endpoint:
        api_version = os.getenv("AZURE_OPENAI_API_VERSION", _DEFAULT_AZURE_API_VERSION)
        url = (
            f"{azure_endpoint.rstrip('/')}/openai/deployments/{model}/chat/completions"
            f"?api-version={api_version}"
        )
        return url, {"Content-Type": "application/json", "api-key": key}, True

    return (
        _DEFAULT_API_URL,
        {"Content-Type": "application/json", "Authorization": f"Bearer {key}"},
        False,
    )


class OpenAIChatMapper:
    """Chat-completions-backed closed-set mapper (provider contract).

    One value per request, matching the reference's per-value prompt
    (``llm.py:330-339``); ``map_column_with_llm`` already guarantees the
    value stream is DISTINCT, so request count equals distinct
    cardinality, not row count.
    """

    def __init__(
        self,
        model: str = "gpt-4o-mini",
        *,
        api_key: "str | None" = None,
        base_url: "str | None" = None,
        temperature: "float | None" = 0.0,
        max_retries: int = 3,
        timeout: float = 30.0,
        backoff_cap: float = 60.0,
        sleeper: Callable[[float], None] = time.sleep,
    ) -> None:
        self.model = model
        self.temperature = temperature
        self.max_retries = max_retries
        self.timeout = timeout
        self.backoff_cap = backoff_cap
        self._sleep = sleeper
        self.api_url, self.headers, self.use_azure = resolve_chat_api(
            model, api_key=api_key, base_url=base_url
        )

    # ------------------------------------------------------------ transport
    def _post(self, payload: dict[str, Any]) -> tuple[int, Any]:
        """One POST → (status, parsed-JSON-or-text)."""
        req = urllib.request.Request(
            self.api_url,
            data=json.dumps(payload).encode("utf-8"),
            method="POST",
            headers=dict(self.headers),
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                raw = resp.read()
                status = resp.status
        except urllib.error.HTTPError as exc:
            raw = exc.read()
            status = exc.code
        try:
            return status, json.loads(raw)
        except ValueError:
            return status, raw.decode("utf-8", errors="replace")

    def _backoff(self, attempt: int) -> None:
        self._sleep(min(2**attempt, self.backoff_cap))

    # -------------------------------------------------------------- mapping
    def map_value(self, value: str, targets: Sequence[str]) -> "str | None":
        targets_str = ", ".join(f"'{t}'" for t in targets)
        prompt = (
            f'Map the value "{value}" to one of the following categories: {targets_str}. '
            "If none apply, respond with 'None'."
        )
        temperature = self.temperature
        for attempt in range(1, self.max_retries + 1):
            payload: dict[str, Any] = {
                "messages": [
                    {"role": "system", "content": _SYSTEM_PROMPT},
                    {"role": "user", "content": prompt},
                ],
            }
            if temperature is not None:
                payload["temperature"] = temperature
            if not self.use_azure:
                payload["model"] = self.model

            try:
                status, body = self._post(payload)
            except (urllib.error.URLError, OSError, TimeoutError):
                self._backoff(attempt)
                continue

            if status == 429 or 500 <= status < 600:
                self._backoff(attempt)
                continue
            if status == 400 and temperature is not None:
                message = ""
                if isinstance(body, dict):
                    message = str(body.get("error", {}).get("message", ""))
                elif isinstance(body, str):
                    message = body
                if "temperature" in message.lower():
                    # model rejects explicit temperature → provider default
                    temperature = None
                    self._backoff(attempt)
                    continue
            if status != 200:
                return None

            content = ""
            if isinstance(body, dict):
                choices = body.get("choices") or [{}]
                content = str((choices[0].get("message") or {}).get("content") or "")
            answer = content.strip().strip('"')
            if not answer or answer.lower() == "none":
                return None
            for target in targets:
                if answer.lower() == target.lower():
                    return target
            return None  # model invented a category → unmapped
        return None  # retries exhausted

    def map_values(self, values: Sequence[str], targets: Sequence[str]) -> list["str | None"]:
        """Provider contract for ``map_column_with_llm``."""
        return [self.map_value(v, targets) for v in values]


def openai_chat_factory(model: str = "gpt-4o-mini", **kwargs: Any) -> Callable[[], OpenAIChatMapper]:
    """Zero-arg, picklable factory for ``map_column_with_llm``'s
    ``provider_factory`` hook (instantiated once per executor via the
    module-level provider cache)."""
    import functools

    return functools.partial(OpenAIChatMapper, model, **kwargs)
