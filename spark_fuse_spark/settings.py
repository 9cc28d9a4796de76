"""Layered application settings (reference parity:
``/root/reference/src/app/config/settings.py:50-93,130-168`` —
pydantic-settings with env vars > .env > base.yaml + {env}.yaml
deep-merge).  Stdlib + pyyaml re-expression: same precedence, explicit
loader instead of import-time magic.

Precedence (highest wins):
1. environment variables ``<PREFIX>_SECTION__KEY`` (``__`` nests);
2. ``{env}.yaml`` (environment overlay, e.g. ``prod.yaml``);
3. ``base.yaml``;
4. code defaults passed to :func:`load_settings`.
"""

from __future__ import annotations

import os
from typing import Any, Mapping

__all__ = ["deep_merge", "load_settings", "Settings"]


def deep_merge(base: Mapping[str, Any], overlay: Mapping[str, Any]) -> dict[str, Any]:
    """Recursive dict merge; overlay wins, nested dicts merge per-key."""
    merged: dict[str, Any] = dict(base)
    for key, value in overlay.items():
        if isinstance(value, Mapping) and isinstance(merged.get(key), Mapping):
            merged[key] = deep_merge(merged[key], value)
        else:
            merged[key] = value
    return merged


def _coerce(value: str) -> Any:
    lowered = value.lower()
    if lowered in ("true", "false"):
        return lowered == "true"
    for cast in (int, float):
        try:
            return cast(value)
        except ValueError:
            continue
    return value


def _env_overlay(prefix: str) -> dict[str, Any]:
    overlay: dict[str, Any] = {}
    token = f"{prefix}_"
    for key, value in os.environ.items():
        if not key.startswith(token):
            continue
        path = key[len(token):].lower().split("__")
        node = overlay
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = _coerce(value)
    return overlay


def _load_yaml(path: str) -> dict[str, Any]:
    if not os.path.isfile(path):
        return {}
    import yaml

    with open(path, encoding="utf-8") as fh:
        data = yaml.safe_load(fh)
    if data is None:
        return {}
    if not isinstance(data, Mapping):
        raise ValueError(f"settings file {path} must contain a mapping")
    return dict(data)


class Settings(dict):
    """Nested settings with attribute + dotted access."""

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for part in dotted.split("."):
            if not isinstance(node, Mapping) or part not in node:
                return default
            node = node[part]
        return node


def load_settings(
    config_dir: "str | None" = None,
    env: "str | None" = None,
    prefix: str = "SPARK_FUSE",
    defaults: "Mapping[str, Any] | None" = None,
) -> Settings:
    """Resolve layered settings.

    ``env`` defaults to ``$<PREFIX>_ENV`` (or ``"local"``); the overlay
    file ``{env}.yaml`` is merged over ``base.yaml`` inside ``config_dir``.
    """
    merged: dict[str, Any] = dict(defaults or {})
    env = env or os.environ.get(f"{prefix}_ENV", "local")
    if config_dir:
        merged = deep_merge(merged, _load_yaml(os.path.join(config_dir, "base.yaml")))
        merged = deep_merge(merged, _load_yaml(os.path.join(config_dir, f"{env}.yaml")))
    merged = deep_merge(merged, _env_overlay(prefix))
    merged["env"] = merged.get("env", env)
    return Settings(merged)
