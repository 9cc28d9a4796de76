"""Layered settings tests (env > {env}.yaml > base.yaml > defaults)."""

from __future__ import annotations

from spark_fuse_spark.settings import deep_merge, load_settings


def test_deep_merge_nested():
    base = {"a": 1, "nested": {"x": 1, "y": 2}}
    overlay = {"nested": {"y": 3, "z": 4}, "b": 5}
    assert deep_merge(base, overlay) == {
        "a": 1,
        "b": 5,
        "nested": {"x": 1, "y": 3, "z": 4},
    }


def test_yaml_layering(tmp_path):
    (tmp_path / "base.yaml").write_text("app:\n  name: engine\n  retries: 1\n")
    (tmp_path / "prod.yaml").write_text("app:\n  retries: 5\n")
    settings = load_settings(str(tmp_path), env="prod")
    assert settings.get_path("app.name") == "engine"
    assert settings.get_path("app.retries") == 5
    assert settings["env"] == "prod"


def test_env_overrides_yaml(tmp_path, monkeypatch):
    (tmp_path / "base.yaml").write_text("app:\n  retries: 1\n  debug: false\n")
    monkeypatch.setenv("SPARK_FUSE_APP__RETRIES", "9")
    monkeypatch.setenv("SPARK_FUSE_APP__DEBUG", "true")
    settings = load_settings(str(tmp_path), env="local")
    assert settings.get_path("app.retries") == 9
    assert settings.get_path("app.debug") is True


def test_defaults_lowest_precedence(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 2\n")
    settings = load_settings(str(tmp_path), env="local", defaults={"a": 1, "b": 1})
    assert settings["a"] == 2 and settings["b"] == 1


def test_missing_files_ok(tmp_path):
    settings = load_settings(str(tmp_path), env="nope", defaults={"k": "v"})
    assert settings["k"] == "v"
