"""Column toolkit unit tests (mirrors reference tests/utils/
test_transformations.py style: tiny createDataFrame inputs, collect,
assert dicts — see SURVEY.md §5.2)."""

from __future__ import annotations

import pytest

from spark_fuse_spark.operators.columns import (
    cast_columns,
    ensure_columns,
    preview,
    rename_columns,
    with_constants,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")


def test_rename_preserves_order(df):
    out = rename_columns(df, {"id": "ident"})
    assert out.columns == ["ident", "name"]
    assert [r.ident for r in out.orderBy("ident").collect()] == [1, 2]


def test_rename_missing_source_raises(df):
    with pytest.raises(ValueError, match="missing source"):
        rename_columns(df, {"nope": "x"})


def test_rename_duplicate_target_raises(df):
    with pytest.raises(ValueError, match="duplicate output"):
        rename_columns(df, {"id": "name"})


def test_with_constants(df):
    out = with_constants(df, {"source": "unit", "version": 1})
    row = out.orderBy("id").first()
    assert row.source == "unit" and row.version == 1


def test_with_constants_collision(df):
    with pytest.raises(ValueError, match="already exist"):
        with_constants(df, {"id": 9})
    out = with_constants(df, {"id": 9}, overwrite=True)
    assert {r.id for r in out.collect()} == {9}
    assert out.columns == ["id", "name"]


def test_cast_columns_preserves_order(df):
    out = cast_columns(df, {"id": "bigint"})
    assert out.columns == ["id", "name"]
    assert dict(out.dtypes)["id"] == "bigint"


def test_cast_missing_raises(df):
    with pytest.raises(ValueError, match="missing columns"):
        cast_columns(df, {"zzz": "int"})


def test_ensure_columns(df):
    assert ensure_columns(df, ["id"]) is df
    with pytest.raises(ValueError, match="missing columns"):
        ensure_columns(df, ["id", "zzz"])


def test_preview(df):
    text = preview(df, 1)
    assert "struct<id:int,name:string>" in text
    assert "'id': 1" in text
