"""Date parsing / dimension generators / text functions unit tests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from spark_fuse_spark.functions.dates import (
    UnmatchedDateError,
    calendar_dimension,
    split_by_date_formats,
    time_dimension,
)
from spark_fuse_spark.functions.text import (
    language_id,
    normalize_whitespace,
    subword_token_count,
    token_count,
    word_shingles,
    BPE_SPLIT_PATTERN,
)

FORMATS = ["yyyy-MM-dd", "MM/dd/yyyy", "dd.MM.yyyy"]


@pytest.fixture()
def raw(spark):
    return spark.createDataFrame(
        [(1, "2024-01-31"), (2, "01/31/2024"), (3, "31.01.2024"), (4, "not a date"), (5, None)],
        "id int, raw string",
    )


def test_split_by_date_formats_null_mode(raw):
    out = {r.id: r for r in split_by_date_formats(raw, "raw", FORMATS).collect()}
    expected = dt.date(2024, 1, 31)
    assert out[1].parsed_date == expected and out[1].format_index == 0
    assert out[2].parsed_date == expected and out[2].format_index == 1
    assert out[3].parsed_date == expected and out[3].format_index == 2
    assert out[4].parsed_date is None and out[4].format_index is None
    assert out[5].parsed_date is None


def test_split_by_date_formats_strict(raw):
    with pytest.raises(UnmatchedDateError):
        split_by_date_formats(raw, "raw", FORMATS, mode="strict")
    ok = raw.filter(F.col("id") <= 3)
    assert split_by_date_formats(ok, "raw", FORMATS, mode="strict").count() == 3


def test_split_by_date_formats_default(raw):
    out = {
        r.id: r.parsed_date
        for r in split_by_date_formats(
            raw, "raw", FORMATS, mode="default", default="1900-01-01"
        ).collect()
    }
    assert out[4] == dt.date(1900, 1, 1)
    assert out[5] is None  # null input stays null (only unparseable filled)


def test_calendar_dimension(spark):
    cal = calendar_dimension(spark, "2024-02-27", "2024-03-02").collect()
    assert len(cal) == 5
    leap = [r for r in cal if r.date == dt.date(2024, 2, 29)][0]
    assert leap.month_name == "February" and leap.day_name == "Thursday"
    with pytest.raises(ValueError, match="before start"):
        calendar_dimension(spark, "2024-01-02", "2024-01-01")


def test_time_dimension(spark):
    td = time_dimension(spark, 3600)
    rows = td.orderBy("second_of_day").collect()
    assert len(rows) == 24
    assert rows[13].hhmmss == "13:00:00"
    with pytest.raises(ValueError):
        time_dimension(spark, 7)


def test_text_functions(spark):
    df = spark.createDataFrame(
        [(1, "  the   quick  brown fox  "), (2, "der hund und die katze ist")],
        "id int, text string",
    )
    out = {r.id: r for r in df.select(
        "id",
        normalize_whitespace("text").alias("norm"),
        token_count("text").alias("n"),
        language_id("text").alias("lang"),
        word_shingles("text", 3).alias("sh"),
    ).collect()}
    assert out[1].norm == "the quick brown fox"
    assert out[1].n == 4
    assert out[1].lang == "en"
    assert out[2].lang == "de"
    assert sorted(out[1].sh) == ["quick brown fox", "the quick brown"]


def test_subword_token_count_matches_python_re(spark):
    """Spark's Java-regex count must agree with Python re on the shared
    pattern subset (no lookahead), across contractions, digits, unicode
    whitespace, and punctuation runs."""
    import re

    samples = [
        "I'll we've don't it's 2026-08-13",
        "hello,,, world!!!  multiple   spaces",
        "key agg row scan slow fast table",
        "a1b2c3 100% $4.50 (nested [brackets])",
        "",
        "   ",
        "tabs\tand\nnewlines\r\nmixed",
    ]
    expected = [len(re.findall(BPE_SPLIT_PATTERN, s)) for s in samples]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(samples)], "id int, text string"
    )
    got = {
        r.id: r.n
        for r in df.select("id", subword_token_count("text").alias("n")).collect()
    }
    assert [got[i] for i in range(len(samples))] == expected
