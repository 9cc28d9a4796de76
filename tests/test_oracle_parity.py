"""Differential-oracle gate: every oracle-bearing catalog query must
hash-match DuckDB on the same parquet (mirrors the driver's CORRECTNESS
check, at sf0.001 for speed — run tests/test_oracle_parity.py -k sf001
against sf0.01 before benching)."""

from __future__ import annotations

import pytest

from spark_fuse_spark.catalog import load_all
from spark_fuse_spark.testing import compare_frames, duckdb_connection


def _oracle_names():
    return sorted(n for n, s in load_all().items() if s.oracle is not None)


@pytest.fixture(scope="module")
def duck(sf_small):
    return duckdb_connection(sf_small)


@pytest.mark.parametrize("name", _oracle_names())
def test_parity(spark, sf_small, duck, name):
    spec = load_all()[name]
    result = compare_frames(name, spec.spark(spark, sf_small), duck, spec.oracle)
    assert result.ok, f"{result.detail}\nmismatches: {result.mismatches}"


def test_all_queries_run(spark, sf_small):
    """Oracle-less queries must still execute and return a stable schema."""
    for name, spec in sorted(load_all().items()):
        if spec.oracle is not None:
            continue
        df = spec.spark(spark, sf_small)
        assert df.columns, name
        assert df.count() >= 0, name
