"""Differential-oracle gate: every oracle-bearing catalog query must
hash-match DuckDB on the same parquet.  Runs at sf0.001 by default (part
of every `pytest tests/` invocation); the same sweep at sf0.01 — the
driver's correctness SF — is one opt-in command:

    python -m pytest tests/test_oracle_parity.py -m sf01 -q
"""

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


@pytest.fixture(scope="module")
def duck_med(sf_med):
    return duckdb_connection(sf_med)


@pytest.mark.sf01
@pytest.mark.parametrize("name", _oracle_names())
def test_parity_sf01(spark, sf_med, duck_med, name):
    """The identical sweep at the driver's correctness SF (sf0.01)."""
    spec = load_all()[name]
    result = compare_frames(name, spec.spark(spark, sf_med), duck_med, spec.oracle)
    assert result.ok, f"{result.detail}\nmismatches: {result.mismatches}"


def test_all_queries_run(spark, sf_small):
    """Oracle-less queries must still execute and return a stable schema."""
    for name, spec in sorted(load_all().items()):
        if spec.oracle is not None:
            continue
        df = spec.spark(spark, sf_small)
        assert df.columns, name
        assert df.count() >= 0, name
