"""fuse-parquet-meta: column-for-column parity with DuckDB's
parquet_metadata() over the identical footers, plus option handling."""

from __future__ import annotations

import pytest

from spark_fuse_spark.sources.parquet_meta import FORMAT_NAME, register


@pytest.fixture(scope="module")
def meta(spark, sf_small):
    register(spark)
    return (
        spark.read.format(FORMAT_NAME)
        .option("path", f"{sf_small}/lineitem.parquet")
        .load()
    )


def test_matches_duckdb_parquet_metadata(spark, sf_small, meta):
    import duckdb

    path = f"{sf_small}/lineitem.parquet"
    want = {
        (r[0], r[1]): r
        for r in duckdb.sql(
            f"""SELECT row_group_id, path_in_schema, num_values,
                       stats_null_count, stats_min_value, stats_max_value,
                       total_compressed_size, total_uncompressed_size, compression
                FROM parquet_metadata('{path}')"""
        ).fetchall()
    }
    got = meta.collect()
    assert len(got) == len(want) > 0
    for r in got:
        w = want[(r.row_group_id, r.path_in_schema)]
        assert r.num_values == w[2]
        assert r.null_count == w[3]
        assert (r.min_value, r.max_value) == (w[4], w[5]), r.path_in_schema
        assert r.compressed_bytes == w[6]
        assert r.uncompressed_bytes == w[7]
        assert r.codec == w[8]


def test_directory_mode_lists_all_files(spark, sf_small):
    register(spark)
    meta = spark.read.format(FORMAT_NAME).option("path", sf_small).load()
    files = {r.file_name for r in meta.select("file_name").distinct().collect()}
    assert len(files) == 10  # one per table


def test_missing_path_raises(spark):
    register(spark)
    with pytest.raises(Exception, match="path"):
        spark.read.format(FORMAT_NAME).load().collect()


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_provenance_stamp_matches_duckdb_row_numbers(spark, sf):
    """_metadata.row_index must agree with DuckDB's file_row_number on the
    identical parquet — per (file, returnflag) counts and index ranges."""
    import duckdb

    from spark_fuse_spark.catalog import load_all

    got = {
        (r.file_name, r.l_returnflag): (r.n_rows, r.min_idx, r.max_idx)
        for r in load_all()["q_provenance_stamp"].spark(spark, sf).collect()
    }
    path = f"{sf}/lineitem.parquet"
    want = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in duckdb.sql(
            f"""SELECT regexp_extract(filename, '[^/]+$') AS f, l_returnflag,
                       COUNT(*), MIN(file_row_number), MAX(file_row_number)
                FROM read_parquet('{path}', filename=true, file_row_number=true)
                GROUP BY f, l_returnflag"""
        ).fetchall()
    }
    assert got == want
