"""Bucketed co-located joins: the write-once-shuffle-never layout.

Asserts the actual scale property via plan introspection: an equi-join of
two tables bucketed on their join keys (same bucket count) compiles to a
SortMergeJoin with NO shuffle Exchange on either side, while the identical
join of unbucketed inputs exchanges both sides.  Auto-broadcast is
disabled in these tests because at real scale neither fact table fits a
broadcast — the local default would otherwise mask the property.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from spark_fuse_spark.operators.bucketing import (
    bucket_spec,
    is_bucketed_like,
    write_bucketed,
)
from spark_fuse_spark.plans import exchange_count, join_strategies
from spark_fuse_spark.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_small):
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    assert warehouse  # saveAsTable target exists for the test session
    li = load_table(spark, sf_small, "lineitem")
    o = load_table(spark, sf_small, "orders")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    write_bucketed(o, "o_bucketed", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    yield li, o
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_metadata_and_compatibility(spark, bucketed):
    assert bucket_spec(spark, "li_bucketed") == (["l_orderkey"], 8)
    assert bucket_spec(spark, "o_bucketed") == (["o_orderkey"], 8)
    assert is_bucketed_like(
        spark, "li_bucketed", "o_bucketed", on=[("l_orderkey", "o_orderkey")]
    )
    # wrong join-key mapping -> not co-locatable
    assert not is_bucketed_like(
        spark, "li_bucketed", "o_bucketed", on=[("l_partkey", "o_orderkey")]
    )


def test_bucketed_join_is_shuffle_free(spark, bucketed, no_broadcast):
    li, o = bucketed
    lb, ob = spark.table("li_bucketed"), spark.table("o_bucketed")

    joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
    assert join_strategies(joined) == {"SortMergeJoin": 1}
    assert exchange_count(joined) == 0  # the whole point

    plain = li.join(o, li.l_orderkey == o.o_orderkey)
    assert exchange_count(plain) == 2  # both sides exchange without buckets

    # same rows either way
    cols = ["l_orderkey", "l_linenumber", "o_orderstatus"]
    assert sorted(map(tuple, joined.select(cols).collect())) == sorted(
        map(tuple, plain.select(cols).collect())
    )


def test_bucketed_aggregation_skips_exchange(spark, bucketed, no_broadcast):
    lb = spark.table("li_bucketed")
    agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert exchange_count(agg) == 0  # grouping key == bucket key
    other = lb.groupBy("l_suppkey").agg(F.sum("l_quantity").alias("q"))
    assert exchange_count(other) == 1  # non-bucket key still shuffles


def test_date_partitioned_write_prunes(spark, sf_small, tmp_path_factory):
    from spark_fuse_spark.operators.bucketing import write_date_partitioned
    from spark_fuse_spark.plans import scan_summaries

    path = str(tmp_path_factory.mktemp("events_part"))
    ev = load_table(spark, sf_small, "events")
    pcol = write_date_partitioned(ev, path, "ts", granularity="day")
    assert pcol == "p_day"

    back = spark.read.parquet(path)
    one_day = back.where(F.col(pcol) == "2024-01-15")
    scans = scan_summaries(one_day)
    assert len(scans) == 1
    # the partition predicate must prune directories, not filter rows:
    assert any("p_day" in f for f in scans[0].partition_filters)
    assert not any("p_day" in f for f in scans[0].pushed_filters)
    # pruned scan returns exactly the rows whose ts falls in that month
    expected = ev.where(F.date_format("ts", "yyyy-MM-dd") == "2024-01-15").count()
    assert expected > 0  # events span January 2024 at every SF
    assert one_day.count() == expected


def test_size_aware_compaction(spark, sf_small, tmp_path_factory):
    import glob

    from spark_fuse_spark.operators.layout import estimated_size_bytes, write_compacted

    li = load_table(spark, sf_small, "lineitem")
    size = estimated_size_bytes(li)
    assert size > 0
    # pruning a projection shrinks the estimate (Catalyst accounts for it)
    assert estimated_size_bytes(li.select("l_orderkey")) < size

    out = str(tmp_path_factory.mktemp("compact"))
    n = write_compacted(li, out, target_file_bytes=max(1, size // 4))
    files = glob.glob(f"{out}/part-*")
    assert n == len(files) >= 3  # ~4 target-size files requested
    assert spark.read.parquet(out).count() == li.count()

    out_one = str(tmp_path_factory.mktemp("compact_one"))
    assert write_compacted(li, out_one, num_files=1) == 1
    assert len(glob.glob(f"{out_one}/part-*")) == 1


def _files_overlapping(path, col, lo, hi):
    """Count output files whose footer min/max range intersects [lo, hi]."""
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(path + "/*.parquet")
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        fmn = min(
            md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups)
        )
        fmx = max(
            md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups)
        )
        if fmx >= lo and fmn <= hi:
            hit += 1
    return hit, len(files)


def test_zorder_skips_files_on_every_clustered_column(spark, tmp_path):
    """Z-order layout: a narrow predicate on EITHER clustered column must
    skip files (footer min/max pruning), whereas a plain sort only helps
    its own leading column."""
    from pyspark.sql import functions as F

    from spark_fuse_spark.operators.layout import write_zordered

    df = spark.range(0, 200_000).select(
        (F.col("id") % 447).alias("a"), ((F.col("id") * 7919) % 631).alias("b")
    )
    zp, sp = str(tmp_path / "z"), str(tmp_path / "s")
    write_zordered(df, zp, ["a", "b"], num_files=16)
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(sp)

    for col in ("a", "b"):
        hit, total = _files_overlapping(zp, col, 100, 110)
        assert total == 16
        assert hit <= total * 0.6, f"zorder should skip files on {col}: {hit}/{total}"
    # the single-column sort cannot skip anything on the other column
    hit_b, total = _files_overlapping(sp, "b", 100, 110)
    assert hit_b == total


def test_zorder_value_validates_inputs(spark):
    from spark_fuse_spark.operators.layout import zorder_value

    df = spark.range(4).selectExpr("id a", "id b", "id c", "id d")
    with pytest.raises(ValueError):
        zorder_value(df, [])
    with pytest.raises(ValueError):
        zorder_value(df, ["a", "b", "c", "d"], bits=16)  # 64 bits > 63


def test_zorder_value_accepts_precomputed_bounds(spark):
    """With bounds supplied, no stats job runs and the key matches the
    computed-stats key."""
    from spark_fuse_spark.operators.layout import zorder_value

    df = spark.range(0, 1000).selectExpr("id % 31 a", "id % 17 b")
    _, z_auto = zorder_value(df, ["a", "b"], bits=8)
    _, z_given = zorder_value(df, ["a", "b"], bits=8, bounds={"a": (0, 30), "b": (0, 16)})
    mism = (
        df.select((z_auto).alias("x"))
        .exceptAll(df.select((z_given).alias("x")))
        .count()
    )
    assert mism == 0


def test_ivf_list_layout_prunes_unprobed_lists(spark, sf_small, tmp_path_factory):
    """The SCALE.md encode-once contract, pinned end-to-end: assign the
    corpus to IVF lists, write partitionBy(ivf_list), and a probe-bounded
    read must show a PartitionFilters entry on ivf_list — unprobed lists
    are never scanned, which is what makes IVF's candidate cut a DISK cut
    too at 100 TB."""
    from pyspark.sql import functions as F

    from spark_fuse_spark.operators.similarity import ivf_assign, train_ivf_centroids
    from spark_fuse_spark.plans import scan_summaries

    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    cents = train_ivf_centroids(emb, k=4, sample_rows=200)
    assigned = ivf_assign(emb, cents)
    path = str(tmp_path_factory.mktemp("ivf_layout") / "emb")
    assigned.write.mode("overwrite").partitionBy("ivf_list").parquet(path)

    probes = [cents[0][0], cents[1][0]]
    rd = spark.read.parquet(path).where(F.col("ivf_list").isin(probes))
    scans = scan_summaries(rd)
    assert scans, "no parquet scan in plan"
    assert any(
        any("ivf_list" in f for f in s.partition_filters) for s in scans
    ), scans
    # the probe read touches a strict subset of the corpus
    total = spark.read.parquet(path).count()
    probed = rd.count()
    assert 0 < probed < total
