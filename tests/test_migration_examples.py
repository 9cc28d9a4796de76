"""MIGRATION.md drift gate: every API the migration guide maps to must
exist with the documented signature shape.  Each block mirrors one
section of the guide (stub providers replace live services)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_session_mapping():
    from spark_fuse_spark.session import create_session, detect_environment

    assert callable(create_session) and callable(detect_environment)


def test_source_mappings_exist():
    from spark_fuse_spark.sources import qdrant, rest, sparql

    for mod in (rest, sparql, qdrant):
        assert mod.FORMAT_NAME and mod.CONFIG_OPTION and callable(mod.register)
    cfg = rest.build_rest_config("http://h/x", records_field="results")
    assert isinstance(cfg, str) and "results" in cfg
    # round-6 pushdown knobs documented in MIGRATION.md
    assert "filter_param_map" in rest.build_rest_config(
        "http://h/x", filter_param_map={"status": "status"}
    )
    assert '"predicate_pushdown": true' in qdrant.build_qdrant_read_config(
        "http://h", "c", predicate_pushdown=True
    )
    assert isinstance(sparql.build_sparql_config("http://h/q", "ASK WHERE {}"), str)
    assert isinstance(
        qdrant.build_qdrant_write_config(
            "http://h", "c", id_column="id", vector_column="embedding",
            payload_columns=["name"],
        ),
        str,
    )


def test_embedding_mapping(spark):
    from spark_fuse_spark.ai.adapters import langchain_factory, warmed_factory
    from spark_fuse_spark.ai.embeddings import with_embeddings

    class FakeEmbeddings:  # the LangChain duck-type from the guide
        def embed_documents(self, texts):
            return [[float(len(t)), 1.0] for t in texts]

    df = spark.createDataFrame([("one two",)], ["text"])
    out = with_embeddings(
        df,
        "text",
        provider_factory=warmed_factory(langchain_factory(FakeEmbeddings)),
        splitter=lambda t: t.split(),
        chunk_agg="mean",
        batch_size=16,
    )
    row = out.collect()[0]
    # chunks "one"/"two" embed to [3.0, 1.0] each; mean keeps [3.0, 1.0]
    assert row.embedding == [3.0, 1.0]


def test_mapping_mapping(spark):
    from spark_fuse_spark.ai.llm import openai_chat_factory
    from spark_fuse_spark.ai.mapping import map_column_with_llm

    assert callable(openai_chat_factory)  # live path covered in test_llm_provider
    df = spark.createDataFrame([("apple",), ("APPLE ",)], ["fruit"])
    mapped = map_column_with_llm(df, "fruit", ["Apple", "Banana"])
    vals = {r.fruit_mapped for r in mapped.collect()}
    assert vals == {"Apple"}


def test_dates_and_columns_mapping(spark):
    from spark_fuse_spark.functions.dates import (
        calendar_dimension,
        split_by_date_formats,
        time_dimension,
    )
    from spark_fuse_spark.operators.columns import (
        cast_columns,
        ensure_columns,
        preview,
        rename_columns,
        with_constants,
    )

    assert calendar_dimension(spark, "2024-01-01", "2024-01-07").count() == 7
    assert time_dimension(spark, grain_seconds=3600).count() == 24
    for fn in (split_by_date_formats, preview, rename_columns, with_constants,
               cast_columns, ensure_columns):
        assert callable(fn)


def test_similarity_pipeline_mapping(spark):
    from spark_fuse_spark.operators.similarity import (
        SimilarityPipeline,
        identity_embedding,
        kmeans_partition,
        prepare_cosine,
        select_representatives,
    )

    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(12)], ["id", "vec"]
    )
    pipe = SimilarityPipeline(
        embed=lambda d: identity_embedding(d, "vec"),
        prepare=prepare_cosine,
        partition=lambda d: kmeans_partition(d, k=2, max_iter=3),
        choose=lambda d: select_representatives(d, strategy="max", order_col="id"),
    )
    clustered = pipe.run(df)
    assert "cluster_id" in clustered.columns
    reps = pipe.select_representatives(df)
    assert 0 < reps.count() <= 2


def test_cdc_mapping(spark, tmp_path):
    from spark_fuse_spark.cdc import apply_change_tracking, change_tracking_writer

    t = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    apply_change_tracking(spark, df, t, ["id"], mode="current_only")
    (
        change_tracking_writer(spark.createDataFrame([(2, "b2")], ["id", "v"]))
        .option("change_tracking_mode", "current_only")
        .option("business_keys", "id")
        .table(t)
    )
    rows = {r.id: r.v for r in spark.read.parquet(t).collect()}
    assert rows == {1: "a", 2: "b2"}


def test_cli_mapping(capsys):
    from spark_fuse_spark.cli import main

    assert main(["datasources"]) == 0
    out = capsys.readouterr().out
    assert "fuse-rest" in out and "fuse-qdrant" in out
