"""Python UDTF tests: lateral chunking over documents."""

from __future__ import annotations

from spark_fuse_spark.functions.udtfs import register_udtfs


def test_text_chunks_lateral_sql(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))), (2, "short text"), (3, None)],
        ["doc_id", "text"],
    ).createOrReplaceTempView("chunk_docs")
    rows = spark.sql(
        "SELECT d.doc_id, c.idx, c.n_tokens FROM chunk_docs d, "
        "LATERAL text_chunks(d.text, 64, 16) c"
    ).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["idx"], r["n_tokens"]))
    # 100 tokens, size 64, step 48 → windows at 0 (64 toks) and 48 (52 toks)
    assert sorted(by_doc[1]) == [(0, 64), (1, 52)]
    assert by_doc[2] == [(0, 2)]
    assert 3 not in by_doc  # null text yields no rows


def test_text_chunks_reconstruction(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], ["doc_id", "text"]
    ).createOrReplaceTempView("chunk_docs2")
    rows = spark.sql(
        "SELECT c.idx, c.chunk FROM chunk_docs2 d, "
        "LATERAL text_chunks(d.text, 4, 0) c ORDER BY c.idx"
    ).collect()
    rebuilt = " ".join(r["chunk"] for r in rows)
    assert rebuilt == " ".join(f"t{i}" for i in range(10))
