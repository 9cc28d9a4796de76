"""BPE trainer/encoder: Spark + DuckDB folds vs a pure-Python reference.

Pins three things:

1. the Spark trainer reproduces greedy BPE training (pair argmax with
   the (freq desc, left, right) tie-break) on random corpora;
2. the Spark fold encoder == the Python left-to-right scan == the
   DuckDB ``list_reduce`` replay, word for word;
3. for TRAINED merge tables, rank-ordered sequential application ==
   the classic lowest-rank-first algorithm (the equivalence the module
   doc claims — trained operands always exist before their rule runs).
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from spark_fuse_spark.functions.bpe import (
    bpe_encode,
    bpe_encode_sql,
    bpe_merge_step,
    train_bpe,
    with_bpe_token_count,
    with_bpe_tokens,
    word_frequency,
)


# ------------------------------------------------------- python reference
def py_merge_step(syms: list, l: str, r: str) -> list:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def py_encode_sequential(word: str, merges: list) -> list:
    syms = list(word)
    for l, r in merges:
        syms = py_merge_step(syms, l, r)
    return syms


def py_encode_classic(word: str, merges: list) -> list:
    """Classic BPE apply: repeatedly merge the lowest-RANK pair present."""
    rank = {(l, r): i for i, (l, r) in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        pairs = {(a, b) for a, b in zip(syms, syms[1:])}
        ranked = [(rank[p], p) for p in pairs if p in rank]
        if not ranked:
            break
        _, (l, r) = min(ranked)
        syms = py_merge_step(syms, l, r)
    return syms


def py_train(word_freqs: dict, n_merges: int) -> list:
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        pc: dict = {}
        for w, f in word_freqs.items():
            s = vocab[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + f
        if not pc:
            break
        (l, r), pf = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, pf))
        for w in vocab:
            vocab[w] = py_merge_step(vocab[w], l, r)
    return merges


def _random_word_freqs(rng: random.Random, n_words: int) -> dict:
    alphabet = "abcd"
    out = {}
    for _ in range(n_words):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
        out[w] = out.get(w, 0) + rng.randint(1, 9)
    return out


# ------------------------------------------------------------ merge step
def test_merge_step_matches_python_scan(spark):
    cases = ["aab", "banana", "aaaa", "a", "abab", "bbaabb"]
    rules = [("a", "b"), ("a", "a"), ("b", "a")]
    rows = spark.createDataFrame([(w,) for w in cases], ["w"])
    for l, r in rules:
        got = {
            row["w"]: list(row["m"])
            for row in rows.select(
                "w", bpe_merge_step(F.split("w", ""), l, r).alias("m")
            ).collect()
        }
        for w in cases:
            assert got[w] == py_merge_step(list(w), l, r), (w, l, r)


# ------------------------------------------------- trainer == python BPE
def test_train_bpe_matches_python_reference(spark):
    rng = random.Random(7)
    for trial in range(3):
        wf_dict = _random_word_freqs(rng, 30)
        wf = spark.createDataFrame(list(wf_dict.items()), ["w", "freq"])
        got = train_bpe(wf, 10)
        want = py_train(wf_dict, 10)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_train_bpe_zero_rounds_and_min_freq(spark):
    wf = spark.createDataFrame([("ab", 3), ("cd", 1)], ["w", "freq"])
    assert train_bpe(wf, 0) == []
    # every pair has freq <= 3; a floor of 4 stops training immediately
    assert train_bpe(wf, 5, min_pair_freq=4) == []


# ------------------------- encoder: spark fold == python == duckdb replay
def test_encode_three_way_parity(spark):
    rng = random.Random(11)
    wf_dict = _random_word_freqs(rng, 40)
    merges = [(l, r) for l, r, _ in py_train(wf_dict, 12)]
    words = sorted(wf_dict)
    got = {
        row["w"]: list(row["e"])
        for row in spark.createDataFrame([(w,) for w in words], ["w"])
        .select("w", bpe_encode("w", merges).alias("e"))
        .collect()
    }
    con = duckdb.connect()
    sql = bpe_encode_sql("w", merges)
    for w in words:
        want = py_encode_sequential(w, merges)
        assert got[w] == want, (w, got[w], want)
        (duck,) = con.execute(f"SELECT {sql} FROM (SELECT ? AS w)", [w]).fetchone()
        assert list(duck) == want, (w, duck, want)
    assert all("".join(got[w]) == w for w in words)  # lossless


def test_encode_empty_merge_table_is_char_split(spark):
    row = (
        spark.createDataFrame([("abc",)], ["w"])
        .select(bpe_encode("w", []).alias("e"))
        .collect()[0]
    )
    assert list(row["e"]) == ["a", "b", "c"]


def test_sequential_equals_classic_for_trained_tables(spark):
    # the equivalence claim in the module doc: for merge tables produced
    # by BPE TRAINING, rank-ordered one-pass-per-rule application equals
    # the classic lowest-rank-first algorithm.  Random corpora, plus
    # encode of words the trainer never saw (held-out generalization).
    rng = random.Random(23)
    for _ in range(3):
        wf_dict = _random_word_freqs(rng, 25)
        merges = [(l, r) for l, r, _ in py_train(wf_dict, 15)]
        held_out = ["".join(rng.choice("abcd") for _ in range(rng.randint(1, 10)))
                    for _ in range(20)]
        for w in list(wf_dict) + held_out:
            assert py_encode_sequential(w, merges) == py_encode_classic(w, merges), (
                w,
                merges,
            )


def test_encode_sql_escapes_quotes():
    sql = bpe_encode_sql("w", [("'", "'")])
    con = duckdb.connect()
    (out,) = con.execute(f"SELECT {sql} FROM (SELECT '''''' AS w)").fetchone()
    assert list(out) == ["''"]


# ------------------------------------------------------------ token count
def test_with_bpe_token_count(spark):
    merges = [("a", "b"), ("ab", "c")]
    df = spark.createDataFrame(
        [(1, "abc ab xyz"), (2, ""), (3, "abc abc")], ["id", "txt"]
    )
    got = {
        r["id"]: r["n"]
        for r in with_bpe_token_count(df, "id", "txt", merges, out_col="n").collect()
    }
    # abc -> [abc] (1), ab -> [ab] (1), xyz -> x y z (3)
    assert got == {1: 5, 2: 0, 3: 2}


def test_with_bpe_tokens_stream_in_document_order(spark):
    merges = [("a", "b"), ("ab", "c")]
    df = spark.createDataFrame([(1, "abc xab"), (2, "")], ["id", "txt"])
    got = {
        r["id"]: list(r["bpe_tokens"])
        for r in with_bpe_tokens(df, "txt", merges).collect()
    }
    assert got == {1: ["abc", "x", "ab"], 2: []}
    # stream length agrees with the distinct-first counter
    counted = {
        r["id"]: r["n"]
        for r in with_bpe_token_count(df, "id", "txt", merges, out_col="n").collect()
    }
    assert counted == {k: len(v) for k, v in got.items()}


def test_word_frequency(spark):
    df = spark.createDataFrame([("a b  a",), ("b",)], ["text"])
    got = {r["w"]: r["freq"] for r in word_frequency(df).collect()}
    assert got == {"a": 2, "b": 2}


def test_fertility_audit_invariants(spark):
    """t_bpe_fertility's ratios obey the tokenizer algebra: every word is
    >= 1 subtoken (fertility_micro >= 1e6) and every subtoken spans >= 1
    byte of raw text (bytes_per_token_micro >= 1e6 — whitespace bytes
    only push it higher)."""
    from spark_fuse_spark.catalog import load_all

    rows = load_all()["t_bpe_fertility"].spark(spark, "/root/testdata/sf0.001").collect()
    assert rows, "no (source, lang) cells"
    for r in rows:
        assert r["n_words"] > 0 and r["n_bpe_tokens"] >= r["n_words"]
        assert r["fertility_micro"] >= 1_000_000
        assert r["bytes_per_token_micro"] >= 1_000_000
        # exact-integer definition, recomputed driver-side
        assert r["fertility_micro"] == r["n_bpe_tokens"] * 1_000_000 // r["n_words"]
        assert (
            r["bytes_per_token_micro"]
            == r["n_bytes"] * 1_000_000 // r["n_bpe_tokens"]
        )
