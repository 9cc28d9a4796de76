"""Distributed BPE tokenization: train merges on the word-frequency
table, apply a frozen merge table corpus-wide — as pure Catalyst folds.

Byte-pair encoding (Sennrich et al. 2016) is THE tokenizer family real
training-data pipelines run before packing, budget selection, and mix
resampling — every token-count consumer is approximate until it counts
the tokens the model will actually see.  This module closes that loop
with two halves:

* :func:`train_bpe` — the trainer.  Like the reference's similarity
  pipeline, it composes plain DataFrame ops (no private engine): fold
  the corpus once into the word-frequency table (one shuffle, map-side
  combined), then iterate merge rounds over the VOCABULARY relation
  only — adjacent-pair counts via ``transform``+``explode``, a 1-row
  argmax collect (bounded, the ``A2`` global-scalar idiom), and one
  :func:`bpe_merge_step` fold to rewrite symbols.  Per-round cost is
  O(vocab × word-length), independent of corpus size — at 100 TB the
  vocabulary table is millions of rows where the corpus is trillions,
  and each round is one small shuffle + a driver round-trip, the same
  bounded-iteration discipline as the PageRank operator.

* :func:`bpe_encode` / :func:`with_bpe_token_count` — the appliers.
  Encoding folds the frozen merge table over each word's character
  array (a nested ``aggregate`` — one JVM-side expression, no Python
  in the hot path; merge tables are a few-KB literal the plan carries
  like any broadcast panel).  Exact per-document token counts use the
  distinct-first rewrite (SURVEY §4.3.4, the same trick that fixed the
  reference's per-row LLM mapping): encode each DISTINCT word once,
  broadcast the tiny (word → n_subtokens) map back, and weight by
  per-document word counts — encode cost O(vocab), not O(corpus).

Merge-application semantics (pinned, both engines): rules apply in
RANK ORDER, one rule at a time; each rule replaces all adjacent
(left, right) occurrences LEFT-TO-RIGHT, non-overlapping.  For merge
tables produced by BPE training this is equivalent to the classic
lowest-rank-first algorithm (``tests/test_bpe.py`` pins the
equivalence): a trained rule's operands are single characters or
outputs of EARLIER rules, so by the time rule k is reached every
occurrence of its operands already exists — later rules cannot create
them.  :func:`bpe_encode_sql` emits the identical fold for DuckDB
(nested ``list_reduce``), which is what makes the catalog's BPE
queries fully oracle-paired.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

__all__ = [
    "bpe_merge_step",
    "bpe_encode",
    "bpe_encode_sql",
    "word_frequency",
    "train_bpe",
    "with_bpe_tokens",
    "with_bpe_token_count",
]


def _c(col: "str | Column") -> Column:
    return F.col(col) if isinstance(col, str) else col


def bpe_merge_step(
    syms: "str | Column", left_lit: "str | Column", right_lit: "str | Column"
) -> Column:
    """Apply ONE merge rule to a symbol array: replace adjacent
    (left, right) pairs with their concatenation, left-to-right,
    non-overlapping — a single O(len) fold.

    Argument conventions differ deliberately from the module's ``_c``
    rule: ``syms`` as a str names a COLUMN, while ``left_lit`` /
    ``right_lit`` as str are LITERAL symbols (merge-rule operands are
    data values, not columns — the trainer passes collected strings,
    the encoder passes struct fields).  Pass a ``Column`` explicitly if
    a rule operand genuinely lives in a column.

    The fold appends each symbol unless the accumulator's last element
    is ``left`` and the incoming symbol is ``right``, in which case the
    pair collapses.  A symbol just produced by THIS rule can never
    false-trigger as the next pair's left operand: that would require
    ``left + right == left``.
    """
    l = left_lit if isinstance(left_lit, Column) else F.lit(left_lit)
    r = right_lit if isinstance(right_lit, Column) else F.lit(right_lit)
    return F.aggregate(
        _c(syms),
        F.array().cast("array<string>"),
        lambda acc, c: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (c == r),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.concat(l, r))
            ),
        ).otherwise(F.concat(acc, F.array(c))),
    )


def bpe_encode(word: "str | Column", merges: Sequence[tuple]) -> Column:
    """BPE symbol array for a single word: split to characters, then
    fold the merge table in rank order (see module doc for semantics).

    One nested ``aggregate`` expression — the outer fold walks the
    merge-table literal, the inner fold is :func:`bpe_merge_step` — so
    the whole encode stays JVM-side regardless of merge count.
    """
    merges_arr = F.array(
        *[
            F.struct(F.lit(str(l)).alias("l"), F.lit(str(r)).alias("r"))
            for l, r in merges
        ]
    )
    chars = F.split(_c(word), "")
    if not merges:
        return chars
    return F.aggregate(
        merges_arr,
        chars,
        lambda syms, m: bpe_merge_step(syms, m["l"], m["r"]),
    )


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def bpe_encode_sql(expr: str, merges: Sequence[tuple]) -> str:
    """DuckDB replay of :func:`bpe_encode` over the SQL expression
    ``expr`` (a VARCHAR word): the identical rank-ordered left-to-right
    fold, one ``list_reduce`` per rule.

    DuckDB's ``list_reduce`` takes no initial accumulator and types the
    accumulator like the elements, so symbols are wrapped in singleton
    lists (accumulator = VARCHAR[]); the first element doubles as the
    seed, which matches the Spark fold (one symbol can never merge).
    Nesting is linear in the merge count — each level wraps the
    previous expression exactly once.
    """
    out = f"string_split({expr}, '')"
    for l, r in merges:
        le, re_, me = _sql_quote(str(l)), _sql_quote(str(r)), _sql_quote(str(l) + str(r))
        out = (
            f"list_reduce(list_transform({out}, s -> [s]),\n"
            f"  (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = '{le}' "
            f"AND x[1] = '{re_}'\n"
            f"    THEN list_append(acc[1:len(acc)-1], '{me}')\n"
            f"    ELSE list_append(acc, x[1]) END)"
        )
    return out


def word_frequency(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table ``(w, freq)`` on the shared
    whitespace tokenizer — ONE map-side-combined shuffle; everything
    downstream of BPE training touches only this relation."""
    return (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )


def train_bpe(
    wf: DataFrame,
    n_merges: int,
    *,
    word_col: str = "w",
    freq_col: str = "freq",
    min_pair_freq: int = 1,
) -> "list[tuple[str, str, int]]":
    """Train ``n_merges`` BPE merge rules from a word-frequency table.

    Returns ``[(left, right, pair_freq), ...]`` in training order.
    Deterministic: the argmax tie-breaks by (freq desc, left, right).
    Each round is one pair-count shuffle over the vocabulary relation
    plus a 1-row collect; the symbol rewrite is a single
    :func:`bpe_merge_step` fold, localCheckpointed so expression depth
    and lineage stay constant across rounds (the PageRank discipline).
    Stops early when no pair reaches ``min_pair_freq``.
    """
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    vocab = (
        wf.select(
            F.col(word_col).alias("w"), F.col(freq_col).cast("long").alias("freq")
        )
        .withColumn("syms", F.split("w", ""))
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.where(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS l, "
                        "element_at(syms, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "freq")
        )
        top = (
            pairs.groupBy("l", "r")
            .agg(F.sum("freq").alias("pf"))
            .orderBy(F.col("pf").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top or top[0]["pf"] < min_pair_freq:
            break
        l, r, pf = top[0]["l"], top[0]["r"], int(top[0]["pf"])
        merges.append((l, r, pf))
        vocab = vocab.withColumn(
            "syms", bpe_merge_step("syms", l, r)
        ).localCheckpoint()
    return merges


def with_bpe_tokens(
    df: DataFrame,
    text_col: str,
    merges: Sequence[tuple],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Full in-order BPE token stream per row: tokenize to words, encode
    each word, flatten — ``out_col`` is ``array<string>`` in document
    order (what packing/serialization consumes when it needs the actual
    subwords, not just counts).

    One Catalyst expression per row, no shuffle, no Python: row identity
    and partitioning are untouched, so this composes with any downstream
    plan.  Unlike :func:`with_bpe_token_count` there is no distinct-word
    reuse — each word instance re-folds the merge table — which is the
    right trade when the caller needs the stream anyway (a distinct-first
    variant would have to re-assemble per-document order through a
    collect_list shuffle, costing more than it saves).
    """
    return df.withColumn(
        out_col,
        F.flatten(F.transform(tokens(text_col), lambda w: bpe_encode(w, merges))),
    )


def with_bpe_token_count(
    df: DataFrame,
    key_col: str,
    text_col: str,
    merges: Sequence[tuple],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Exact per-row BPE token count via the distinct-first rewrite:
    encode each DISTINCT word once, broadcast the (word → n_subtokens)
    map back onto per-row word counts, and sum.

    Output: ``df`` plus ``out_col`` (long; 0 for blank text).  ``df``'s
    other columns pass through unchanged.  ``key_col`` must be unique
    per row (it keys the re-join).  Scale: the encode fold runs
    O(|vocab|) times; the corpus-side cost is one explode + two
    key-local aggregations and a broadcast join — no corpus×vocab
    shuffle.
    """
    wpd = (
        df.select(F.col(key_col), F.explode(tokens(text_col)).alias("w"))
        .groupBy(key_col, "w")
        .agg(F.count("*").alias("__cnt"))
    )
    vocab = (
        wpd.select("w")
        .distinct()
        .withColumn("__n_syms", F.size(bpe_encode("w", merges)).cast("long"))
    )
    counts = (
        wpd.join(F.broadcast(vocab), "w")
        .groupBy(key_col)
        .agg(F.sum(F.col("__cnt") * F.col("__n_syms")).alias(out_col))
    )
    return df.join(counts, key_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(0)).cast("long")
    )
