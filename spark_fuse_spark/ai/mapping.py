"""Semantic column normalization onto a closed target set — distinct-first.

Plan shape (the 100 TB rewrite of reference ``utils/llm.py:416-561``):

1. ``select(column).distinct()`` — cardinality, not row count;
2. exact/normalized matches resolve WITHOUT the model (reference
   dry-run mode, ``llm.py:447-460``);
3. only unresolved distincts go through the provider, Arrow-batched
   via ``mapInPandas``;
4. the tiny (distinct → target) mapping broadcast-joins back onto the
   full frame — no shuffle of the fact table.

Provider contract: zero-arg factory returning an object with
``map_values(values: list[str], targets: list[str]) -> list[str | None]``.
:class:`ClosedSetMatcher` is the deterministic offline stub (normalized
equality + token-overlap scoring); a real deployment injects a
chat-completions-backed provider through the same factory hook.
"""

from __future__ import annotations

import re
from typing import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

__all__ = ["ClosedSetMatcher", "map_column_with_llm"]

_PROVIDER_CACHE: dict[str, object] = {}


def _normalize(value: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", value.lower()).strip()


class ClosedSetMatcher:
    """Deterministic stand-in for an LLM mapper: best token-overlap match.

    NOT a language model — a clearly-marked offline stub with the same
    call shape, so pipelines and tests run hermetically.
    """

    def map_values(
        self, values: Sequence[str], targets: Sequence[str]
    ) -> list["str | None"]:
        prepared = [(t, set(_normalize(t).split())) for t in targets]
        out: list[str | None] = []
        for value in values:
            tokens = set(_normalize(value).split())
            best, best_score = None, 0.0
            for target, target_tokens in prepared:
                union = tokens | target_tokens
                score = len(tokens & target_tokens) / len(union) if union else 0.0
                if score > best_score:
                    best, best_score = target, score
            out.append(best if best_score > 0 else None)
        return out


def _cached_provider(factory: Callable[[], object]) -> object:
    key = f"{getattr(factory, '__module__', '?')}.{getattr(factory, '__qualname__', repr(factory))}"
    provider = _PROVIDER_CACHE.get(key)
    if provider is None:
        provider = factory()
        _PROVIDER_CACHE[key] = provider
    return provider


def map_column_with_llm(
    df: DataFrame,
    column: str,
    target_values: Sequence[str],
    provider_factory: "Callable[[], object] | None" = None,
    output_col: "str | None" = None,
    exact_match_first: bool = True,
    batch_size: int = 64,
    driver_map_threshold: int = 10_000,
) -> DataFrame:
    """Add ``<column>_mapped``: each value normalized onto ``target_values``.

    Unmappable values yield null (reference leaves them null and counts
    them via accumulators, ``llm.py:551-559``).

    When the unresolved distinct count is ≤ ``driver_map_threshold`` the
    provider runs once on the driver (a handful of label strings does not
    need a distributed stage — this skips the Python-worker exchange
    entirely); above it, the provider fans out Arrow-batched via
    ``mapInPandas``.  Both paths produce the same tiny mapping frame that
    broadcast-joins back.
    """
    output_col = output_col or f"{column}_mapped"
    targets = list(dict.fromkeys(target_values))
    factory = provider_factory or ClosedSetMatcher
    spark = df.sparkSession

    distinct = df.select(F.col(column).cast("string").alias("__value")).distinct()

    # stage 2: resolve normalized-exact matches without the model
    exact_pairs = {_normalize(t): t for t in targets}
    if exact_match_first:
        norm_map = spark.createDataFrame(
            [(k, v) for k, v in exact_pairs.items()], ["__norm", "__exact"]
        )
        distinct = (
            distinct.withColumn(
                "__norm", F.regexp_replace(F.lower("__value"), r"[^a-z0-9]+", " ")
            )
            .withColumn("__norm", F.trim(F.regexp_replace("__norm", r"\s+", " ")))
            .join(F.broadcast(norm_map), "__norm", "left")
            .drop("__norm")
        )
    else:
        distinct = distinct.withColumn("__exact", F.lit(None).cast("string"))

    # stage 3: provider maps only the unresolved distincts
    schema = StructType(
        [StructField("__value", StringType()), StructField("__mapped", StringType())]
    )
    unresolved = distinct.where(F.col("__exact").isNull()).select("__value")

    head = unresolved.limit(driver_map_threshold + 1).collect()
    if len(head) <= driver_map_threshold:
        # small cardinality: one driver-side provider call, no Python stage
        provider = _cached_provider(factory)
        values = [r["__value"] for r in head]
        mapped: list[str | None] = []
        for i in range(0, len(values), batch_size):
            mapped.extend(
                provider.map_values([v or "" for v in values[i : i + batch_size]], targets)
            )
        provided = spark.createDataFrame(list(zip(values, mapped)), schema)
    else:

        def run_provider(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            provider = _cached_provider(factory)
            for batch in batches:
                values = batch["__value"].fillna("").tolist()
                mapped: list[str | None] = []
                for i in range(0, len(values), batch_size):
                    mapped.extend(
                        provider.map_values(values[i : i + batch_size], targets)
                    )
                yield pd.DataFrame({"__value": batch["__value"], "__mapped": mapped})

        provided = unresolved.mapInPandas(run_provider, schema)

    mapping = (
        distinct.where(F.col("__exact").isNotNull())
        .select("__value", F.col("__exact").alias("__mapped"))
        .unionByName(provided)
    )

    # stage 4: broadcast the (distinct → target) mapping back — the fact
    # frame never shuffles
    return (
        df.join(
            F.broadcast(mapping),
            F.col(column).cast("string").eqNullSafe(F.col("__value")),
            "left",
        )
        .drop("__value")
        .withColumnRenamed("__mapped", output_col)
    )
