"""Text analysis built entirely from Catalyst expressions.

Covers the reference's ``normalize_whitespace``
(``/root/reference/src/spark_fuse/utils/transformations.py:119-156``)
plus the training-data-pipeline text suite: tokenization, n-gram
shingling, token counting, quality scoring, language ID, and document
fingerprinting.

Design stance for 100 TB: every function here returns a *Column*
expression built from ``pyspark.sql.functions`` — no Python UDFs — so
text scoring runs inside WholeStageCodegen at scan speed and column
pruning still reaches parquet.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .hashing import portable_hash64

__all__ = [
    "normalize_whitespace",
    "tokens",
    "token_count",
    "subword_token_count",
    "BPE_SPLIT_PATTERN",
    "char_ngrams",
    "word_shingles",
    "punct_ratio",
    "digit_ratio",
    "stopword_ratio",
    "quality_score",
    "language_id",
    "doc_fingerprint",
    "STOPWORDS",
    "PII_PATTERNS",
    "pii_count",
    "redact_pii",
    "SENTIMENT_LEXICON",
    "sentiment_score",
]


def _c(col: "str | Column") -> Column:
    return F.col(col) if isinstance(col, str) else col


def _bind(col: Column, fn) -> Column:
    """Let-binding for expression trees: evaluate ``col`` ONCE per row and
    pass the bound value to ``fn``.

    Implemented as ``transform`` over a one-element array — the lambda
    variable is a cheap variable read, so an expensive subtree (e.g.
    ``split(regexp_replace(...))``) isn't re-evaluated at every reference
    inside ``fn``.  Without this, an expression like shingling that
    references the token array once per offset re-runs the tokenizer per
    shingle — quadratic per document (measured 20s → <2s on 5k docs).
    """
    return F.get(F.transform(F.array(col), fn), 0)


def normalize_whitespace(col: "str | Column") -> Column:
    """Collapse runs of whitespace to single spaces and trim."""
    return F.trim(F.regexp_replace(_c(col), r"\s+", " "))


def tokens(col: "str | Column", lowercase: bool = True) -> Column:
    """Whitespace tokenization → array<string> (empty array for blank text)."""
    base = normalize_whitespace(col)
    if lowercase:
        base = F.lower(base)
    return F.when(base == "", F.array().cast("array<string>")).otherwise(F.split(base, " "))


def token_count(col: "str | Column") -> Column:
    return F.size(tokens(col)).cast("bigint")


# GPT-2-style pre-tokenizer alternation, restricted to constructs shared by
# Java regex (Spark) and RE2 (DuckDB/Rust tokenizers): contractions, then
# space-prefixed letter runs, digit runs, and punctuation runs.  The
# original GPT-2 pattern's trailing-space lookahead is dropped (RE2 has no
# lookahead); pure-whitespace runs are not counted as tokens.
BPE_SPLIT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+"


def subword_token_count(col: "str | Column") -> Column:
    """BPE-ish token count: number of ``BPE_SPLIT_PATTERN`` matches.

    Approximates an LLM tokenizer's pre-tokenization split (the step that
    dominates token-count estimates) without any vocabulary; stays in
    codegen via ``regexp_count``, so counting tokens over 100 TB of text
    is a single scan with no Python in the loop."""
    return F.regexp_count(_c(col), F.lit(BPE_SPLIT_PATTERN)).cast("bigint")


def char_ngrams(col: "str | Column", n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text (array<string>).

    Pure-SQL construction: substring at every offset via ``sequence`` +
    ``transform`` — stays JVM-side.
    """
    def grams(s: Column) -> Column:
        offsets = F.sequence(F.lit(1), F.greatest(F.length(s) - F.lit(n - 1), F.lit(0)))
        return F.array_distinct(F.transform(offsets, lambda i: s.substr(i, F.lit(n))))

    return _bind(F.lower(normalize_whitespace(col)), grams)


def word_shingles(col: "str | Column", k: int = 3) -> Column:
    """Distinct k-word shingles (array<string>), the MinHash unit."""
    def shingle(toks: Column) -> Column:
        offsets = F.sequence(F.lit(0), F.greatest(F.size(toks) - F.lit(k), F.lit(-1)))
        gram = F.transform(offsets, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
        return F.when(F.size(toks) < k, F.array().cast("array<string>")).otherwise(
            F.array_distinct(gram)
        )

    return _bind(tokens(col), shingle)


def _count_matches(col: Column, pattern: str) -> Column:
    """Number of chars matching a regex class, via length-difference."""
    return (F.length(col) - F.length(F.regexp_replace(col, pattern, ""))).cast("bigint")


def punct_ratio(col: "str | Column") -> Column:
    c = _c(col)
    return _count_matches(c, r"[\p{Punct}]") / F.greatest(F.length(c), F.lit(1))


def digit_ratio(col: "str | Column") -> Column:
    c = _c(col)
    return _count_matches(c, r"[0-9]") / F.greatest(F.length(c), F.lit(1))


# Tiny embedded stopword lists — deterministic, offline, good enough for a
# coarse heuristic language ID + quality scoring signal.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on", "with", "as"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "auf", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pas", "avec", "pour", "dans", "des"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "no", "con", "para", "por"),
    "zh": ("的", "是", "不", "了", "在", "有", "我", "他", "这", "中", "大", "上"),
}


def stopword_ratio(col: "str | Column", lang: str = "en") -> Column:
    sw = F.array([F.lit(w) for w in STOPWORDS[lang]])

    def ratio(toks: Column) -> Column:
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        return hits / F.greatest(F.size(toks), F.lit(1))

    return _bind(tokens(col), ratio)


def quality_score(col: "str | Column") -> Column:
    """Composite [0,1] quality heuristic: length band + low punct/digit noise
    + presence of stopwords. Deterministic, engine-portable arithmetic."""
    c = _c(col)
    n = F.length(c).cast("double")
    length_ok = F.when((n >= 50) & (n <= 20000), F.lit(1.0)).otherwise(
        F.least(n / F.lit(50.0), F.lit(1.0))
    )
    noise = punct_ratio(c) + digit_ratio(c)
    noise_ok = F.greatest(F.lit(0.0), F.lit(1.0) - noise * 4)
    sw_ok = F.least(stopword_ratio(c, "en") * 5, F.lit(1.0))
    return (length_ok * 0.4 + noise_ok * 0.4 + sw_ok * 0.2).cast("double")


def language_id(col: "str | Column") -> Column:
    """Heuristic language ID: per-language stopword hit counts, argmax.

    Ties break by language code order (deterministic).  Expressible in
    plain SQL for differential testing.
    """
    def argmax(toks: Column) -> Column:
        # flat argmax over a per-language hits array: array_position finds
        # the FIRST maximum, so earlier language codes win ties — the same
        # semantics as the previous accumulated when-chain, whose tree
        # doubled per language (the chain re-embedded itself at every
        # step; measured several seconds of Catalyst compile per plan)
        codes = sorted(STOPWORDS)

        def contains(sw: Column):
            # closure factory: a default-arg lambda would make PySpark
            # treat the captured array as a second lambda VARIABLE
            return lambda t: F.array_contains(sw, t)

        hits = F.array(
            *[
                F.size(
                    F.filter(
                        toks, contains(F.array([F.lit(w) for w in STOPWORDS[c]]))
                    )
                ).cast("bigint")
                for c in codes
            ]
        )
        def pick(h: Column) -> Column:
            best = F.array_max(h)
            lang = F.element_at(
                F.array([F.lit(c) for c in codes]),
                F.array_position(h, best).cast("int"),
            )
            return F.when(best <= 0, F.lit("und")).otherwise(lang)

        # bind the hits array too: it is consulted three times (max,
        # position, guard) and each reference would otherwise re-embed
        # all five filter subtrees
        return _bind(hits, pick)

    return _bind(tokens(col), argmax)


def doc_fingerprint(col: "str | Column") -> Column:
    """Content fingerprint: portable 60-bit hash of the normalized text.

    Near-dup-insensitive fingerprints come from MinHash/SimHash in
    ``operators.dedup``; this is the exact-content identity key.
    """
    return portable_hash64(F.lower(normalize_whitespace(col)))


# ---------------------------------------------------------------------- PII
# Patterns use only syntax with identical semantics in Java regex (Spark)
# and RE2 (DuckDB/Go): character classes, bounded repetition, \b word
# boundaries — no lookaround, no backreferences — so redaction is
# differential-testable across engines.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
}


def pii_count(col: "str | Column", kind: str) -> Column:
    """Occurrences of one PII pattern (``email``/``ipv4``/``ssn``) —
    codegen ``regexp_count``, scan-speed over the corpus."""
    pattern, _ = PII_PATTERNS[kind]
    return F.regexp_count(_c(col), F.lit(pattern)).cast("bigint")


def redact_pii(col: "str | Column") -> Column:
    """Replace every PII match with its placeholder token, all kinds, in
    the fixed ``PII_PATTERNS`` order (email before ipv4: an address
    inside an email's domain is already consumed by the email match)."""
    out = _c(col)
    for pattern, token in PII_PATTERNS.values():
        out = F.regexp_replace(out, pattern, token)
    return out


# ---------------------------------------------------------------- sentiment
# Minimal valence lexicon (common English polarity words; public-domain
# vocabulary).  The reference's north-star list names "sentiment via UDF"
# (SURVEY §7.1 milestone 5); this re-expression is a pure Catalyst
# filter-count — no UDF, scan-speed, and exactly replayable in SQL.
SENTIMENT_LEXICON: dict[str, tuple[str, ...]] = {
    "positive": (
        "good", "great", "excellent", "amazing", "wonderful", "best",
        "love", "happy", "fantastic", "awesome", "nice", "perfect",
        "brilliant", "enjoy", "helpful", "positive", "success", "win",
    ),
    "negative": (
        "bad", "terrible", "awful", "horrible", "worst", "hate",
        "sad", "poor", "disappointing", "broken", "fail", "negative",
        "wrong", "problem", "error", "slow", "ugly", "lose",
    ),
}


def sentiment_score(col: "str | Column") -> Column:
    """Lexicon sentiment in [-1, 1]: (positive hits − negative hits) over
    total polarity hits; 0.0 when no polarity word appears."""
    pos = F.array([F.lit(w) for w in SENTIMENT_LEXICON["positive"]])
    neg = F.array([F.lit(w) for w in SENTIMENT_LEXICON["negative"]])

    def score(toks: Column) -> Column:
        p = F.size(F.filter(toks, lambda t: F.array_contains(pos, t)))
        n = F.size(F.filter(toks, lambda t: F.array_contains(neg, t)))
        return F.when(p + n > 0, (p - n) / (p + n)).otherwise(F.lit(0.0))

    return _bind(tokens(col), score)
