"""Text primitives for the training-data operators — all JVM-side Column
expressions (no Python UDFs in the hot path; SURVEY.md §2.7 note).

Cross-engine hash contract: ``hash28`` is the 28-bit integer embedding of
md5's first 7 hex chars. Both Spark (``conv(substr(md5(x),1,7),16,10)``)
and DuckDB (``('0x'||substr(md5(x),1,7))::BIGINT``) compute the identical
value, which is what lets MinHash/SimHash signatures be oracle-checked
bit-for-bit. 28 bits also keeps ``a*h + b`` far below 2^63 for the
universal-hash permutations (no overflow on either engine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: regex for BPE-ish tokenization: letter runs, digit runs, single symbols
BPE_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: str | Column) -> Column:
    """Whitespace tokens of the lowercased, trimmed text."""
    return F.split(F.trim(F.lower(_c(col))), r"\s+")


def bpe_ish_tokens(col: str | Column) -> Column:
    """BPE-ish sub-word tokens via regex extraction (letter runs / digit
    runs / single punctuation), the cheap token-count estimator."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(BPE_REGEX), 0)


def shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct n-token shingles ('w1 w2 w3') of a token array; empty when
    fewer than n tokens (guarded — Spark's sequence() would otherwise
    generate a *descending* range)."""
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)))
    return F.when(F.size(tokens) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(tokens: Column, n: int) -> Column:
    """Adjacent word n-grams ('w1 .. wn') of a token array, NON-distinct
    (repetition metrics need multiplicity); empty when fewer than n tokens
    (guarded — Spark's sequence() would otherwise generate a *descending*
    range). Pure array lambda, codegen'd, shuffle-free."""
    idx = F.sequence(F.lit(0), F.size(tokens) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)))
    return F.when(F.size(tokens) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_bigrams(tokens: Column) -> Column:
    """Adjacent word bigrams ('w1 w2') of a token array, NON-distinct (the
    repetition signal needs multiplicity); empty when fewer than 2 tokens.
    Pure zip of the array against itself shifted by one — codegen'd."""
    n = F.size(tokens)
    return F.when(
        n >= 2,
        F.zip_with(
            F.slice(tokens, 1, n - 1),
            F.slice(tokens, 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def hash28(col: str | Column) -> Column:
    """28-bit deterministic hash shared with the DuckDB oracle (see module
    docstring)."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 7), 16, 10).cast("long")


def normalized_fingerprint(col: str | Column) -> Column:
    """Exact-dup fingerprint: md5 of lowercased, whitespace-collapsed text."""
    return F.md5(F.regexp_replace(F.lower(F.trim(_c(col))), r"\s+", " "))
