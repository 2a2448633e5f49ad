"""Text column-expression helpers shared by dedup/text queries."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column) -> Column:
    """Whitespace-collapsed, lower-cased text (dedup normalization)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokens_ws(col: Column) -> Column:
    """Whitespace tokens (reference-style split)."""
    return F.split(F.trim(col), " ")


def chunk_starts(tokens: Column, *, size: int, step: int) -> Column:
    """1-based start offsets of sliding token chunks.

    Regular starts every ``step`` tokens, plus the tail-covering start
    (``n - size + 1``) so the final chunk always reaches the last
    token; deduplicated and sorted. Short docs yield one start.
    """
    n = F.size(tokens)
    last = F.greatest(n - F.lit(size), F.lit(0)) + 1
    return F.sort_array(
        F.array_distinct(
            F.concat(
                F.sequence(F.lit(1), last, F.lit(step)), F.array(last)
            )
        )
    )


def word_shingles(tokens: Column, k: int = 3) -> Column:
    """Word k-shingles as strings; empty array when the doc is short.

    The size guard matters: Spark's ``sequence(1, n)`` DESCENDS when
    n < 1, it does not return empty.
    """
    return F.when(
        F.size(tokens) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
