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


def token_hashes(tokens: Column) -> Column:
    """Per-token xxhash64 array — the cheap first stage of the
    hashed-gram scheme (see :func:`hashed_grams`)."""
    return F.transform(tokens, lambda t: F.xxhash64(t))


def hashed_grams(th: Column, k: int) -> Column:
    """64-bit k-gram keys from a MATERIALIZED token-hash array:
    gram i = ``xxhash64(slice(th, i, k))`` — k long mixes per gram
    instead of building and md5/xxhash-ing a rebuilt k-token shingle
    string (measured 4× cheaper at sf1.0 for k=50).

    Two usage rules, both learned the hard way (operators/span_dedup):

    - ``th`` must be its own projected column (``token_hashes(...)``
      aliased in a prior ``select``), not an inline expression:
      referenced ≥3 times here, which stops ``CollapseProject`` from
      inlining the token-hash transform into every gram.
    - If the result feeds ``explode``/``posexplode``, materialize the
      gram-array row first (``stable_checkpoint`` or persist):
      Catalyst's ``InferFiltersFromGenerate`` plants a
      ``size(...) > 0`` filter under the Generate with the whole
      tokenize→hash→slice tree inlined — measured 4-10× the query.

    Use only where gram keys need EQUALITY, not display: outputs that
    surface gram values (winnowing fingerprints, top-2-gram text)
    keep the portable md5-hex scheme. Collisions (~n²/2⁶⁴) only ever
    merge two grams; count-shaped rollups are insensitive."""
    return F.when(
        F.size(th) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(th) - (k - 1)),
            lambda i: F.xxhash64(F.slice(th, i, k)),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def hex15_int(col: Column) -> Column:
    """First 15 md5 nibbles as a nonnegative int64 (< 2^60) — the
    engine-portable hash-to-integer idiom (a DuckDB oracle computes
    the identical value as ``CAST('0x' || substr(md5(x),1,15) AS
    BIGINT)``; precedent: operators/negatives.py, the synthetic
    signature twins in queries/signatures.py). Use the xxhash64-based
    helpers for hot paths — md5 is ~4x the cost — and this family
    wherever a cross-engine twin must reproduce the exact values."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


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
