"""Local pair generation over posting-list arrays.

The shared building block of every near-dup candidate stage: a
(band/bucket/shingle) groupBy collects a SORTED member array, and all
ordered pairs (i < j) are generated array-natively inside the row —
no self-join of two exploded sides, so the upstream pipeline runs
once and the only shuffles are the groupBy and the pair dedup.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def pair_structs(
    xs: Column | str, build: Callable[[Column, Column], Column]
) -> Column:
    """All ordered element pairs (i < j) of array ``xs`` as an array
    of ``build(x_i, x_j)`` structs (array-local; no join)."""
    xs = F.col(xs) if isinstance(xs, str) else xs
    n = F.size(xs)
    return F.flatten(
        F.transform(
            xs,
            lambda x, i: F.transform(
                F.slice(xs, i + 2, n - i - 1), lambda y: build(x, y)
            ),
        )
    )


def ordered_id_pairs(
    xs: Column | str, a: str = "id_a", b: str = "id_b"
) -> Column:
    """Ordered id pairs of a sorted id array as structs (a, b)."""
    return pair_structs(
        xs, lambda x, y: F.struct(x.alias(a), y.alias(b))
    )
