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


def explode_bucket_pairs(
    df,
    xs_col: str,
    build: Callable[[Column, Column], Column],
    max_bucket: int,
    out: str = "p",
):
    """All ordered pairs of each row's SORTED array ``xs_col``, with
    bounded per-row memory, as exploded ``out`` structs.

    A hot bucket (boilerplate corpora degenerate exactly here) would
    materialize O(n²) pair structs in ONE row under the naive
    ``pair_structs`` expansion — executor OOM with no skew escape
    (ADVICE r2). Instead the array is cut into ``max_bucket``-sized
    contiguous chunks and the (chunk_i <= chunk_j) index pairs explode
    into separate rows FIRST; each row then expands at most
    ``max_bucket``² pairs array-locally (within-chunk ordered pairs on
    the diagonal, full cross product off it — contiguous slices of a
    sorted array make every cross pair already ordered). Join-free:
    the pipeline keeps one scan, no extra exchange, and per-row memory
    is O(max_bucket²) regardless of bucket size.
    """
    n = F.size(F.col(xs_col))
    nc = F.ceil(n / F.lit(max_bucket)).cast("int")
    idx = F.sequence(F.lit(0), nc - F.lit(1))
    cpairs = F.flatten(
        F.transform(
            idx,
            lambda ci: F.transform(
                F.sequence(ci, nc - F.lit(1)),
                lambda cj: F.struct(ci.alias("ci"), cj.alias("cj")),
            ),
        )
    )
    step1 = df.select(
        F.col(xs_col).alias("__xs"), F.explode(cpairs).alias("__cp")
    )
    a = F.slice(
        F.col("__xs"),
        F.col("__cp.ci") * max_bucket + 1,
        F.lit(max_bucket),
    )
    b = F.slice(
        F.col("__xs"),
        F.col("__cp.cj") * max_bucket + 1,
        F.lit(max_bucket),
    )
    pairs = F.when(
        F.col("__cp.ci") == F.col("__cp.cj"), pair_structs(a, build)
    ).otherwise(
        F.flatten(
            F.transform(a, lambda x: F.transform(b, lambda y: build(x, y)))
        )
    )
    return step1.select(F.explode(pairs).alias(out))
