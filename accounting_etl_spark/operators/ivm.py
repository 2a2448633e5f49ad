"""Incremental view maintenance — bag-algebra delta propagation for
join views (the counting algorithm of Gupta/Mumick; what Materialize
/ Flink SQL / DBSP run under continuous queries).

A 100 TB join view cannot be recomputed because 0.1% of one input
changed. The counting algorithm maintains it from deltas alone:
relations are BAGS (rows carry a multiplicity), changes are SIGNED
bags (+1 insert, -1 delete, update = both), and the delta of an
inner-join view is

    ΔV  =  ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

— every term has at least one DELTA side, so maintenance cost scales
with the change volume, not the base size. Applying a delta is one
groupBy: merge multiplicities, drop rows that reach zero (a negative
residual multiplicity means the caller deleted rows that were never
in the view — out of contract, surfaced by ``strict`` checking in
tests rather than silently clamped).

Aggregates over the view re-derive from the maintained bag
(``sum(x * mult)``, ``sum(mult)``) — algebraic aggregates never need
the base tables again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MULT = "__mult"


def as_bag(df: DataFrame, mult: int = 1) -> DataFrame:
    """Collapse a relation to bag form: one row per distinct tuple
    with a ``__mult`` multiplicity column (``mult`` per input row —
    pass -1 to encode a whole relation of deletions)."""
    cols = [c for c in df.columns if c != MULT]
    return df.groupBy(*cols).agg(
        (F.count(F.lit(1)) * F.lit(int(mult))).alias(MULT)
    )


def bag_union(*bags: DataFrame) -> DataFrame:
    """Signed multiset union: merge multiplicities, drop zeros."""
    if not bags:
        raise ValueError("no bags")
    out = bags[0]
    for b in bags[1:]:
        out = out.unionByName(b)
    cols = [c for c in out.columns if c != MULT]
    return (
        out.groupBy(*cols)
        .agg(F.sum(MULT).alias(MULT))
        .where(F.col(MULT) != 0)
    )


def join_view_delta(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    on: str,
) -> DataFrame:
    """Signed delta of the inner-join view ``A ⋈ B`` given signed
    deltas of both inputs (all four in bag form; ``da``/``db`` may be
    empty). Output multiplicity of a joined row is the product of the
    input multiplicities; the three terms each carry a delta side."""
    for d in (a_old, da, b_old, db):
        if MULT not in d.columns:
            raise ValueError("inputs must be in bag form (as_bag)")

    def _join(x: DataFrame, y: DataFrame) -> DataFrame:
        xm = x.withColumnRenamed(MULT, "__ma")
        ym = y.withColumnRenamed(MULT, "__mb")
        return (
            xm.join(ym, on)
            .withColumn(MULT, F.col("__ma") * F.col("__mb"))
            .drop("__ma", "__mb")
        )

    return bag_union(
        _join(da, b_old), _join(a_old, db), _join(da, db)
    )


def apply_delta(view: DataFrame, delta: DataFrame) -> DataFrame:
    """New view bag = old view bag ⊎ delta (zero-multiplicity rows
    vanish)."""
    return bag_union(view, delta)
