"""As-of join — match each left row to the most recent right row with
right_time <= left_time per key (backward), or to the closest right
row in either direction (nearest).

Spark lacks a native as-of join. The scalable plan used here is the
union-sort trick: tag both sides, union, sort within each key by
(time, side, tiebreak), and carry the right payload forward as ONE
struct with ``last(..., ignorenulls=True)`` over an unbounded-
preceding frame (atomic: every payload column comes from the same
matched right row, even when some of its columns are NULL).
ONE shuffle on the key, no range explosion, no per-key driver loop —
at 100 TB this is a single sort-merge pass. Nearest-in-time adds a
``first(...)`` carry over the mirror unbounded-following frame on the
SAME sort — still one shuffle, two frame scans — then picks the
closer side per row.

Ties on right_time are broken by ``tiebreak`` ascending — backward
matches take the LAST row under that order (max tiebreak), matching
the deterministic SQL spec ``row_number() OVER (ORDER BY time DESC,
tiebreak DESC) = 1``; forward matches symmetrically take the min
tiebreak; equal backward/forward distance prefers backward.

``tolerance`` (pandas ``merge_asof`` semantics, the feature-store
max-staleness bound) nullifies a carried match whose time distance
exceeds the bound — a pure post-carry column test, so the plan shape
(one shuffle) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tiebreak: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """As-of join; returns all left columns + right ``payload``.

    ``left_time``/``right_time`` must be comparable numerics (use
    ``unix_micros`` for timestamps — exact integers, no float drift).
    ``direction``: "backward" (right_time <= left_time, the default)
    or "nearest" (minimum |left_time - right_time|, backward wins
    exact-distance ties). ``tolerance``: optional max |left_time -
    match_time|; a match farther away than this yields NULL payload
    (the row still returns — left-outer semantics).
    """
    if direction not in ("backward", "nearest"):
        raise ValueError(f"unknown direction: {direction!r}")
    if tolerance is not None and tolerance < 0:
        raise ValueError("tolerance must be >= 0")
    tb = tiebreak or []
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in payload],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__tb_{c}") for c in tb],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns],
        *[F.col(c) for c in payload],
        *[F.col(c).alias(f"__tb_{c}") for c in tb],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Left rows sort after right rows at equal time (right <= left is a
    # match); right rows at equal time sort by tiebreak so the max wins.
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_left", *[f"__tb_{c}" for c in tb])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct atomically, not per-column lasts: a right row
    # with NULL in some payload column must not donate its other
    # columns while an earlier row fills the NULL one — all payload
    # fields must come from the same matched right row. The struct is
    # non-null exactly on right rows, so last(ignorenulls) picks the
    # whole latest right row. ``__rt`` rides along for the nearest-
    # distance comparison.
    row_struct = F.when(
        F.col("__is_left") == 0,
        F.struct(
            F.col("__t").alias("__rt"), *[F.col(c) for c in payload]
        ),
    )
    back = F.last(row_struct, ignorenulls=True).over(w)
    if direction == "backward":
        carried = unioned.select(
            "__is_left",
            F.col("__t").alias("__lt"),
            *[F.col(c) for c in left.columns],
            back.alias("__match"),
        )
    else:
        # mirror frame over the SAME partition+sort: rights at equal
        # time sort before left rows, so they land in the backward
        # frame (dt = 0 there; backward wins ties anyway)
        w_fwd = (
            Window.partitionBy("__k")
            .orderBy("__t", "__is_left", *[f"__tb_{c}" for c in tb])
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fwd = F.first(row_struct, ignorenulls=True).over(w_fwd)
        staged = unioned.select(
            "__is_left",
            F.col("__t").alias("__lt"),
            *[F.col(c) for c in left.columns],
            back.alias("__b"),
            fwd.alias("__f"),
        )
        carried = staged.select(
            "__is_left",
            "__lt",
            *[F.col(c) for c in left.columns],
            F.when(
                F.col("__f").isNull()
                | (
                    F.col("__b").isNotNull()
                    & (
                        (F.col("__lt") - F.col("__b.__rt"))
                        <= (F.col("__f.__rt") - F.col("__lt"))
                    )
                ),
                F.col("__b"),
            )
            .otherwise(F.col("__f"))
            .alias("__match"),
        )
    match = F.col("__match")
    if tolerance is not None:
        dist = (
            (F.col("__lt") - match["__rt"])
            if direction == "backward"
            else F.abs(F.col("__lt") - match["__rt"])
        )
        match = F.when(dist <= F.lit(tolerance), match)
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[match[c].alias(c) for c in payload],
        )
    )
