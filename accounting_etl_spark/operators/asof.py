"""As-of (backward) join — match each left row to the most recent
right row with right_time <= left_time per key.

Spark lacks a native as-of join. The scalable plan used here is the
union-sort trick: tag both sides, union, sort within each key by
(time, side, tiebreak), and carry the right payload forward as ONE
struct with ``last(..., ignorenulls=True)`` over an unbounded-
preceding frame (atomic: every payload column comes from the same
matched right row, even when some of its columns are NULL).
ONE shuffle on the key, no range explosion, no per-key driver loop —
at 100 TB this is a single sort-merge pass. (The applyInPandas +
``pd.merge_asof`` per-key variant is the fallback for semantics this
form can't express, e.g. nearest-in-time.)

Ties on right_time are broken by ``tiebreak`` ascending — the LAST
row under that order wins, i.e. the max tiebreak, matching the
deterministic SQL spec ``row_number() OVER (ORDER BY time DESC,
tiebreak DESC) = 1``.
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
) -> DataFrame:
    """Backward as-of join; returns all left columns + right ``payload``.

    ``left_time``/``right_time`` must be comparable numerics (use
    ``unix_micros`` for timestamps — exact integers, no float drift).
    """
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
    # whole latest right row.
    row_struct = F.when(
        F.col("__is_left") == 0, F.struct(*[F.col(c) for c in payload])
    )
    carried = unioned.select(
        "__is_left",
        *[F.col(c) for c in left.columns],
        F.last(row_struct, ignorenulls=True).over(w).alias("__match"),
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"__match.{c}").alias(c) for c in payload],
        )
    )
